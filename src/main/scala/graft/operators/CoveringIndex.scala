package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** CDC-maintained COVERING INDEX over a [[TableVersions]] table — the
  * secondary-index shape Hyperspace (Microsoft's public Spark indexing
  * subsystem) and every lakehouse point-lookup story use: a key-sorted
  * projection of (key, included columns) that answers point lookups
  * WITHOUT touching the table, kept current by consuming the table's
  * change feed instead of rebuilding.
  *
  * Layout is a parquet LSM: each [[sync]] folds its CDC window
  * (everything committed since the cursor) into ONE new segment of
  * per-key FINAL states — a live row carrying the included columns, or
  * a tombstone (`_deleted`) for keys whose last action in the window
  * was a delete. Reads resolve latest-wins per key with a single
  * `max(struct(seg, …))` aggregate (segments are per-key unique by
  * construction, so no window sort), and point lookups push the probed
  * keys into every segment scan — key-sorted row groups make that a
  * min/max-skipping read, O(probed keys × segments), never O(table).
  *
  * The contract mirrors the other persisted indexes:
  *   - sync cost is O(window changes) — the table is never re-read;
  *   - a segment carries its own cursor marker (`_v<version>`, stamped
  *     while staged), so the staged rename publishes data + cursor in
  *     ONE atomic operation — a crashed sync leaves only unreadable
  *     staging trash, never a segment without a cursor or a cursor
  *     without its segment, and re-running sync resumes exactly where
  *     the last published segment left off;
  *   - [[compact]] folds all segments into one live base by checked
  *     staged swap (tombstones physically dropped);
  *   - keys must be UNIQUE in the source table (the [[TableVersions
  *     .commitMerge]] contract) — latest-wins is meaningless otherwise.
  *
  * At 100 TB: the index is (key + included cols)-scaled, syncs are
  * change-scaled, and the lookup path reads a few row groups per
  * segment — the difference between a dashboard point-read costing
  * milliseconds and a table scan.
  */
object CoveringIndex {

  /** Sync's unique-key guard probes the index with pushed point
    * lookups when the window touches at most this many keys; above it,
    * one key-column segment scan (still a single narrow columnar read)
    * seeds the liveness balance instead — a 10⁵-literal isin would
    * cost more in analysis than the scan it avoids. */
  private val UniqueGuardProbeLimit = 1000L

  private def fsOf(s: SparkSession, dir: String) =
    new Path(dir).getFileSystem(s.sparkContext.hadoopConfiguration)

  private def segments(s: SparkSession, idxDir: String): Seq[Int] = {
    val p = new Path(s"$idxDir/data")
    val fs = fsOf(s, idxDir)
    if (!fs.exists(p)) Seq.empty
    else
      fs.listStatus(p)
        .toSeq
        .map(_.getPath.getName)
        .collect { case n if n.startsWith("seg=") => n.stripPrefix("seg=").toInt }
        .sorted
  }

  /** The highest source version folded into the index — the max over
    * the per-segment `_v<version>` markers. The marker is written into
    * the segment WHILE STAGED, so segment and cursor entry land in the
    * same atomic rename: there is no crash window in which a segment
    * exists without its version (or the reverse), and [[read]] is
    * always exactly the state at [[cursor]]. (Files starting with `_`
    * are parquet metadata by convention — scans ignore them.) */
  def cursor(s: SparkSession, idxDir: String): Long = {
    val fs = fsOf(s, idxDir)
    require(
      fs.exists(new Path(s"$idxDir/data")),
      s"$idxDir is not an initialized covering index"
    )
    val marks = fs.globStatus(new Path(s"$idxDir/data/seg=*/_v*"))
    require(marks.nonEmpty, s"$idxDir has no published segments")
    marks.map(_.getPath.getName.stripPrefix("_v").toLong).max
  }

  /** Stage a segment's rows OUTSIDE data/ (a partial write must never
    * be readable), stamp the staged dir with its `_v<upTo>` cursor
    * marker, then rename into place — one atomic publish. */
  private def publishSegment(s: SparkSession, idxDir: String, rows: DataFrame, upTo: Long): Unit = {
    val fs = fsOf(s, idxDir)
    val staged = new Path(s"$idxDir/_staging/${java.util.UUID.randomUUID()}")
    rows.write.mode("errorifexists").parquet(staged.toString)
    fs.create(new Path(staged, s"_v$upTo"), false).close()
    val next = (segments(s, idxDir) :+ -1).max + 1
    val dest = new Path(s"$idxDir/data/seg=$next")
    fs.mkdirs(dest.getParent)
    if (!fs.rename(staged, dest))
      throw new java.io.IOException(s"covering index: failed to publish segment $staged")
  }

  private def sorted(df: DataFrame, key: String): DataFrame =
    df.repartitionByRange(col(key)).sortWithinPartitions(key)

  /** Build the index at the source head: one projection pass. Refuses
    * a table with duplicate keys LOUDLY — latest-wins over a
    * non-unique key would silently drop rows on every read, the exact
    * wrong-not-loud failure this layer must never have. The check
    * rides the same pass (one extra aggregate over the projection). */
  def init(s: SparkSession, srcDir: String, idxDir: String, key: String, cols: Seq[String]): Long = {
    val v = TableVersions.currentVersion(s, srcDir)
    require(v >= 0, s"$srcDir not initialized")
    val head = TableVersions
      .readVersion(s, srcDir, v)
      .select((key +: cols).map(col) :+ lit(false).as("_deleted"): _*)
    val dup = head.groupBy(col(key)).count().filter(col("count") > 1).limit(1).collect()
    require(
      dup.isEmpty,
      s"covering index requires unique keys; '$key' = ${dup.head.get(0)} appears ${dup.head.getLong(1)} times"
    )
    publishSegment(s, idxDir, sorted(head, key), v)
    v
  }

  /** Fold every commit since the cursor into one segment of per-key
    * final states. Cost: O(window changes). Returns the new cursor. */
  def sync(s: SparkSession, srcDir: String, idxDir: String, key: String, cols: Seq[String]): Long = {
    val from = cursor(s, idxDir)
    val head = TableVersions.currentVersion(s, srcDir)
    if (head == from) return from
    val changes = TableVersions.changesFeed(s, srcDir, from, head)
    // per-key LAST action across the window: later commits win; within
    // one commit a post-image/insert (live=1) outranks the pre-image/
    // delete marker of the same update
    val live = when(col("_change_type").isin("insert", "update_postimage"), 1).otherwise(0)
    val packed = struct(
      (col("_commit_version") +: live.as("_live") +: cols.map(col)): _*
    )
    // unique-key guard: at NO point across the window may a key have
    // two live rows — not within one commit (two inserts of one key in
    // one version) and not ACROSS commits (an append of a key that was
    // already live before the window: the table then carries two rows
    // while latest-wins serves one — silent row loss, the exact
    // wrong-not-loud failure this layer must never have). The check is
    // a per-key running balance over the window's inserts (+1) and
    // deletes (−1), seeded with whether the key was live in the index
    // before the window; a prefix ever reaching 2 refuses the sync.
    // Updates net to zero and are excluded; a same-version
    // delete+insert (MERGE's rewrite) orders the delete first. Cost:
    // the balance itself is window-scaled (one key-partitioned window
    // over the delta rows); the liveness seed probes the index —
    // pushed point lookups when the window touches few keys, one
    // key-column segment scan otherwise (the JoinView regime
    // discipline: pick by exact count).
    val deltas = changes
      .filter(col("_change_type").isin("insert", "delete"))
      .select(
        col(key),
        col("_commit_version"),
        when(col("_change_type") === "insert", 1).otherwise(-1).as("_d")
      )
    val deltaKeys = deltas.select(col(key)).distinct()
    val nDeltaKeys = deltaKeys.count()
    if (nDeltaKeys > 0) {
      // Row.get keeps the probe generic — the fast path works for any
      // key type (string business keys included), not just BIGINT
      val live0 =
        (if (nDeltaKeys <= UniqueGuardProbeLimit)
           lookup(s, idxDir, key, Seq.empty, deltaKeys.collect().map(_.get(0)).toSeq)
         else read(s, idxDir, key, Seq.empty))
          .select(col(key), lit(1).as("_l0"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col(key))
        .orderBy(col("_commit_version"), col("_d")) // delete before insert within a version
      val breach = deltas
        .join(live0, Seq(key), "left")
        .withColumn("_bal", coalesce(col("_l0"), lit(0)) + sum(col("_d")).over(w))
        .filter(col("_bal") > 1)
        .limit(1)
        .collect()
      require(
        breach.isEmpty,
        s"covering index sync: key '${if (breach.isEmpty) "" else breach.head.get(0)}' would have " +
          "two live rows — the source table's keys are not unique (an insert landed on a live key)"
      )
    }
    val folded = changes
      .groupBy(col(key))
      .agg(max(packed).as("top"))
      .select(
        col(key) +:
          cols.map(c => col(s"top.$c").as(c)) :+
          (col("top._live") === 0).as("_deleted"): _*
      )
    publishSegment(s, idxDir, sorted(folded, key), head)
    head
  }

  private def latestWins(segs: DataFrame, key: String, cols: Seq[String]): DataFrame =
    segs
      .groupBy(col(key))
      .agg(max(struct(col("seg") +: col("_deleted") +: cols.map(col): _*)).as("top"))
      .filter(!col("top._deleted"))
      .select(col(key) +: cols.map(c => col(s"top.$c").as(c)): _*)

  /** The full live view — latest-wins across segments. */
  def read(s: SparkSession, idxDir: String, key: String, cols: Seq[String]): DataFrame =
    latestWins(s.read.parquet(s"$idxDir/data"), key, cols)

  /** Point lookups served from the index alone: the probed keys push
    * into every segment scan (key-sorted row groups min/max-skip), the
    * latest-wins fold runs over O(keys × segments) rows. Keys are any
    * orderable type the index was built on — BIGINT surrogates and
    * string business keys alike (`isin` analysis coerces the literals
    * against the scanned column type, so a mistyped probe fails loudly
    * at analysis, never as a silent empty result). */
  def lookup(
      s: SparkSession,
      idxDir: String,
      key: String,
      cols: Seq[String],
      keys: Seq[Any]
  ): DataFrame = {
    require(keys.nonEmpty, "empty probe set")
    latestWins(
      s.read.parquet(s"$idxDir/data").filter(col(key).isin(keys: _*)),
      key,
      cols
    )
  }

  /** Sweep orphaned `_staging/` trash left by crashed syncs — the
    * janitor every other staged-publish operator's maintain() already
    * runs for its own debt. A crashed [[sync]] strands one UUID dir
    * (data files + `_v` marker) that no read path ever touches;
    * correctness never needed this sweep, but the garbage is otherwise
    * unbounded. A LIVE in-flight sync's staged dir is
    * indistinguishable from a crashed one's by name, so — like
    * [[TableVersions.sweepStagedOrphans]] — only dirs older than
    * `olderThanMs` are removed (no healthy sync holds staging for an
    * hour); pass 0 only when no sync can be running (tests,
    * single-maintainer windows). Returns the number removed. */
  def maintain(s: SparkSession, idxDir: String, olderThanMs: Long = 3600000L): Int = {
    val fs = fsOf(s, idxDir)
    val staging = new Path(s"$idxDir/_staging")
    if (!fs.exists(staging)) return 0
    val cutoff = System.currentTimeMillis() - olderThanMs
    val orphans = fs.listStatus(staging).toSeq.filter(_.getModificationTime <= cutoff)
    orphans.foreach { st =>
      if (!fs.delete(st.getPath, /* recursive = */ true))
        throw new java.io.IOException(s"covering index maintain: failed to remove ${st.getPath}")
    }
    orphans.size
  }

  /** Fold all segments into one live base (tombstones physically
    * dropped) by checked staged swap; the cursor is untouched. */
  def compact(s: SparkSession, idxDir: String, key: String, cols: Seq[String]): Unit = {
    val fs = fsOf(s, idxDir)
    val live = new Path(s"$idxDir/data")
    val staged = new Path(s"$idxDir/data_compacted")
    // resume an interrupted swap (live gone, staged complete)
    if (!fs.exists(live) && fs.exists(staged)) {
      if (!fs.rename(staged, live))
        throw new java.io.IOException(s"covering index compact: failed to resume $staged")
      return
    }
    if (fs.exists(staged) && !fs.delete(staged, true))
      throw new java.io.IOException(s"covering index compact: failed to clear stale $staged")
    val at = cursor(s, idxDir) // resolve BEFORE the live layout goes away
    val base = sorted(
      read(s, idxDir, key, cols).withColumn("_deleted", lit(false)),
      key
    )
    base.write.mode("overwrite").parquet(s"$staged/seg=0")
    // the folded base carries the cursor forward — stamped while staged,
    // so the swap publishes data + cursor atomically (same as sync)
    fs.create(new Path(s"$staged/seg=0/_v$at"), false).close()
    if (!fs.delete(live, true))
      throw new java.io.IOException(s"covering index compact: failed to remove $live")
    if (!fs.rename(staged, live))
      throw new java.io.IOException(s"covering index compact: failed to swap $staged")
  }
}
