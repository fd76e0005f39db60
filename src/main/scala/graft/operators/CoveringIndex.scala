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
  *   - a sync segment lands by staged rename BEFORE the cursor marker
  *     moves, so a crash between them replays the window into a
  *     content-identical segment (latest-wins absorbs the duplicate);
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

  /** The highest source version folded into the index. */
  def cursor(s: SparkSession, idxDir: String): Long = {
    val p = new Path(s"$idxDir/_cursor")
    val fs = fsOf(s, idxDir)
    require(fs.exists(p), s"$idxDir is not an initialized covering index")
    fs.listStatus(p).map(_.getPath.getName.stripPrefix("v").toLong).max
  }

  /** Stage a segment's rows OUTSIDE data/ (a partial write must never
    * be readable), rename into place, THEN advance the cursor. */
  private def publishSegment(s: SparkSession, idxDir: String, rows: DataFrame, upTo: Long): Unit = {
    val fs = fsOf(s, idxDir)
    val staged = new Path(s"$idxDir/_staging/${java.util.UUID.randomUUID()}")
    rows.write.mode("errorifexists").parquet(staged.toString)
    val next = (segments(s, idxDir) :+ -1).max + 1
    val dest = new Path(s"$idxDir/data/seg=$next")
    fs.mkdirs(dest.getParent)
    if (!fs.rename(staged, dest))
      throw new java.io.IOException(s"covering index: failed to publish segment $staged")
    fs.mkdirs(new Path(s"$idxDir/_cursor/v$upTo")): Unit
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
    // unique-key guard, window-scaled: two OPEN rows for one key at one
    // version means the source violated the merge-key contract — the
    // latest-wins fold would then pick a payload arbitrarily (wrong,
    // not loud). Deletes + the matching post-image share a version
    // legitimately; two inserts of one key in one commit do not.
    val dup = changes
      .filter(live === 1)
      .groupBy(col(key), col("_commit_version"))
      .count()
      .filter(col("count") > 1)
      .limit(1)
      .collect()
    require(
      dup.isEmpty,
      s"covering index sync: key '${if (dup.isEmpty) "" else dup.head.get(0)}' has multiple " +
        "live rows in one commit — the source table's keys are not unique"
    )
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
    * latest-wins fold runs over O(keys × segments) rows. */
  def lookup(
      s: SparkSession,
      idxDir: String,
      key: String,
      cols: Seq[String],
      keys: Seq[Long]
  ): DataFrame = {
    require(keys.nonEmpty, "empty probe set")
    latestWins(
      s.read.parquet(s"$idxDir/data").filter(col(key).isin(keys: _*)),
      key,
      cols
    )
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
    val base = sorted(
      read(s, idxDir, key, cols).withColumn("_deleted", lit(false)),
      key
    )
    base.write.mode("overwrite").parquet(s"$staged/seg=0")
    if (!fs.delete(live, true))
      throw new java.io.IOException(s"covering index compact: failed to remove $live")
    if (!fs.rename(staged, live))
      throw new java.io.IOException(s"covering index compact: failed to swap $staged")
  }
}
