package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** DEEP CLONE + CROSS-STORE REPLICATION — the DR/promotion primitive a
  * production lakehouse needs beside the zero-copy shallow clone
  * (Delta's deep clone + incremental replicate is the public model).
  *
  * [[cloneDeep]] MATERIALIZES a pinned source version under a new
  * storage root: the replica owns its files outright, so — unlike a
  * shallow clone, whose reads dangle once the source vacuums below the
  * fork — the source can vacuum, restore, or disappear entirely and
  * the replica stays whole (the vacuum-independence property
  * ReplicaSpec pins). Cost is one distributed read+write of the
  * version's live rows; at 100 TB that is the price of a second copy
  * by definition, paid once — catch-up afterwards is feed-scaled.
  *
  * [[sync]] folds the source's change feed window `(cursor, safeHead]`
  * onto the replica as one key-set delete + one merge commit — the
  * same latest-wins-per-key net-change fold every feed consumer here
  * uses, O(window changes), never a source re-read. The cursor lives
  * in `_replica/cursor` under the replica root, advanced only AFTER
  * the window lands; a crash between the commits and the cursor write
  * re-applies the same window on restart, which CONVERGES (deleting
  * absent keys is a no-op commit; re-merging the same post-images
  * rewrites the same values) — idempotent catch-up without a
  * two-phase protocol. Windows stop at [[TableVersions.safeHead]], so
  * an in-flight source commit can never be skipped.
  *
  * [[fingerprint]] is the checksummed parity gate: an order- and
  * layout-independent digest (count + sum + xor of per-row xxhash64
  * over the name-sorted JSON row image) equal iff the row multisets
  * are equal — cheap enough to REQUIRE after every promotion.
  */
object Replica {

  private def fs(s: SparkSession, dir: String) =
    new Path(dir).getFileSystem(s.sparkContext.hadoopConfiguration)

  private def cursorPath(dstDir: String) = new Path(s"$dstDir/_replica/cursor")

  private def writeCursor(s: SparkSession, dstDir: String, v: Long): Unit = {
    val f = fs(s, dstDir)
    val tmp = new Path(s"$dstDir/_replica/_cursor_tmp_${java.util.UUID.randomUUID}")
    val out = f.create(tmp, /* overwrite = */ true)
    try out.write(v.toString.getBytes("UTF-8"))
    finally out.close()
    val dst = cursorPath(dstDir)
    f.delete(dst, false): Unit
    if (!f.rename(tmp, dst))
      throw new java.io.IOException(s"replica cursor write lost a race at $dst")
  }

  /** The last source version folded into the replica. */
  def cursor(s: SparkSession, dstDir: String): Long = {
    val f = fs(s, dstDir)
    val p = cursorPath(dstDir)
    require(f.exists(p), s"$dstDir is not a replica (no _replica/cursor) — cloneDeep first")
    val in = f.open(p)
    try new String(in.readAllBytes(), "UTF-8").trim.toLong
    finally in.close()
  }

  /** Materialize `srcDir`@`v` under the fresh root `dstDir` (one
    * distributed copy — the replica owns every file) and set the
    * replication cursor to `v`. Returns the replica's head version
    * (0). */
  def cloneDeep(s: SparkSession, srcDir: String, dstDir: String, v: Long): Long = {
    require(
      TableVersions.currentVersion(s, dstDir) == -1,
      s"$dstDir already initialized — deep clone only creates new tables"
    )
    val head = TableVersions.commitAppend(TableVersions.readVersion(s, srcDir, v), dstDir)
    writeCursor(s, dstDir, v)
    head
  }

  /** Catch the replica up to the source's safe head: fold the feed
    * window `(cursor, safeHead]` as one key-set delete + one merge
    * (latest-wins per key), then advance the cursor. No-op when the
    * source hasn't moved. Returns the new cursor. */
  def sync(s: SparkSession, srcDir: String, dstDir: String, key: String): Long = {
    val cur = cursor(s, dstDir)
    val head = TableVersions.safeHead(s, srcDir)
    if (head <= cur) return cur
    val feed = TableVersions.changesFeed(s, srcDir, cur, head).localCheckpoint()
    val dataCols = feed.columns.toSeq
      .filterNot(c => c == "_change_type" || c == "_commit_version" || c == key)
    // a key's LAST event decides: across versions the later commit
    // wins; within one, a post-image/insert outranks the pre-image/
    // delete marker of the same update
    val eventRank = col("_commit_version") * 10 +
      when(col("_change_type").isin("insert", "update_postimage"), 5).otherwise(1)
    val packed = struct(col("_change_type").as("__ct") +: dataCols.map(col): _*)
    val net = feed
      .withColumn("__ok", eventRank)
      .groupBy(col(key))
      .agg(max_by(packed, col("__ok")).as("r"))
      .localCheckpoint()
    val gone = net
      .filter(!col("r.__ct").isin("insert", "update_postimage"))
      .select(col(key))
    if (!gone.isEmpty) TableVersions.commitDeleteKeys(gone, dstDir, key): Unit
    val upserts = net
      .filter(col("r.__ct").isin("insert", "update_postimage"))
      .select(col(key) +: dataCols.map(c => col(s"r.$c").as(c)): _*)
    if (!upserts.isEmpty) TableVersions.commitMerge(upserts, dstDir, key): Unit
    writeCursor(s, dstDir, head)
    head
  }

  /** Order/layout-independent table digest: (row count, sum, xor) of
    * per-row xxhash64 over the name-sorted JSON row image — equal iff
    * the row multisets are equal (up to 64-bit hashing). The sum runs
    * in DECIMAL(38,0): ANSI mode makes a BIGINT sum of 2⁶³-scaled
    * hashes throw on overflow, and silent wraparound (ANSI off) would
    * hide nothing but still be a different number per overflow path.
    * One aggregation, no shuffle beyond the final reduce. */
  def fingerprint(s: SparkSession, dir: String, v: Long): (Long, String, Long) = {
    val df = TableVersions.readVersion(s, dir, v)
    val cols = df.columns.sorted.toSeq
    val h = xxhash64(to_json(struct(cols.map(col): _*)))
    val r = df
      .select(h.as("h"))
      .agg(
        count(lit(1)).as("n"),
        coalesce(sum(col("h").cast("decimal(38,0)")), lit(0).cast("decimal(38,0)")).as("s"),
        coalesce(expr("bit_xor(h)"), lit(0L)).as("x") // empty table: (0, "0", 0)
      )
      .head()
    (r.getLong(0), r.getDecimal(1).stripTrailingZeros.toPlainString, r.getLong(2))
  }
}
