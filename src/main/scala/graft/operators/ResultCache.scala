package graft.operators

import java.security.MessageDigest

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Version-pinned query RESULT cache over [[TableVersions]] sources —
  * the lakehouse result-cache contract (Databricks/BigQuery serve it
  * transparently): a deterministic query over versioned tables is
  * fully determined by (its plan, the versions it read), so its result
  * can be served from storage until any source table commits.
  *
  * The cache key is `md5(canonicalized optimized plan ‖ source
  * versions)`:
  *   - the CANONICALIZED plan (Catalyst's own normalization — stable
  *     expression ids, literal forms) makes structurally-identical
  *     queries share an entry regardless of how they were built;
  *   - the version pins make invalidation FREE: a commit to any
  *     source changes its `currentVersion`, the key changes, and the
  *     stale entry is simply never addressed again (no invalidation
  *     protocol, no TTL guessing — the log IS the invalidation
  *     signal). Stale entries are garbage, collected by [[evict]]
  *     (each entry stores its pins in a `pins` sidecar so the sweep
  *     is a metadata read per entry, never a recompute).
  *
  * A miss computes the query ONCE, persists the result through a
  * staged rename (concurrent misses race benignly — both compute the
  * same deterministic result; the loser's rename fails and it serves
  * its own computed frame), then serves the parquet. Before
  * PUBLISHING, the pins are re-read: a query that follows the head
  * (rather than reading via version-pinned `readVersion`) may have
  * scanned data from a commit that landed mid-compute, and storing
  * that result under the pre-commit key would serve post-commit data
  * as a "hit" for the old versions. Versions only grow, so pins equal
  * before AND after the compute proves the head never moved during
  * it — the entry is published; otherwise the result is still
  * returned but never cached. A hit costs one metadata probe + a
  * result-scaled read — the table is not touched, which at 100 TB is
  * the entire point: dashboard-shaped aggregates re-run per viewer
  * collapse to O(result) reads between commits.
  *
  * HONEST LIMITS: only sound for DETERMINISTIC plans over the named
  * sources (a query reading tables outside `sources` will serve stale
  * answers — the caller names what it reads, same contract as
  * ViewRewrite.register); canonicalization is conservative (two
  * semantically-equal but structurally-different plans may cache
  * separately — correct, just less shared).
  */
object ResultCache {

  private def md5hex(s: String): String =
    MessageDigest
      .getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .map("%02x".format(_))
      .mkString

  private def pinsOf(s: SparkSession, sources: Seq[String]): Seq[(String, Long)] =
    sources.sorted.map(d => d -> TableVersions.currentVersion(s, d))

  /** The cache key for `df` against the given source pins. */
  private[operators] def fingerprint(df: DataFrame, pins: Seq[(String, Long)]): String =
    md5hex(
      df.queryExecution.optimizedPlan.canonicalized.toString + "\n" +
        pins.map { case (d, v) => s"$d@$v" }.mkString("|")
    )

  /** Serve `df` from the cache when (plan, source versions) match a
    * stored entry; compute-and-store otherwise. Returns (result,
    * wasHit). */
  def run(
      s: SparkSession,
      cacheDir: String,
      sources: Seq[String],
      df: DataFrame
  ): (DataFrame, Boolean) = {
    require(sources.nonEmpty, "name the versioned sources the query reads")
    val pins = pinsOf(s, sources)
    val fp = fingerprint(df, pins)
    val entry = new Path(s"$cacheDir/$fp/data")
    val fs = entry.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(entry)) return (s.read.parquet(entry.toString), true)
    val staged = new Path(s"$cacheDir/$fp/data_staged_${java.util.UUID.randomUUID()}")
    df.write.mode("overwrite").parquet(staged.toString)
    // publish only when the pins still hold — a commit landing during
    // the compute means the plan may have read NEWER data than the key
    // claims (versions are monotone, so equal-before-and-after proves
    // no movement). The computed frame is still returned either way.
    if (pinsOf(s, sources) != pins) {
      fs.delete(staged, /* recursive = */ true): Unit
      return (df, false)
    }
    // the pins sidecar feeds [[evict]]; its content is determined by
    // the key, so concurrent writers overwrite it with identical rows
    import s.implicits._
    pins
      .toDF("source_dir", "version")
      .coalesce(1)
      .write
      .mode("overwrite")
      .parquet(s"$cacheDir/$fp/pins")
    if (!fs.rename(staged, entry)) {
      // a concurrent miss won the rename — its entry holds the same
      // deterministic result; drop ours and serve the computed frame
      fs.delete(staged, /* recursive = */ true): Unit
    }
    (df, false)
  }

  /** Drop every entry whose pinned source versions are behind their
    * table's CURRENT head — such an entry can never be addressed
    * again (the key embeds the current versions), it is pure garbage.
    * Returns the number of entries removed. Folded into
    * [[TableVersions.maintain]] via its `resultCacheDir` hook.
    *
    * A pins-less entry is NOT automatically garbage: a concurrent
    * miss in another session writes its `data_staged_*` parquet
    * BEFORE the pins sidecar, so a sweep racing that window would
    * recursively delete files under an in-flight write and fail the
    * writer's own read of its computed frame — worse than a stale
    * entry. The sweep therefore skips any entry whose children are
    * all in-flight artifacts (`data_staged_*`, or a pins dir still
    * mid-write/unreadable); if the publish really crashed, the entry
    * is unreachable garbage whose only cost is bytes, and the next
    * sweep after a source commit reclaims it once a reader of the
    * same key republishes — never worth yanking a live write for.
    */
  def evict(s: SparkSession, cacheDir: String): Long = {
    val root = new Path(cacheDir)
    val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return 0L
    // one listing; per-entry cost is a single tiny parquet read plus a
    // currentVersion directory listing per distinct source (memoized)
    val heads = scala.collection.mutable.Map[String, Long]()
    def headOf(d: String): Long =
      heads.getOrElseUpdate(d, TableVersions.currentVersion(s, d))
    var dropped = 0L
    fs.listStatus(root).filter(_.isDirectory).foreach { st =>
      val pinsPath = new Path(st.getPath, "pins")
      val dead =
        if (!fs.exists(pinsPath)) {
          // no pins yet: either an in-flight publish (skip — deleting
          // under it would fail the writer) or an empty husk (safe)
          fs.listStatus(st.getPath).isEmpty
        } else
          scala.util
            .Try(
              s.read
                .parquet(pinsPath.toString)
                .collect()
                .exists(r => headOf(r.getString(0)) != r.getLong(1))
            )
            // unreadable pins = a sidecar still being written — skip
            .getOrElse(false)
      if (dead) {
        fs.delete(st.getPath, /* recursive = */ true): Unit
        dropped += 1
      }
    }
    dropped
  }
}
