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
  *     signal). Stale entries are garbage, collectable by dropping
  *     the cache dir.
  *
  * A miss computes the query ONCE, persists the result through a
  * staged rename (concurrent misses race benignly — both compute the
  * same deterministic result; the loser's rename fails and it serves
  * its own computed frame), then serves the parquet. A hit costs one
  * metadata probe + a result-scaled read — the table is not touched,
  * which at 100 TB is the entire point: dashboard-shaped aggregates
  * re-run per viewer collapse to O(result) reads between commits.
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

  /** The cache key for `df` against the current versions of
    * `sources`. */
  private[operators] def fingerprint(
      s: SparkSession,
      sources: Seq[String],
      df: DataFrame
  ): String = {
    val pins = sources.sorted.map(d => s"$d@${TableVersions.currentVersion(s, d)}")
    md5hex(df.queryExecution.optimizedPlan.canonicalized.toString + "\n" + pins.mkString("|"))
  }

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
    val fp = fingerprint(s, sources, df)
    val entry = new Path(s"$cacheDir/$fp/data")
    val fs = entry.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(entry)) return (s.read.parquet(entry.toString), true)
    val staged = new Path(s"$cacheDir/$fp/data_staged_${java.util.UUID.randomUUID()}")
    df.write.mode("overwrite").parquet(staged.toString)
    if (!fs.rename(staged, entry)) {
      // a concurrent miss won the rename — its entry holds the same
      // deterministic result; drop ours and serve the computed frame
      fs.delete(staged, /* recursive = */ true): Unit
    }
    (df, false)
  }
}
