package graft

import org.apache.spark.sql.SparkSession

/** Shared helpers for the harness mains (Verify / VerifySome / Bench /
  * RunOne). Both helpers here are load-bearing enough that inline
  * copies drifting apart would corrupt a round: the JSON escaping
  * protects the driver's `json.load` of oracle_sql.json (one unescaped
  * control char silently zeroes the round's correctness), and the
  * sweep is what keeps a long multi-query session's memory and shuffle
  * footprint bounded.
  */
object HarnessUtil {

  /** JSON string escape: backslash, quote, and ALL control chars
    * (<0x20) — builder-authored SQL can legally contain tabs/newlines.
    */
  def jsonQuote(s: String): String = "\"" + s.flatMap {
    case '"'          => "\\\""
    case '\\'         => "\\\\"
    case '\n'         => "\\n"
    case '\r'         => "\\r"
    case '\t'         => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c            => c.toString
  } + "\""

  /** Drop inter-query state: the SQL cache, persisted RDD blocks
    * (localCheckpoint leftovers), and — via the explicit GC — dead
    * shuffle files and broadcasts the ContextCleaner can only reclaim
    * once their driver handles are collected.
    *
    * `gc = false` skips only the explicit full GC (cache/unpersist
    * still run): the bench harness sweeps BETWEEN RUNS of the same
    * query, where a forced full collection on a ~50 GiB heap costs
    * real wall-time ~1300 times per bench for residue the per-QUERY
    * GC (and the 1-minute periodic ContextCleaner GC) already bounds.
    */
  def sweep(spark: SparkSession, gc: Boolean = true): Unit = {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    if (gc) System.gc()
  }
}
