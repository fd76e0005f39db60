package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.broadcast

/** CBO-lite: turn [[TableVersions.analyzeTable]]'s persisted column
  * statistics into the one join decision Spark cannot make from file
  * sizes alone — whether a VERSIONED dimension is broadcastable.
  *
  * Spark's own `autoBroadcastJoinThreshold` keys off scan-size
  * estimates, which for a version store overcount (dead files in
  * pre-vacuum logs, compression skew) or are simply unavailable
  * before AQE's first shuffle materializes. The ANALYZE snapshot
  * already holds the truth: exact row count and exact string masses.
  * `estimatedBytes` prices a row as 8 bytes per fixed-width column
  * and (total_len / n_rows + 4) per string column (Spark's own
  * `ColumnStat` sizing convention), and [[adviseDim]] attaches a
  * broadcast HINT when the table prices under the threshold — a hint,
  * not a bypass: Catalyst still plans it, AQE can still re-plan
  * everything else. Decisions are metadata-scale (one `_colstats`
  * read) and deterministic, so the advised plan shape is testable.
  */
object StatsAdvisor {

  /** Estimated in-memory size of the analyzed table's head, from its
    * most recent ANALYZE snapshot. */
  def estimatedBytes(s: SparkSession, dir: String): Long = {
    val st = TableVersions.columnStats(s, dir).collect()
    require(st.nonEmpty, s"$dir has no ANALYZE snapshot")
    val nRows = st.head.getLong(st.head.fieldIndex("n_rows"))
    val perRow = st.map { r =>
      val tl = r.fieldIndex("total_len")
      if (r.isNullAt(tl)) 8L // fixed-width column
      else if (nRows == 0) 4L
      else r.getLong(tl) / math.max(nRows, 1L) + 4L
    }.sum
    nRows * perRow
  }

  /** The dimension's head, broadcast-hinted iff its ANALYZE-estimated
    * size is under `maxBytes`. */
  def adviseDim(s: SparkSession, dir: String, maxBytes: Long = 10L * 1024 * 1024): DataFrame = {
    val head = TableVersions.readVersion(s, dir, TableVersions.currentVersion(s, dir))
    if (estimatedBytes(s, dir) <= maxBytes) broadcast(head) else head
  }
}
