package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * All reads are plain parquet scans so Catalyst pushes filters and
  * prunes columns into the scan (verify with `.explain`: `PushedFilters`
  * / `ReadSchema`). At cluster scale these would be partitioned
  * directories; the API is identical.
  */
object Tables {

  /** `events.ts` is physically INT64 TIMESTAMP(NANOS). The session reads
    * it as a long (`spark.sql.legacy.parquet.nanosAsLong`, set in
    * GraftSession) and we truncate to microseconds with integer
    * division — the same truncation DuckDB applies when it coerces nanos
    * to its microsecond TIMESTAMP, so oracle comparisons line up
    * exactly. Plain `/ 1000` would go through DOUBLE and lose precision
    * above 2^53; `DIV` stays integral.
    */
  def events(spark: SparkSession, dir: String): DataFrame =
    spark.read
      .parquet(s"$dir/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    name match {
      case "events" => events(spark, dir)
      case other    => spark.read.parquet(s"$dir/$other.parquet")
    }
}
