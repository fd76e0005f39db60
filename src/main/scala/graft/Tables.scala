package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * All reads are plain parquet scans so Catalyst pushes filters and
  * prunes columns into the scan (verify with `.explain`: `PushedFilters`
  * / `ReadSchema`). At cluster scale these would be partitioned
  * directories; the API is identical.
  */
object Tables {

  /** `events.ts` has shipped in two physical encodings across testdata
    * generations, so the loader adapts to whatever the scan reports:
    *
    *  - INT64 TIMESTAMP(NANOS): the session surfaces it as a long
    *    (`spark.sql.legacy.parquet.nanosAsLong`, set in GraftSession) and
    *    we truncate to microseconds with integer division — the same
    *    truncation DuckDB applies when it coerces nanos to its
    *    microsecond TIMESTAMP, so oracle comparisons line up exactly.
    *    Plain `/ 1000` would go through DOUBLE and lose precision above
    *    2^53; `DIV` stays integral.
    *  - TIMESTAMP(MICROS) without UTC adjustment: Spark reads it as
    *    TIMESTAMP_NTZ; the session time zone is pinned to UTC so casting
    *    to the session-TZ TimestampType is value-identical and matches
    *    DuckDB's naive microsecond TIMESTAMP bit-for-bit.
    *
    * Branching on the scanned schema (driver-side metadata only — no
    * data read) means a testdata regeneration in either direction can
    * never again break every events-touching plan at analysis time.
    */
  def events(spark: SparkSession, dir: String): DataFrame =
    normalizeEventsTs(spark.read.parquet(s"$dir/events.parquet"))

  /** Normalize whatever physical `ts` the scan produced to the session-TZ
    * microsecond TimestampType. Shared by the batch loader, the streaming
    * events source (StreamGate) and dev harnesses so every path applies
    * the identical coercion. Schema inspection only — works on streaming
    * DataFrames too.
    */
  def normalizeEventsTs(raw: DataFrame): DataFrame =
    raw.schema("ts").dataType match {
      case LongType      => raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case TimestampType => raw // already session-TZ micros
      case _             => raw.withColumn("ts", col("ts").cast(TimestampType))
    }

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    name match {
      case "events" => events(spark, dir)
      case other    => spark.read.parquet(s"$dir/$other.parquet")
    }
}
