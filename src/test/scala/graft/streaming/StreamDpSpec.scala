package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, SparkSpec}

/** Pins the live DP-release gate (q309): contribution bounding is
  * whole-history, so under any micro-batching the staged recompute
  * produces exactly the batch release (q300) — same clamped counts,
  * same seed-deterministic noise.
  */
class StreamDpSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("drained release equals the batch release under a forced 3-batch replay") {
    val batch = SparkEntry.queries("q300_dp_release")(spark, dir).collect().toSeq
    val single = SparkEntry.queries("q309_stream_dp")(spark, dir).collect().toSeq
    assert(single == batch, "single-drain release diverged from the batch release")
    val src = graft.queries.Similarity.freshIndexDir("dp_multi_ingest")
    graft
      .Tables(spark, dir, "events")
      .select("user_id", "event_type", "event_id")
      .repartitionByRange(3, col("event_id"))
      .write
      .mode("overwrite")
      .parquet(src)
    val schema = spark.read.parquet(src).schema
    val multi = graft.queries.StreamGate
      .runDpStream(
        spark,
        spark.readStream
          .schema(schema)
          .option("maxFilesPerTrigger", "1")
          .parquet(src)
          .select("user_id", "event_type")
      )
      .collect()
      .toSeq
    assert(multi == single, "3-batch replay diverged from the single drain")
  }
}
