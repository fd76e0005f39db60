package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, SparkSpec}

/** Pins the live funnel (q179): drained result == batch q177, also
  * under a forced multi-batch split where a user's first view and the
  * click it qualifies land in DIFFERENT micro-batches — the case the
  * stage-and-recompute contract exists for.
  */
class StreamFunnelSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.01"
  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("q179 drained streaming funnel equals batch q177") {
    val streamed = run("q179_stream_funnel").collect().toSeq
    val batch = run("q177_funnel").collect().toSeq
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("a forced 3-batch split (events sharded by time) equals batch q177") {
    val src = graft.queries.Similarity.freshIndexDir("funnel_multi_src")
    graft.Tables(spark, dir, "events")
      .select("user_id", "event_type", "ts")
      .repartitionByRange(3, col("ts")) // step boundaries straddle batches
      .write
      .mode("overwrite")
      .parquet(src)
    val schema = spark.read.parquet(src).schema
    val stream = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(src)
    val streamed =
      graft.queries.StreamGate.runFunnelStream(spark, stream).collect().toSeq
    val batch = run("q177_funnel").collect().toSeq
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("q179 is rerunnable in one session") {
    assert(run("q179_stream_funnel").collect().toSeq == run("q179_stream_funnel").collect().toSeq)
  }
}
