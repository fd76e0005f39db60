package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, SparkSpec}

/** Pins the live exact-quantiles gate (q318): per-user partial cent
  * sums are associative and commutative, so the drained re-aggregate —
  * and with it every rank and every percentile — is micro-batch-
  * independent and equals the batch build (q316) exactly.
  */
class StreamQuantilesSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("drained quantiles equal the batch build under a forced 3-batch replay") {
    val batch = SparkEntry.queries("q316_exact_quantiles")(spark, dir).collect().toSeq
    val single = SparkEntry.queries("q318_stream_quantiles")(spark, dir).collect().toSeq
    assert(single == batch, "single-drain quantiles diverged from the batch build")
    val src = graft.queries.Similarity.freshIndexDir("quant_multi_ingest")
    graft
      .Tables(spark, dir, "events")
      .select("user_id", "event_type", "value", "event_id")
      .repartitionByRange(3, col("event_id"))
      .write
      .mode("overwrite")
      .parquet(src)
    val schema = spark.read.parquet(src).schema
    val multi = graft.queries.StreamGate
      .runQuantilesStream(
        spark,
        spark.readStream
          .schema(schema)
          .option("maxFilesPerTrigger", "1")
          .parquet(src)
          .select("user_id", "event_type", "value")
      )
      .collect()
      .toSeq
    assert(multi == single, "3-batch replay diverged from the single drain")
  }
}
