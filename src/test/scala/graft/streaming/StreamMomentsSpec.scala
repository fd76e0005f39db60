package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, SparkSpec}

/** Pins the live moments-sketch gate (q302): the drained merged sketch
  * is micro-batch-independent (integer power sums are associative and
  * commutative) and equals the batch two-level merge (q301) exactly.
  */
class StreamMomentsSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("drained merged sketch equals the batch build under a forced 3-batch replay") {
    val batch = SparkEntry.queries("q301_moments_sketch")(spark, dir).collect().toSeq
    val single = SparkEntry.queries("q302_stream_moments")(spark, dir).collect().toSeq
    assert(single == batch, "single-drain sketch diverged from the batch build")
    val src = graft.queries.Similarity.freshIndexDir("moments_multi_ingest")
    graft
      .Tables(spark, dir, "events")
      .select("event_type", "value", "event_id")
      .repartitionByRange(3, col("event_id"))
      .write
      .mode("overwrite")
      .parquet(src)
    val schema = spark.read.parquet(src).schema
    val multi = graft.queries.StreamGate
      .runMomentsStream(
        spark,
        spark.readStream
          .schema(schema)
          .option("maxFilesPerTrigger", "1")
          .parquet(src)
          .select("event_type", "value")
      )
      .collect()
      .toSeq
    assert(multi == single, "3-batch replay diverged from the single drain")
  }
}
