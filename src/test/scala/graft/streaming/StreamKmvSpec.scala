package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, SparkSpec}

/** Pins the live KMV maintenance path (q199): the drained streaming
  * sketch must equal batch q192's sketch columns exactly — including
  * under a forced multi-batch split, where per-batch partial sketches
  * actually exercise the distinct-union + re-cut merge.
  */
class StreamKmvSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.01"
  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  /** Batch q192's (scope, kth_h60, est_distinct) for the sketch scopes
    * the stream maintains (everything except the direct-global 'ALL'
    * row, which is not a merge product). */
  private def batchReference(): Seq[(String, Long, Long)] =
    run("q192_kmv_distinct")
      .filter(col("scope") =!= "ALL")
      .select("scope", "kth_h60", "est_distinct")
      .collect()
      .toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)

  test("q199 drained streaming sketch equals batch q192's sketch columns") {
    val streamed = run("q199_stream_kmv")
      .collect()
      .toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(streamed.nonEmpty)
    assert(streamed == batchReference())
  }

  test("partial sketches merge exactly: a forced 3-batch replay equals batch q192") {
    val src = graft.queries.Similarity.freshIndexDir("kmv_multi_src")
    graft
      .Tables(spark, dir, "lineitem")
      .repartitionByRange(3, col("l_orderkey"))
      .write
      .mode("overwrite")
      .parquet(src)
    val schema = spark.read.parquet(src).schema
    val stream = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(src)
    val streamed = graft.queries.StreamGate
      .runKmvStream(spark, stream)
      .collect()
      .toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(streamed == batchReference())
  }

  test("q199 is rerunnable in one session") {
    assert(
      run("q199_stream_kmv").collect().toSeq == run("q199_stream_kmv").collect().toSeq
    )
  }
}
