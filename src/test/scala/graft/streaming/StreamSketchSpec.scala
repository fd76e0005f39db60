package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, SparkSpec}

/** Pins the live count-min maintenance path (q168): the drained
  * streaming sketch must equal the batch q159 sketch bit-for-bit —
  * including under a forced multi-batch split, where the per-batch
  * partial counter tables actually exercise the additive merge (a
  * single-batch drain would trivially equal the batch run).
  */
class StreamSketchSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.01"
  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("q168 drained streaming sketch equals batch q159") {
    val streamed = run("q168_stream_count_min").collect().toSeq
    val batch = run("q159_count_min").collect().toSeq
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("partial sketches merge exactly: a forced 3-batch replay equals batch q159") {
    val src = graft.queries.Similarity.freshIndexDir("cms_multi_src")
    graft.Tables(spark, dir, "documents")
      .repartitionByRange(3, col("doc_id"))
      .write
      .mode("overwrite")
      .parquet(src)
    val schema = spark.read.parquet(src).schema
    val stream = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(src)
    val streamed = graft.queries.StreamGate
      .runSketchStream(spark, graft.Tables(spark, dir, "documents"), stream)
      .collect()
      .toSeq
    val batch = run("q159_count_min").collect().toSeq
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("q168 is rerunnable in one session") {
    assert(
      run("q168_stream_count_min").collect().toSeq ==
        run("q168_stream_count_min").collect().toSeq
    )
  }
}
