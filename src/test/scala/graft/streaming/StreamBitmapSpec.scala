package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, SparkSpec}

/** Pins the live bitmap-index maintenance gate (q279): draining the
  * crawl stream (OR-segment appends) and the erasure stream
  * (segment-versioned delete masks) then compacting must land the
  * census in EXACTLY the state the batch q275 lifecycle produces —
  * and equal under ANY micro-batch split (bit_or folds are
  * associative/commutative and masks a bit union, so the folded words
  * are split-invariant by construction; the forced 3-file/3-batch
  * replay exercises that claim across real batch boundaries).
  */
class StreamBitmapSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.01"
  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("q279 drained census equals the batch q275 lifecycle") {
    val streamed = run("q279_stream_bitmap").collect().toSeq
    val batch = run("q275_bitmap_maintenance").collect().toSeq
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("census is micro-batch-independent: a forced 3-batch replay equals q275") {
    val docs = graft.Tables(spark, dir, "documents")
    def sharded(df: org.apache.spark.sql.DataFrame, prefix: String) = {
      val src = graft.queries.Similarity.freshIndexDir(prefix)
      df.repartitionByRange(3, col("doc_id")).write.mode("overwrite").parquet(src)
      val schema = spark.read.parquet(src).schema
      spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(src)
    }
    val streamed = graft.queries.StreamGate
      .runBitmapMaintenance(
        spark,
        docs.filter(col("doc_id") % 2 === 0).select("doc_id", "lang"),
        sharded(docs.filter(col("doc_id") % 2 === 1).select("doc_id", "lang"), "bm_multi_ingest"),
        sharded(docs.filter(col("doc_id") % 7 === 3).select("doc_id"), "bm_multi_forget")
      )
      .collect()
      .toSeq
    val batch = run("q275_bitmap_maintenance").collect().toSeq
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("q279 is rerunnable in one session") {
    assert(run("q279_stream_bitmap").collect().toSeq == run("q279_stream_bitmap").collect().toSeq)
  }
}
