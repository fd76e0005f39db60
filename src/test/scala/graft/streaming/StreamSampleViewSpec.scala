package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, SparkSpec}
import graft.operators.{SampleView, TableVersions}

/** Pins the streaming sample-view gate (q233): the drained sample is
  * split-invariant (a forced 3-batch replay equals the one-batch
  * drain), every micro-batch produced one source commit AND one view
  * sync commit, and the post-drain erasure left only under-filled
  * groups — never refilled slots.
  */
class StreamSampleViewSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("forced 3-batch replay equals the one-batch drain; one sync per batch") {
    val docs = graft.Tables(spark, dir, "documents")
    val feedSrc = graft.queries.Similarity.freshIndexDir("sv_stream_in")
    docs
      .filter(col("doc_id") % 3 === 1)
      .select("doc_id", "lang", "n_chars")
      .repartitionByRange(3, col("doc_id"))
      .write
      .mode("overwrite")
      .parquet(feedSrc)
    val schema = spark.read.parquet(feedSrc).schema
    val stream =
      spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(feedSrc)
    val src = graft.queries.Similarity.freshIndexDir("sv_stream_src_spec")
    val view = graft.queries.Similarity.freshIndexDir("sv_stream_view_spec")
    val drained = graft.queries.StreamGate
      .runSampleViewStream(
        spark,
        src,
        view,
        docs.filter(col("doc_id") % 3 === 0).select("doc_id", "lang", "n_chars"),
        stream
      )
      .collect()
      .toSeq
    assert(drained == SparkEntry.queries("q233_stream_sample_view")(spark, dir).collect().toSeq)
    // source history: init + 3 streamed appends + the erasure delete
    val ops = TableVersions.history(spark, src).collect().map(_.getString(1)).toSeq
    assert(ops == Seq("init", "append", "append", "append", "delete"))
    // view history: init + one merge commit per sync (3 batches + final)
    val viewOps = TableVersions.history(spark, view).collect().map(_.getString(1)).toSeq
    assert(viewOps == Seq("init", "merge", "merge", "merge", "merge"))
    assert(SampleView.cursor(spark, view) == 4L)
    // no erased key survives anywhere in the live sample
    val leaked = SampleView
      .read(spark, view, 8)
      .filter(col("key").cast("long") % 11 === 4)
      .count()
    assert(leaked == 0L)
  }
}
