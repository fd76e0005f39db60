package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, SparkSpec}
import graft.operators.{FeedView, TableVersions}

/** Pins the streaming feed-view gate (q219): the drained view equals
  * the query's single-batch run under a forced 3-batch replay, every
  * micro-batch produced one source commit AND one view sync commit,
  * and the view equals the direct head aggregate after the drain.
  */
class StreamFeedViewSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("forced 3-batch replay equals the one-batch drain; one sync commit per batch") {
    val docs = graft.Tables(spark, dir, "documents")
    val feedSrc = graft.queries.Similarity.freshIndexDir("fv_stream_in")
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
    val src = graft.queries.Similarity.freshIndexDir("fv_stream_src_spec")
    val view = graft.queries.Similarity.freshIndexDir("fv_stream_view_spec")
    val drained = graft.queries.StreamGate
      .runFeedViewStream(
        spark,
        src,
        view,
        docs.filter(col("doc_id") % 3 === 0).select("doc_id", "lang", "n_chars"),
        stream
      )
      .collect()
      .toSeq
    assert(drained == SparkEntry.queries("q219_stream_feed_view")(spark, dir).collect().toSeq)
    // source history: init + 3 streamed appends + the takedown delete
    val ops = TableVersions
      .history(spark, src)
      .collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .toSeq
    assert(ops == Seq((0L, "init"), (1L, "append"), (2L, "append"), (3L, "append"), (4L, "delete")))
    // view history: init + one merge commit per sync (3 batches + final)
    val viewOps = TableVersions.history(spark, view).collect().map(_.getString(1)).toSeq
    assert(viewOps == Seq("init", "merge", "merge", "merge", "merge"))
    assert(FeedView.cursor(spark, view) == 4L)
    // the view equals the direct aggregate of the drained head
    val direct = TableVersions
      .readVersion(spark, src, 4L)
      .groupBy(col("lang").cast("string").as("k"))
      .agg(count(lit(1)).as("n_rows"), sum(col("n_chars").cast("long")).as("sum_val"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    val viewSet = FeedView
      .read(spark, view)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(viewSet == direct)
  }
}
