package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, SparkSpec}
import graft.operators.TableVersions

/** Pins the streaming join-view gate (q253): the drained view equals
  * the query's single-batch run under a forced 3-batch replay, every
  * micro-batch produced one fact commit AND one view sync commit, and
  * the BEYOND-BROADCAST regime — broadcastMaxRows = 0 forces every
  * delta through the co-partitioned sort-merge path — drains
  * bit-equal to the broadcast regime.
  */
class StreamJoinViewSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  private def run(broadcastMaxRows: Long): (Seq[org.apache.spark.sql.Row], String, String) = {
    val docs = graft.Tables(spark, dir, "documents")
    val feedSrc = graft.queries.Similarity.freshIndexDir("jv_stream_in")
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
    val a = graft.queries.Similarity.freshIndexDir("jv_stream_a_spec")
    val view = graft.queries.Similarity.freshIndexDir("jv_stream_view_spec")
    val drained = graft.queries.StreamGate
      .runJoinViewStream(
        spark,
        a,
        graft.queries.Similarity.freshIndexDir("jv_stream_b_spec"),
        view,
        docs.filter(col("doc_id") % 3 === 0).select("doc_id", "lang", "n_chars"),
        docs,
        stream,
        broadcastMaxRows
      )
      .collect()
      .toSeq
    (drained, a, view)
  }

  test("forced 3-batch replay equals the one-batch drain; one sync commit per batch") {
    val (drained, a, view) = run(broadcastMaxRows = 100000L)
    assert(drained == SparkEntry.queries("q253_stream_join_view")(spark, dir).collect().toSeq)
    // fact history: init + 3 streamed appends + the takedown delete
    val ops = TableVersions
      .history(spark, a)
      .collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .toSeq
    assert(ops == Seq((0L, "init"), (1L, "append"), (2L, "append"), (3L, "append"), (4L, "delete")))
    // view history: init + one merge commit per sync (3 batches + final)
    val viewOps = TableVersions.history(spark, view).collect().map(_.getString(1)).toSeq
    assert(viewOps == Seq("init", "merge", "merge", "merge", "merge"))
  }

  test("the co-partitioned SMJ delta regime drains bit-equal to broadcast") {
    val (smj, _, _) = run(broadcastMaxRows = 0L)
    val (bc, _, _) = run(broadcastMaxRows = 100000L)
    assert(smj == bc)
  }
}
