package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, SparkSpec}
import graft.operators.{FeedView, TableVersions}

/** Pins the change-feed streaming source (q321): rate-limited
  * version-per-batch micro-batches, RESTART-from-checkpoint continuity
  * (no commit skipped, none double-delivered), foldEvents replay
  * idempotence, and the streamed view equaling the hand-synced batch
  * view over the same history.
  */
class CdfSourceSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def fresh(tag: String) = graft.queries.Similarity.freshIndexDir(tag)

  private def docs = graft.Tables(spark, dir, "documents")
    .select(col("doc_id"), col("lang"), col("n_chars"))

  /** Drain the source into an in-memory accumulator of
    * (_commit_version, doc_id) pairs; returns (pairs, dataBatches). */
  private def drain(
      src: String,
      ck: String,
      maxPerBatch: Int,
      sink: java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]
  ): Int = {
    val q = spark.readStream
      .format("graft.streaming.CdfSourceProvider")
      .option("path", src)
      .option("maxVersionsPerBatch", maxPerBatch.toString)
      .load()
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        batch
          .select(col("_commit_version"), col("doc_id"))
          .collect()
          .foreach(r => sink.add((r.getLong(0), r.getLong(1))): Unit)
      }
      .option("checkpointLocation", ck)
      .trigger(Trigger.AvailableNow())
      .start()
    try q.awaitTermination()
    finally {
      q.stop()
      org.apache.spark.sql.graftshims.StreamingStateHygiene.unloadAllStateStores()
    }
    q.recentProgress.count(_.numInputRows > 0)
  }

  test("rate limit: one commit per micro-batch; events equal the batch feed exactly") {
    val src = fresh("cdfspec_src")
    TableVersions.commitAppend(docs.filter(col("doc_id") % 4 === 0), src) // v0
    TableVersions.commitAppend(docs.filter(col("doc_id") % 4 === 1), src) // v1
    TableVersions.commitDelete(spark, src, "doc_id % 10 = 0") // v2
    TableVersions.commitAppend(docs.filter(col("doc_id") % 4 === 2), src) // v3
    val got = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    val batches = drain(src, fresh("cdfspec_ck"), maxPerBatch = 1, got)
    // startingVersion=0 is exclusive of v0 (the consumer's init
    // snapshot), so the drain covers v1..v3 — three windows
    assert(batches == 3, s"3 post-v0 commits at maxVersionsPerBatch=1 must be 3 batches, saw $batches")
    // startingVersion defaults to 0, so the stream delivers the feed
    // window (0, head] — exclusive of the v0 snapshot, like a consumer
    // initialized from it
    val wantPairs = TableVersions
      .changesFeed(spark, src, 0L, 3L)
      .select("_commit_version", "doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSeq
      .sorted
    import scala.jdk.CollectionConverters._
    assert(got.asScala.toSeq.sorted == wantPairs)
  }

  test("restart from checkpoint: later commits drain with no gap and no double delivery") {
    val src = fresh("cdfspec_src2")
    val ck = fresh("cdfspec_ck2")
    TableVersions.commitAppend(docs.filter(col("doc_id") % 4 === 0), src) // v0
    TableVersions.commitAppend(docs.filter(col("doc_id") % 4 === 1), src) // v1
    val got = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    assert(drain(src, ck, maxPerBatch = 1, got) == 1) // drains (0, 1]
    // new commits land while the stream is DOWN
    TableVersions.commitDelete(spark, src, "doc_id % 10 = 1") // v2
    TableVersions.commitAppend(docs.filter(col("doc_id") % 4 === 2), src) // v3
    assert(drain(src, ck, maxPerBatch = 1, got) == 2) // resumes at the checkpoint: (1, 3]
    import scala.jdk.CollectionConverters._
    val wantPairs = TableVersions
      .changesFeed(spark, src, 0L, 3L)
      .select("_commit_version", "doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSeq
      .sorted
    assert(got.asScala.toSeq.sorted == wantPairs, "restart must neither skip nor re-deliver")
  }

  test("foldEvents is idempotent under at-least-once replay") {
    val src = fresh("cdfspec_src3")
    val view = fresh("cdfspec_view3")
    TableVersions.commitAppend(docs.filter(col("doc_id") % 4 === 0), src) // v0
    FeedView.init(spark, src, view, "lang", "n_chars")
    TableVersions.commitAppend(docs.filter(col("doc_id") % 4 === 1), src) // v1
    val window = TableVersions.changesFeed(spark, src, 0L, 1L).localCheckpoint()
    assert(FeedView.foldEvents(spark, view, window, "lang", "n_chars", 1L) == 1L)
    val after = FeedView.read(spark, view).collect().map(_.toSeq).toSet
    // the replayed batch (same events, same cursor target) must fold NOTHING
    assert(FeedView.foldEvents(spark, view, window, "lang", "n_chars", 1L) == 1L)
    assert(FeedView.read(spark, view).collect().map(_.toSeq).toSet == after)
    // and the view still equals the direct aggregate
    val direct = TableVersions
      .readVersion(spark, src, 1L)
      .groupBy(col("lang").cast("string").as("k"))
      .agg(count(lit(1)).as("n_rows"), sum(col("n_chars").cast("long")).as("sum_val"))
      .collect()
      .map(_.toSeq)
      .toSet
    assert(after == direct)
  }

  test("streamed q321 equals the direct post-history aggregate over its own slice") {
    // q321's fixture is the doc_id % 3 = 0 SLICE of q216's history
    // (append → CoW delete % 5 → zh update +1000 → MOR delete % 7 = 3),
    // so the batch twin is the direct aggregate of that history's
    // survivors — the same closed form as q321's DuckDB oracle. (It is
    // NOT q216's output: q216 runs the full corpus.)
    val streamed = SparkEntry
      .queries("q321_cdf_stream_feed_view")(spark, dir)
      .collect()
      .toSeq
    val direct = docs
      .filter(col("doc_id") % 3 === 0 && col("doc_id") % 5 =!= 0 && col("doc_id") % 7 =!= 3)
      .withColumn(
        "nc",
        when(col("lang") === "zh", col("n_chars") + 1000).otherwise(col("n_chars"))
      )
      .groupBy(col("lang").as("k"))
      .agg(count(lit(1)).as("n_rows"), sum(col("nc").cast("long")).as("sum_val"))
      .orderBy("k")
      .collect()
      .toSeq
    assert(streamed == direct)
  }
}
