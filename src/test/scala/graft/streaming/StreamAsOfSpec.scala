package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec
import graft.operators.AsOfIndex

/** Pins the streaming as-of search gate (q251): under a forced 3-batch
  * replay the HEAD answers equal the one-batch drain's (intermediate
  * versions legitimately differ — batching IS the history), each batch
  * produced one segment, a replayed sync is a no-op, and no erased doc
  * answers at the head.
  */
class StreamAsOfSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("forced 3-batch replay: head answers equal; syncs idempotent; erasure holds") {
    val docs = graft.Tables(spark, dir, "documents")
    val feedSrc = graft.queries.Similarity.freshIndexDir("asof_stream_in")
    docs
      .filter(col("doc_id") % 3 =!= 0)
      .select("doc_id", "text")
      .repartitionByRange(3, col("doc_id"))
      .write
      .mode("overwrite")
      .parquet(feedSrc)
    val schema = spark.read.parquet(feedSrc).schema
    val stream =
      spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(feedSrc)
    val src = graft.queries.Similarity.freshIndexDir("asof_stream_src_spec")
    val idx = graft.queries.Similarity.freshIndexDir("asof_stream_idx_spec")
    val out = graft.queries.StreamGate
      .runAsOfSearchStream(
        spark,
        src,
        idx,
        docs.filter(col("doc_id") % 3 === 0).select("doc_id", "text"),
        stream
      )
      .collect()
    // 3 streamed batches: history v0..v3 + erasure v4; head answers
    // equal the single-batch query's head answers
    val headV = out.map(_.getLong(0)).max
    assert(headV == 4L)
    val headRows = out.filter(_.getLong(0) == headV).map(r => (r.getLong(1), r.getLong(2))).toSet
    val single = graft.SparkEntry
      .queries("q251_stream_asof_search")(spark, dir)
      .collect()
    val singleHead = single.filter(_.getLong(0) == single.map(_.getLong(0)).max)
      .map(r => (r.getLong(1), r.getLong(2)))
      .toSet
    assert(headRows == singleHead)
    // no erased doc answers at the head
    assert(!headRows.exists(_._1 % 13 == 0))
    // idempotent: another sync against the unmoved source is a no-op
    assert(AsOfIndex.sync(spark, src, idx) == 4L)
    assert(AsOfIndex.cursor(spark, idx) == 4L)
    // v0 (the base) answers only base docs
    assert(out.filter(_.getLong(0) == 0L).forall(_.getLong(1) % 3 == 0))
  }
}
