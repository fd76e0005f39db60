package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, SparkSpec}

/** Pins the streaming erasure gate (q206): the drained evidence table
  * is independent of how the forget requests split into micro-batches
  * (erasure is a set union), and no forgotten subject survives in any
  * evidence row — not as a keyword hit, not as admission-index
  * shingle mass.
  */
class StreamErasureSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.01"
  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("q206 forced 3-batch replay equals the single-drain run; no subject survives") {
    val single = run("q206_stream_erasure").collect().toSeq
    assert(single.nonEmpty)

    val docs = graft.Tables(spark, dir, "documents")
    val forgetIds = docs
      .filter(col("doc_id") % 2 === 0 && col("doc_id") % 17 === 2)
      .select("doc_id")
    val src = graft.queries.Similarity.freshIndexDir("erasure_multi_src")
    forgetIds.repartitionByRange(3, col("doc_id")).write.mode("overwrite").parquet(src)
    val schema = spark.read.parquet(src).schema
    val replay = graft.queries.StreamGate
      .runErasureStream(
        spark,
        docs.filter(col("doc_id") % 2 === 0),
        spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(src)
      )
      .collect()
      .toSeq
    assert(replay == single, "drained evidence depends on the micro-batch split")

    // negative space: a forgotten subject must not appear in any
    // lookup evidence row (census/shingle rows are aggregates)
    val forgotten = forgetIds.collect().map(_.getLong(0).toString).toSet
    val lookupKeys = single.filter(_.getString(0) == "lookup").map(_.getString(1)).toSet
    assert(lookupKeys.intersect(forgotten).isEmpty, "erased subject surfaced in a keyword lookup")
  }
}
