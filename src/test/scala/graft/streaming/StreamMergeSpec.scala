package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, SparkSpec}
import graft.operators.TableVersions

/** Pins the streaming CDC-apply gate (q189): one commitMerge per
  * micro-batch must land the drained head exactly where the one-shot
  * batch merge (q185) lands it — independent of how the upsert feed
  * splits into micro-batches (the fixture's batches carry disjoint
  * keys, so apply order cannot matter; the forced 3-file replay
  * exercises that across real boundaries, with each batch's merge
  * doing its own copy-on-write against the evolving table).
  */
class StreamMergeSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.01"
  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("q189 drained head equals the batch q185 merge") {
    val streamed = run("q189_stream_merge").collect().toSeq
    val batch = run("q185_merge_upsert").collect().toSeq
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("forced 3-batch replay: content equal, one merge version per batch") {
    val docs = graft.Tables(spark, dir, "documents")
    val src = graft.queries.Similarity.freshIndexDir("merge_multi_src")
    docs
      .filter(col("doc_id") % 6 === 0)
      .withColumn("lang", lit("xx"))
      .withColumn("n_chars", col("n_chars") + 7)
      .unionByName(docs.filter(col("doc_id") % 3 === 1))
      .repartitionByRange(3, col("doc_id"))
      .write
      .mode("overwrite")
      .parquet(src)
    val schema = spark.read.parquet(src).schema
    val stream =
      spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(src)
    val tdir = graft.queries.Similarity.freshIndexDir("merge_stream_spec")
    val streamed = graft.queries.StreamGate
      .runMergeStream(spark, tdir, docs.filter(col("doc_id") % 3 === 0), stream)
      .collect()
      .toSeq
    assert(streamed == run("q185_merge_upsert").collect().toSeq)
    assert(TableVersions.currentVersion(spark, tdir) == 3L)
  }

  test("q189 is rerunnable in one session") {
    assert(run("q189_stream_merge").collect().toSeq == run("q189_stream_merge").collect().toSeq)
  }
}
