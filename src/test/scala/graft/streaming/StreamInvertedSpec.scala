package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, SparkSpec}

/** Pins the live inverted-index maintenance gate (q184): draining the
  * crawl stream (posting appends) and the erasure stream (tombstones)
  * then compacting must land the index in EXACTLY the state the batch
  * q176 lifecycle produces — the lookup results are equal, and equal
  * independent of how the sources split into micro-batches (appends
  * are disjoint posting rows and tombstones a set union, so the
  * drained layout is split-invariant by construction; the forced
  * 3-file/3-batch replay exercises that claim across real batch
  * boundaries). Also rerunnable (fresh index dir per run).
  */
class StreamInvertedSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.01"
  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("q184 drained lookup equals the batch q176 lifecycle") {
    val streamed = run("q184_stream_inverted").collect().toSeq
    val batch = run("q176_inverted_maintain").collect().toSeq
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("lookup is micro-batch-independent: a forced 3-batch replay equals q176") {
    val docs = graft.Tables(spark, dir, "documents")
    // shard both stream sides into 3 files and drain one per trigger —
    // a document's postings and its erasure can now arrive in
    // different micro-batches than its neighbors'
    def sharded(df: org.apache.spark.sql.DataFrame, prefix: String) = {
      val src = graft.queries.Similarity.freshIndexDir(prefix)
      df.repartitionByRange(3, col("doc_id")).write.mode("overwrite").parquet(src)
      val schema = spark.read.parquet(src).schema
      spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(src)
    }
    val streamed = graft.queries.StreamGate
      .runInvertedMaintenance(
        spark,
        docs.filter(col("doc_id") % 5 =!= 4),
        sharded(docs.filter(col("doc_id") % 5 === 4).select("doc_id", "text"), "inv_multi_ingest"),
        sharded(docs.filter(col("doc_id") % 13 === 0).select("doc_id"), "inv_multi_forget")
      )
      .collect()
      .toSeq
    val batch = run("q176_inverted_maintain").collect().toSeq
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("q184 is rerunnable in one session") {
    assert(run("q184_stream_inverted").collect().toSeq == run("q184_stream_inverted").collect().toSeq)
  }
}
