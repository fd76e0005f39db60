package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, SparkSpec}

/** Pins the live streaming admission path (q149): draining the
  * new-document stream must produce exactly the batch q146 verdict
  * set — INDEPENDENT of how the source splits into micro-batches.
  * The single-file gate replay drains in one batch; the forced-split
  * test below shards the new docs into 3 files and drains them one
  * file per trigger, so the stage-and-recompute contract
  * (StreamGate.runAdmissionStream) is exercised across real batch
  * boundaries, where the old per-batch formulation silently diverged
  * (df counts and Jaccard denominators saw only old∪batch, not
  * old∪all-new). Also rerunnable (fresh staging dir per run).
  */
class StreamAdmissionSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.01"
  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("q149 streamed admission verdicts equal the batch q146 run") {
    val streamed = run("q149_stream_admission").collect().toSeq
    val batch = run("q146_incremental_neardup").collect().toSeq
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("verdicts are micro-batch-independent: a forced 3-batch replay equals q146") {
    val corpus = graft.Tables(spark, dir, "documents")
      .select("doc_id", "text")
      .filter(col("doc_id") % 5 =!= 4)
    // shard the new side into 3 files and drain one file per trigger —
    // rare shingles and doc sizes now straddle batch boundaries
    val src = graft.queries.Similarity.freshIndexDir("admission_multi_src")
    graft.Tables(spark, dir, "documents")
      .select("doc_id", "text")
      .filter(col("doc_id") % 5 === 4)
      .repartitionByRange(3, col("doc_id"))
      .write
      .mode("overwrite")
      .parquet(src)
    val schema = spark.read.parquet(src).schema
    val stream = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(src)
    val streamed =
      graft.queries.StreamGate.runAdmissionStream(spark, corpus, stream).collect().toSeq
    val batch = run("q146_incremental_neardup").collect().toSeq
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("q149 is rerunnable in one session") {
    assert(run("q149_stream_admission").collect().toSeq == run("q149_stream_admission").collect().toSeq)
  }
}
