package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, SparkSpec}

/** Pins the live write-audit-publish gate (q293): the drained
  * published state is split-invariant (the same defect rows exist and
  * the same remediation removes them under any micro-batching), and a
  * 3-batch replay exercises the ship-what-passed semantics — clean
  * batches keep publishing around a held dirty one.
  */
class StreamWapSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.01"
  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("drained published state is micro-batch-independent") {
    val docs = graft.Tables(spark, dir, "documents")
    def sharded(df: org.apache.spark.sql.DataFrame, prefix: String) = {
      val src = graft.queries.Similarity.freshIndexDir(prefix)
      df.repartitionByRange(3, col("doc_id")).write.mode("overwrite").parquet(src)
      val schema = spark.read.parquet(src).schema
      spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(src)
    }
    val single = run("q293_stream_wap").collect().toSeq
    val multi = graft.queries.StreamGate
      .runWapStream(
        spark,
        docs.filter(col("doc_id") % 3 === 0).select("doc_id", "lang", "n_chars"),
        sharded(
          docs.filter(col("doc_id") % 3 =!= 0).select("doc_id", "lang", "n_chars"),
          "wap_multi_ingest"
        )
      )
      .collect()
      .toSeq
    assert(single.nonEmpty)
    assert(multi == single)
  }

  test("q293 is rerunnable in one session") {
    assert(run("q293_stream_wap").collect().toSeq == run("q293_stream_wap").collect().toSeq)
  }
}
