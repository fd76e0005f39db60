package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, SparkSpec}

/** Pins the live covering-index gate (q286): the drained lookups and
  * census must be split-invariant — per-window LSM folds compose
  * because latest-wins is associative across segments — so a forced
  * 3-file/3-batch replay (one sync segment per micro-batch) equals the
  * single-batch drain row for row.
  */
class StreamCoveringSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.01"
  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("drained covering-index answers are micro-batch-independent") {
    val docs = graft.Tables(spark, dir, "documents")
    def sharded(df: org.apache.spark.sql.DataFrame, prefix: String) = {
      val src = graft.queries.Similarity.freshIndexDir(prefix)
      df.repartitionByRange(3, col("doc_id")).write.mode("overwrite").parquet(src)
      val schema = spark.read.parquet(src).schema
      spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(src)
    }
    val single = run("q286_stream_covering_index").collect().toSeq
    val multi = graft.queries.StreamGate
      .runCoveringIndexStream(
        spark,
        docs.filter(col("doc_id") % 2 === 0).select("doc_id", "lang", "n_chars"),
        sharded(
          docs.filter(col("doc_id") % 2 === 1).select("doc_id", "lang", "n_chars"),
          "cov_multi_ingest"
        )
      )
      .collect()
      .toSeq
    assert(single.nonEmpty)
    assert(multi == single)
  }

  test("q286 is rerunnable in one session") {
    assert(
      run("q286_stream_covering_index").collect().toSeq ==
        run("q286_stream_covering_index").collect().toSeq
    )
  }
}
