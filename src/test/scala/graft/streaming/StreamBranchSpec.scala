package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, SparkSpec}

/** Pins the live branch-workflow gate (q306): main history is exactly
  * two snapshots under any micro-batching (the per-batch in-gate
  * REQUIRE already proves mid-drain isolation), and a forced 3-batch
  * replay produces the identical main census.
  */
class StreamBranchSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("main census is micro-batch-independent; branch commits never leak mid-drain") {
    val docs = graft.Tables(spark, dir, "documents").select("doc_id", "lang", "n_chars")
    val single = SparkEntry.queries("q306_stream_branch")(spark, dir).collect().toSeq
    assert(single.map(_.getLong(0)) == Seq(0L, 1L), "main must hold exactly two snapshots")
    val src = graft.queries.Similarity.freshIndexDir("branch_multi_ingest")
    docs
      .filter(col("doc_id") % 2 === 1)
      .repartitionByRange(3, col("doc_id"))
      .write
      .mode("overwrite")
      .parquet(src)
    val schema = spark.read.parquet(src).schema
    val multi = graft.queries.StreamGate
      .runBranchStream(
        spark,
        docs.filter(col("doc_id") % 2 === 0),
        spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(src)
      )
      .collect()
      .toSeq
    assert(multi == single, "3-batch replay diverged from the single drain")
  }
}
