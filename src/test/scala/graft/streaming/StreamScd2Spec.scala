package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, SparkSpec}

/** Pins the live SCD2 gate (q299): the epoch-remapped intervals are
  * micro-batch-independent — a forced 3-batch replay produces exactly
  * the single-drain output, which itself equals the one-commit batch
  * build (all drain commits collapse to epoch 0 because a pure-insert
  * drain of disjoint keys opens intervals and closes none).
  */
class StreamScd2Spec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("remapped intervals are micro-batch-independent and equal the batch build") {
    val docs = graft.Tables(spark, dir, "documents").select("doc_id", "lang", "n_chars")
    val single = SparkEntry.queries("q299_stream_scd2")(spark, dir).collect().toSeq
    // forced 3-file / 3-batch replay of the same corpus
    val src = graft.queries.Similarity.freshIndexDir("scd2_multi_ingest")
    docs.repartitionByRange(3, col("doc_id")).write.mode("overwrite").parquet(src)
    val schema = spark.read.parquet(src).schema
    val multi = graft.queries.StreamGate
      .runScd2Stream(
        spark,
        spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(src)
      )
      .collect()
      .toSeq
    assert(single.nonEmpty)
    assert(multi == single, "3-batch replay diverged from the single drain")
    // and the batch fixture (q289: ONE insert commit + the same three
    // maintenance commits) projects the identical intervals — epochs
    // and raw versions coincide when the drain is one commit
    val batch = SparkEntry.queries("q289_scd2_from_feed")(spark, dir).collect().toSeq
    assert(single == batch, "stream epochs diverged from the batch build's versions")
  }
}
