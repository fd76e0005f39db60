package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, SparkSpec}

/** Pins the bounded admit-then-fold admission gate (q191): under the
  * single-batch drain its verdicts coincide with the one-shot q146
  * definition (the shared oracle also checks this), and under a forced
  * 3-batch split the verdicts equal a sequential reference that admits
  * each shard against the corpus-so-far with the from-scratch
  * admissionPairs recompute and then grows the corpus — the
  * order-sensitive online semantics, validated shard by shard.
  */
class StreamIndexAdmissionSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.01"
  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("q191 single-batch drain equals the one-shot q146 verdicts") {
    val served = run("q191_stream_index_admission").collect().toSeq
    val batch = run("q146_incremental_neardup").collect().toSeq
    assert(served.nonEmpty)
    assert(served == batch)
  }

  test("forced 3-batch replay equals the sequential admit-then-fold reference") {
    val docs = graft.Tables(spark, dir, "documents").select("doc_id", "text")
    val corpus = docs.filter(col("doc_id") % 5 =!= 4)
    val newDocs = docs.filter(col("doc_id") % 5 === 4)
    val src = graft.queries.Similarity.freshIndexDir("idx_adm_multi_src")
    newDocs.repartitionByRange(3, col("doc_id")).write.mode("overwrite").parquet(src)
    val schema = spark.read.parquet(src).schema
    val stream =
      spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(src)
    val streamed = graft.queries.StreamGate
      .runIndexAdmissionStream(spark, corpus, stream)
      .collect()
      .toSeq

    // sequential reference: shard bounds mirror repartitionByRange's
    // ordering (ascending doc_id), so replay the same three shards
    val shardOf = spark.read
      .parquet(src)
      .withColumn("__f", org.apache.spark.sql.functions.input_file_name())
    val shards = shardOf
      .groupBy("__f")
      .agg(min("doc_id").as("lo"))
      .orderBy("lo")
      .collect()
      .map(_.getString(0))
    var corpusSoFar = corpus
    val ref = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.Row]
    shards.foreach { f =>
      val shard = spark.read.parquet(src).withColumn("__f", input_file_name())
        .filter(col("__f") === f).drop("__f")
      ref ++= graft.queries.Dedup
        .admissionPairs(corpusSoFar, shard, graft.queries.Dedup.PairMinJaccard)
        .collect()
      corpusSoFar = corpusSoFar.unionByName(shard)
    }
    val refSorted = ref.toSeq.sortBy(r => (r.getLong(0), r.getLong(1)))
    assert(streamed == refSorted)
  }

  test("q191 is rerunnable in one session") {
    assert(
      run("q191_stream_index_admission").collect().toSeq ==
        run("q191_stream_index_admission").collect().toSeq
    )
  }
}
