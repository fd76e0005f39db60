package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, SparkSpec}

class MlLshSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("MinHashLSH pairs recover the high-Jaccard exact pairs") {
    // exact truth from the oracle-checked native formulation
    val exact = SparkEntry
      .queries("q35_ngram_jaccard")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    val ml = MlLsh
      .minhashPairs(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    // OR-amplification with 8 tables: candidate prob at j=0.7 is
    // 1-0.3^8 ≈ 0.99993 — every strong exact pair must surface
    val strong = exact.filter(_._2 >= 0.7).keySet
    assert(strong.nonEmpty, "fixture should contain strong near-dup pairs")
    assert(strong.subsetOf(ml), s"missing strong pairs: ${strong -- ml}")
  }

  test("BRP-LSH ANN top-k matches brute-force cosine top-k on this corpus") {
    val sess = spark
    import sess.implicits._
    val ml = MlLsh
      .annCosineTopK(spark, dir, nQueries = 10, k = 5)
      .select("query_id", "neighbor_id", "rk")
      .as[(Long, Long, Long)]
      .collect()
    val brute = {
      val emb = graft.Tables(spark, dir, "embeddings")
        .select(col("vec_id"), expr("transform(embedding, x -> cast(x AS double))").as("v"))
      val q = emb.filter(col("vec_id") < 10).select(col("vec_id").as("qid"), col("v").as("qv"))
      val c = emb.filter(col("vec_id") >= 10)
      val scored = q
        .crossJoin(c)
        .select(
          col("qid"),
          col("vec_id"),
          expr("cosine_sim(qv, v)").as("cos")
        )
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("qid")
        .orderBy(col("cos").desc, col("vec_id"))
      scored
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 5)
        .select(col("qid"), col("vec_id"), col("rk").cast("long"))
        .as[(Long, Long, Long)]
        .collect()
    }
    val mlSets = ml.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val bruteSets = brute.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(mlSets.keySet == bruteSets.keySet)
    // recall over all queries: sqrt(2) threshold keeps every
    // non-negative-cosine candidate, so misses can come only from
    // bucket misses; with 6 hash tables demand ≥ 80% overall
    val hits = bruteSets.map { case (q, s) => (s intersect mlSets(q)).size }.sum
    val total = bruteSets.values.map(_.size).sum
    assert(hits >= (total * 0.8).toInt, s"ANN recall too low: $hits/$total")
  }
}
