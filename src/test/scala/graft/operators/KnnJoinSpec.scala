package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, SparkSpec}

/** q128 corpus×corpus top-k ANN self-join (operators/KnnJoin). */
class KnnJoinSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def emb =
    graft.Tables(spark, dir, "embeddings")
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x AS double))").as("v"))
      .withColumn("norm", sqrt(expr("aggregate(v, cast(0 AS double), (a, x) -> a + x*x)")))

  /** Exact top-5 for EVERY vector — brute force, test-only (250k pairs
    * at sf0.001).
    */
  private lazy val exactTop5: Set[(Long, Long)] = {
    val e = emb
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("vec_id"))
    e.select(col("vec_id").as("q_id"), col("v").as("qv"), col("norm").as("qn"))
      .crossJoin(broadcast(e))
      .filter(col("q_id") =!= col("vec_id"))
      .withColumn("cos", expr("cosine_sim(qv, v)"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select("q_id", "vec_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
  }

  test("q128 recall vs exact top-5 is >= 0.9 at sf0.001") {
    val approx = SparkEntry
      .queries("q128_knn_join")(spark, dir)
      .select("q_id", "vec_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    val hits = (approx & exactTop5).size
    val recall = hits.toDouble / exactTop5.size
    info(f"recall@5 = $recall%.4f ($hits/${exactTop5.size})")
    assert(recall >= 0.9, f"kNN-join recall $recall%.4f below 0.9")
  }

  test("q128 is deterministic and well-shaped (k per query, ranks 1..k, no self-pairs)") {
    val a = SparkEntry.queries("q128_knn_join")(spark, dir).collect()
    val b = SparkEntry.queries("q128_knn_join")(spark, dir).collect()
    assert(a.toSeq == b.toSeq, "q128 not deterministic across runs")
    assert(a.forall(r => r.getLong(0) != r.getLong(2)), "self-pair leaked")
    val byQ = a.groupBy(_.getLong(0))
    byQ.foreach { case (q, rows) =>
      val ranks = rows.map(_.getLong(1)).sorted.toSeq
      assert(ranks == (1L to rows.length).toSeq, s"query $q ranks not dense: $ranks")
      assert(rows.length <= 5, s"query $q returned ${rows.length} > k rows")
    }
    // exact-cosine ordering within each query: descending, ties by id
    byQ.foreach { case (q, rows) =>
      val sorted = rows.sortBy(_.getLong(1))
      val coss = sorted.map(_.getDouble(3)).toSeq
      assert(coss == coss.sorted(Ordering[Double].reverse), s"query $q cos not descending")
    }
  }

  test("cellCap bounds the indexed side of a dense cell (skew guard)") {
    val sess = spark
    import sess.implicits._
    // 40 near-identical vectors (one dense cell) + 8 spread vectors.
    // dim 4 keeps KMeans trivial; cap=8 must bound every cell's
    // returned-neighbor candidates.
    val rows = (0L until 40L).map(i => (i, Seq(1.0, 0.001 * i, 0.0, 0.0))) ++
      (40L until 48L).map(i => (i, Seq(-1.0, 0.0, 0.001 * (i - 40), 0.0)))
    val e = rows
      .toDF("vec_id", "v")
      .withColumn("norm", sqrt(expr("aggregate(v, cast(0 AS double), (a, x) -> a + x*x)")))
    val out = KnnJoin.knnSelfJoin(e, k = 40, kCells = 2, nprobe = 1, cellCap = 8).collect()
    // with cap=8 only vec_ids 0..7 (and 40..47 in the other cell) are
    // indexable → no returned neighbor id outside the first 8 of a cell
    val returned = out.map(_.getLong(2)).toSet
    assert(returned.subsetOf((0L until 8L).toSet ++ (40L until 48L).toSet),
      s"cap leaked indexed vectors: $returned")
    // every query still gets answers (capped-out vectors still query)
    val queried = out.map(_.getLong(0)).toSet
    assert((0L until 48L).toSet.subsetOf(queried), "capped-out vectors lost their queries")
  }
}
