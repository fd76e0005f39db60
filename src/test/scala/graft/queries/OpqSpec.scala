package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, SparkSpec, Tables}

/** Pins q180's rotated-PQ properties: the rotation is orthonormal
  * (norms preserved), energy-compacting (eigen ordering), the ANN
  * recall vs the exact scan clears the family bar, and the whole
  * pipeline is bit-stable across runs.
  */
class OpqSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  private def emb() =
    Tables(spark, dir, "embeddings")
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x AS double))").as("v"))
      .withColumn("norm", sqrt(expr("aggregate(v, cast(0 AS double), (a, x) -> a + x*x)")))

  test("rotation preserves norms (orthonormal basis) and compacts energy") {
    val orig = emb().select("vec_id", "norm").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val rot = Similarity.rotatedByPcaBasis(spark, dir, emb())
    val rotRows = rot.select("vec_id", "v", "norm").collect()
    rotRows.foreach { r =>
      assert(math.abs(r.getDouble(2) - orig(r.getLong(0))) < 1e-9 * (1 + orig(r.getLong(0))))
    }
    // eigenvalue allocation balances variance ACROSS the 8 PQ
    // subspaces: the measured per-subspace mass spread (max/min of
    // Σ‖dims in block‖²) must be strictly tighter than what the
    // contiguous PCA ordering would give (descending eigen-blocks) —
    // the property that rescued recall from the raw-PCA 0.58 collapse
    val vs = rotRows.map(_.getSeq[Double](1).toArray)
    val blockMass = (0 until 8).map(b => vs.map(v => (8 * b until 8 * b + 8).map(i => v(i) * v(i)).sum).sum)
    val dimMass = (0 until 64).map(i => vs.map(v => v(i) * v(i)).sum)
    val contiguous = dimMass.sortBy(-_).grouped(8).map(_.sum).toSeq
    def spread(xs: Seq[Double]) = xs.max / math.max(xs.min, 1e-12)
    assert(
      spread(blockMass) < spread(contiguous),
      s"allocation spread ${spread(blockMass)} not tighter than contiguous ${spread(contiguous)}"
    )
  }

  test("q180's plain-variant row equals an independent q152 x q40 hit count") {
    val rows = SparkEntry
      .queries("q180_quantizer_eval")(spark, dir)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(rows.keySet == Set("plain_pq", "rotated_pq"))
    rows.values.foreach { case (hits, ppm) =>
      assert(hits >= 0 && hits <= 50)
      assert(ppm == hits * 1000000L / 50)
    }
    // independent cross-check of the plain variant: q152 ∩ q40
    val exact = SparkEntry.queries("q40_cosine_topk")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val pq = SparkEntry.queries("q152_pq_ann")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(rows("plain_pq")._1 == pq.intersect(exact).size.toLong)
    // both variants clear the PQ-family bar on this corpus (the q152
    // spec's 0.5 — isotropic data is PQ's hard case)
    rows.values.foreach { case (hits, _) => assert(hits >= 25) }
  }

  test("q180 is bit-stable across runs") {
    val a = SparkEntry.queries("q180_quantizer_eval")(spark, dir).collect().map(_.toString).toSeq
    val b = SparkEntry.queries("q180_quantizer_eval")(spark, dir).collect().map(_.toString).toSeq
    assert(a.nonEmpty && a == b)
  }
}
