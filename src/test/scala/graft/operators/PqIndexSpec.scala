package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, SparkSpec}

/** Pins the product-quantization ANN path (q152): recall vs the exact
  * q40 top-5, the 8×[0,16) code shape (the 32× compression claim), and
  * determinism under fixed seeds.
  */
class PqIndexSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.01"
  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  private def emb =
    graft.Tables(spark, dir, "embeddings")
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x AS double))").as("v"))
      .withColumn("norm", sqrt(expr("aggregate(v, cast(0 AS double), (a, x) -> a + x*x)")))

  test("q152 recall vs exact q40 top-5") {
    val brute = run("q40_cosine_topk")
      .collect()
      .map(r => (r.getLong(0), r.getAs[Long]("vec_id")))
      .toSet
    val pq = run("q152_pq_ann").collect()
    assert(pq.length == 50)
    val hits = pq.map(r => (r.getLong(0), r.getAs[Long]("vec_id"))).count(brute)
    val recall = hits.toDouble / brute.size
    // 50 ADC candidates (10% of the sf0.01 corpus) + exact re-rank on
    // an isotropic synthetic corpus — the hard case for PQ, same
    // rationale as q128's nprobe note
    assert(recall >= 0.5, s"recall $recall")
  }

  test("codes are 8 subspace cells in [0, 16) — the 32x compression shape") {
    val cb = PqIndex.fitCodebooks(emb)
    assert(cb.length == 8 && cb.forall(_._2.length == 16))
    val codes = PqIndex.encode(emb, cb).select("codes").collect().map(_.getSeq[Int](0))
    assert(codes.nonEmpty)
    codes.foreach { cs =>
      assert(cs.length == 8)
      assert(cs.forall(c => c >= 0 && c < 16))
    }
  }

  test("q152 is deterministic under fixed seeds") {
    assert(run("q152_pq_ann").collect().toSeq == run("q152_pq_ann").collect().toSeq)
  }
}
