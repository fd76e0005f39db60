package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, SparkSpec}

/** Pins the deterministic Jacobi eigensolver and the q160/q161
  * spectral pipeline built on it.
  */
class PcaSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def codesOf(): (Array[Array[Long]], Int) = {
    val rows = spark.read.parquet(s"$dir/embeddings.parquet").collect()
    val codes = rows.map { r =>
      val emb = r.getSeq[Float](r.fieldIndex("embedding")).map(_.toDouble).toArray
      val mx = math.max(emb.map(math.abs).max, 1e-30)
      // Spark/DuckDB round() is HALF_UP (math.rint would be HALF_EVEN)
      emb.map(x => BigDecimal(x * 127 / mx).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
    }
    (codes, 64)
  }

  test("jacobiEigen solves a known 2x2 exactly with the sign convention") {
    val (vals, vecs) = Pca.jacobiEigen(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(math.abs(vals(0) - 3.0) < 1e-12 && math.abs(vals(1) - 1.0) < 1e-12)
    val r = 1.0 / math.sqrt(2.0)
    assert(vecs(0).zip(Array(r, r)).forall { case (a, b) => math.abs(a - b) < 1e-12 })
    // second vector: pivot entry positive under the convention
    assert(vecs(1).zip(Array(r, -r)).forall { case (a, b) => math.abs(a - b) < 1e-12 } ||
      vecs(1).zip(Array(-r, r)).forall { case (a, b) => math.abs(a - b) < 1e-12 })
    assert(vecs(1).maxBy(math.abs) > 0.0)
  }

  test("corpus covariance eigensolve: orthonormal basis, small residual, descending spectrum") {
    val (codes, dim) = codesOf()
    val n = codes.length
    val upper = new Array[Long](dim * (dim + 1) / 2)
    val sums = new Array[Long](dim)
    codes.foreach { v =>
      var i = 0; var k = 0
      while (i < dim) {
        sums(i) += v(i)
        var j = i
        while (j < dim) { upper(k) += v(i) * v(j); k += 1; j += 1 }
        i += 1
      }
    }
    val cov = Pca.covarianceFromMoments(upper, sums, n.toLong, dim)
    val (vals, vecs) = Pca.jacobiEigen(cov)
    // descending, and (covariance PSD) no more than rounding-negative
    vals.sliding(2).foreach(p => assert(p(0) >= p(1) - 1e-9))
    assert(vals.last > -1e-6)
    // trace preserved
    val tr = (0 until dim).map(i => cov(i)(i)).sum
    assert(math.abs(vals.sum - tr) < 1e-6 * math.abs(tr))
    // orthonormality
    for (a <- 0 until dim; b <- a until dim) {
      val dot = (0 until dim).map(i => vecs(a)(i) * vecs(b)(i)).sum
      assert(math.abs(dot - (if (a == b) 1.0 else 0.0)) < 1e-9, s"vtv($a,$b)=$dot")
    }
    // eigen residual ‖Cv − λv‖∞ small relative to the spectrum scale
    val scale = math.abs(vals(0))
    for (k <- 0 until dim) {
      val cv = (0 until dim).map(i => (0 until dim).map(j => cov(i)(j) * vecs(k)(j)).sum)
      cv.zipWithIndex.foreach { case (x, i) =>
        assert(math.abs(x - vals(k) * vecs(k)(i)) < 1e-8 * scale)
      }
    }
  }

  test("q160 triangle packing matches a brute-force moment recompute") {
    val (codes, dim) = codesOf()
    val got = SparkEntry
      .queries("q160_code_moments")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    assert(got.size == dim * (dim + 1) / 2)
    val sums = Array.tabulate(dim)(i => codes.map(_(i)).sum)
    for (i <- 0 until dim; j <- i until dim) {
      val s = codes.map(v => v(i) * v(j)).sum
      assert(got((i.toLong, j.toLong)) == ((s, sums(i), sums(j), codes.length.toLong)), s"cell ($i,$j)")
    }
  }

  test("q161 projections match a plain recompute and are bit-stable across runs") {
    val (codes, dim) = codesOf()
    val n = codes.length
    val upper = new Array[Long](dim * (dim + 1) / 2)
    val sums = new Array[Long](dim)
    codes.foreach { v =>
      var i = 0; var k = 0
      while (i < dim) {
        sums(i) += v(i)
        var j = i
        while (j < dim) { upper(k) += v(i) * v(j); k += 1; j += 1 }
        i += 1
      }
    }
    val cov = Pca.covarianceFromMoments(upper, sums, n.toLong, dim)
    val (_, vecs) = Pca.jacobiEigen(cov)
    val mean = sums.map(_.toDouble / n)

    val run1 = SparkEntry.queries("q161_pca_project")(spark, dir).collect()
    val run2 = SparkEntry.queries("q161_pca_project")(spark, dir).collect()
    assert(run1.map(_.toString).toSeq == run2.map(_.toString).toSeq, "nondeterministic output")

    val ids = spark.read.parquet(s"$dir/embeddings.parquet").select("vec_id").collect()
      .map(_.getLong(0))
    val byId = ids.zip(codes).toMap
    run1.foreach { r =>
      val qc = byId(r.getLong(0))
      (0 until 4).foreach { k =>
        // same fold order as the Spark HOF: left-to-right accumulate,
        // then subtract the centering constant
        var acc = 0.0
        var i = 0
        while (i < dim) { acc += qc(i) * vecs(k)(i); i += 1 }
        val center = vecs(k).zip(mean).map { case (a, b) => a * b }.sum
        val expected = acc - center
        val gotV = r.getDouble(r.fieldIndex(s"p${k + 1}"))
        assert(math.abs(gotV - expected) < 1e-9, s"vec ${r.getLong(0)} p${k + 1}")
      }
    }
  }
}
