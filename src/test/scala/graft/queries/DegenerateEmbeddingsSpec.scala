package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, SparkSpec}

/** Degenerate embedding-corpus robustness, the vector-side sibling of
  * DegenerateCorpusSpec: the non-clustered similarity queries must
  * return EMPTY (never throw) on an empty corpus, and behave exactly
  * on a single-vector corpus (no self-matches, no negatives to draw).
  * KMeans-backed queries (q46/q128/q133/q139…) are deliberately out of
  * scope: fitting k=16 cells needs ≥k vectors and MLlib's error for
  * that is the correct behavior — an index build on a near-empty
  * corpus is a caller bug, not a case to paper over.
  */
class DegenerateEmbeddingsSpec extends AnyFunSuite with SparkSpec {

  private def writeEmb(name: String, rows: Seq[(Long, Seq[Float], Int)]): String = {
    val dir = new java.io.File(s"target/graft_scratch/degenerate_emb_$name").getAbsolutePath
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete(): Unit
    }
    rm(new java.io.File(dir))
    val sess = spark
    import sess.implicits._
    rows.toDF("vec_id", "embedding", "label").write.parquet(s"$dir/embeddings.parquet")
    dir
  }

  private val queriesUnderTest = Seq("q40_cosine_topk", "q147_int8_ann", "q150_negative_sample")

  test("empty embedding corpus: brute-force, quantized, and sampling queries return empty") {
    val dir = writeEmb("empty", Seq.empty)
    queriesUnderTest.foreach { q =>
      val out = SparkEntry.queries(q)(spark, dir).collect()
      assert(out.isEmpty, s"$q returned ${out.length} rows on an empty corpus")
    }
  }

  test("single-vector corpus: self-exclusion leaves nothing to match or sample") {
    val v = Seq.fill(64)(0.5f)
    val dir = writeEmb("single", Seq((1L, v, 0)))
    queriesUnderTest.foreach { q =>
      val out = SparkEntry.queries(q)(spark, dir).collect()
      assert(out.isEmpty, s"$q matched something on a single-vector corpus")
    }
  }

  test("spectral family: empty corpus — moments are zeros, the eigensolve fails LOUDLY") {
    val dir = writeEmb("spectral_empty", Seq.empty)
    // q160: the moment aggregate's zero buffer unpacks to 2080 all-zero
    // cells with n = 0 — a well-defined (and honest) answer
    val cells = SparkEntry.queries("q160_code_moments")(spark, dir).collect()
    assert(cells.length == 64 * 65 / 2)
    cells.foreach { r =>
      assert(r.getLong(2) == 0L && r.getLong(3) == 0L && r.getLong(5) == 0L)
    }
    // q161: covariance of an empty corpus is undefined — the operator
    // must refuse with its documented message, never emit a basis
    val ex = intercept[Exception] {
      SparkEntry.queries("q161_pca_project")(spark, dir).collect()
    }
    assert(ex.getMessage != null && ex.getMessage.contains("empty corpus"))
    // q163: no v1 side → empty drift report, not an error
    assert(SparkEntry.queries("q163_embedding_drift")(spark, dir).collect().isEmpty)
  }

  test("spectral family: all-zero vectors — zero covariance, identity basis, zero projections") {
    val dir = writeEmb("spectral_zeros", (1L to 20L).map(i => (i, Seq.fill(64)(0.0f), (i % 3).toInt)))
    // Jacobi on the zero matrix converges trivially; projections are 0
    val proj = SparkEntry.queries("q161_pca_project")(spark, dir).collect()
    assert(proj.length == 20)
    proj.foreach { r =>
      (2 to 5).foreach(i => assert(r.getDouble(i) == 0.0, s"nonzero projection at col $i"))
    }
    // drift of identical (zero) distributions is exactly zero
    val drift = SparkEntry.queries("q163_embedding_drift")(spark, dir).collect()
    assert(drift.nonEmpty && drift.forall(_.getLong(3) == 0L))
  }

  test("zero-norm (corrupt) vectors never enter a neighbor list, as anchor or candidate") {
    // cosine is undefined against the zero vector: cosine_sim returns
    // NULL by contract, and every ANN heap site excludes NULL scores
    // explicitly (NULL would sort FIRST in the heap's ascending struct
    // order and win the top-k — the pre-rewrite DESC window pushed it
    // last instead). Corrupt rows must vanish from rankings, not throw
    // and not rank.
    val good1 = Seq.tabulate(64)(i => i.toFloat / 64)
    val good2 = Seq.tabulate(64)(i => 1f - i.toFloat / 64)
    val dir = writeEmb(
      "zeronorm",
      Seq((1L, good1, 0), (2L, good2, 1), (3L, Seq.fill(64)(0f), 0))
    )
    val rows = SparkEntry.queries("q40_cosine_topk")(spark, dir).collect()
    // anchors 1 and 2 each find only each other; anchor 3 (zero) finds
    // nothing and is found by nobody
    assert(rows.map(r => (r.getLong(0), r.getAs[Long]("vec_id"))).toSet == Set((1L, 2L), (2L, 1L)))
    assert(rows.forall(r => !r.isNullAt(r.fieldIndex("cos"))))
  }

  test("two-vector corpus: exactly one neighbor each, none for the out-of-range anchor") {
    val dir = writeEmb(
      "pair",
      Seq((1L, Seq.tabulate(64)(i => i.toFloat / 64), 0), (2L, Seq.tabulate(64)(i => 1f - i.toFloat / 64), 1))
    )
    val rows = SparkEntry.queries("q40_cosine_topk")(spark, dir).collect()
    // both ids are < 10 so both act as anchors; each finds exactly the other
    assert(rows.length == 2)
    assert(rows.map(r => (r.getLong(0), r.getAs[Long]("vec_id"))).toSet == Set((1L, 2L), (2L, 1L)))
    rows.foreach(r => assert(r.getAs[Long]("rank") == 1L))
  }
}
