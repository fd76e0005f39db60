package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, SparkSpec, Tables}

/** Pins the end-to-end dedup pipeline (q130/q131): the keepSet
  * composition itself on a hand-computed fixture, and the corpus-scale
  * result against a plain-Scala union-find + canonical-pick recompute.
  * Together with PipelineSpec's "q36 == q35 pairs" recall pin and
  * q131's DuckDB oracle, this closes the loop: candidates,
  * verification, clustering, canonical selection, and the keep/drop
  * partition are each certified by at least two independent paths.
  */
class DedupPipelineSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  /** Plain-Scala union-find (path compression; min element as root
    * label, matching ConnectedComponents' min-label contract). */
  private def components(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x
      else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { val lo = math.min(ra, rb); parent(math.max(ra, rb)) = lo }
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  /** The pipeline's keep rule, restated independently: one
    * best-quality doc (tie asc doc_id) per component + all singletons. */
  private def expectedKeepSet(
      quality: Map[Long, Double],
      pairs: Seq[(Long, Long)]
  ): Seq[(Long, Long, Long, Double)] = {
    val label = components(pairs)
    val canon = label.groupBy(_._2).map { case (cl, members) =>
      val ids = members.keys.toSeq
      val best = ids.minBy(id => (-quality(id), id))
      (best, cl, ids.size.toLong, quality(best))
    }
    val singles = (quality.keySet -- label.keySet).map(id => (id, id, 1L, quality(id)))
    (canon ++ singles).toSeq.sortBy(_._1)
  }

  test("keepSet composes clustering, canonical pick, and singletons on a hand fixture") {
    val sess = spark
    import sess.implicits._
    // cluster {1,2,3} via a CHAIN (1-2, 2-3): transitivity must hold
    // even though 1 and 3 never pair directly. Doc 2 has the most
    // tokens → highest quality → canonical. Cluster {10,11}: identical
    // text → identical quality → tie-break keeps 10. 20/21 untouched.
    val docs = Seq(
      1L -> "alpha beta gamma delta epsilon",
      2L -> "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu",
      3L -> "alpha beta gamma",
      10L -> "same words either way here",
      11L -> "same words either way here",
      20L -> "lone document twenty",
      21L -> "lone document twenty one"
    ).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("d1", "d2")

    val got = Dedup
      .keepSet(docs, pairs)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    val quality = docs
      .select(col("doc_id"), TextOps.qualityExpr.as("q"))
      .collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
      .toMap
    assert(got == expectedKeepSet(quality, Seq((1L, 2L), (2L, 3L), (10L, 11L))))
    // and the structural read of the same result, hand-checked:
    assert(got.map(t => (t._1, t._2, t._3)) ==
      Seq((2L, 1L, 3L), (10L, 10L, 2L), (20L, 20L, 1L), (21L, 21L, 1L)))
  }

  test("q130 matches a plain-Scala recompute from the registered q36 pairs, and q131") {
    val pairs = SparkEntry
      .queries("q36_minhash_lsh")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSeq
    val quality = Tables(spark, dir, "documents")
      .select(col("doc_id"), TextOps.qualityExpr.as("q"))
      .collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
      .toMap
    val got = SparkEntry
      .queries("q130_dedup_pipeline")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    assert(got == expectedKeepSet(quality, pairs))
    // dropped docs all lost to a same-cluster canonical of >= quality
    val kept = got.map(_._1).toSet
    val label = components(pairs)
    val dropped = quality.keySet -- kept
    assert(dropped.forall(label.contains))
    // this corpus's planted near-dups sit at j >= 0.9 where LSH recall
    // is 1.0 (PipelineSpec pins q36 == q35), so the MinHash pipeline
    // and the oracle-checked exact pipeline must agree exactly
    val exact = SparkEntry
      .queries("q131_dedup_pipeline_exact")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    assert(got == exact)
  }

  test("q146 incremental admission equals the full q35 pair graph restricted to cross-set pairs") {
    // the incremental plan (new-batch shingles joined only against the
    // old corpus) must admit EXACTLY the pairs a full self-join re-run
    // finds between the two sets — no recall loss from incrementality
    val full = SparkEntry
      .queries("q35_ngram_jaccard")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .filter { case (d1, d2, _) => (d1 % 5 == 4) != (d2 % 5 == 4) }
      .map { case (d1, d2, j) => if (d1 % 5 == 4) (d1, d2, j) else (d2, d1, j) }
      .sortBy { case (dn, dq, _) => (dn, dq) }
      .toSeq
    val incr = SparkEntry
      .queries("q146_incremental_neardup")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSeq
    assert(incr == full)
    assert(incr.nonEmpty || full.isEmpty)
  }

  test("q156 decontamination equals a plain-Scala 8-gram overlap recompute") {
    val docs = Tables(spark, dir, "documents")
      .select("doc_id", "text")
      .collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def grams(t: String): Set[String] = {
      val ws = t.split(" ", -1)
      if (ws.length < 8) Set.empty else ws.sliding(8).map(_.mkString(" ")).toSet
    }
    val bench = docs.filter(_._1 % 11 == 0).map { case (id, t) => (id, grams(t)) }
    val expected = docs
      .filter(_._1 % 11 != 0)
      .flatMap { case (id, t) =>
        val g = grams(t)
        val hits = bench.filter(_._2.exists(g))
        if (hits.isEmpty) None
        else
          Some(
            (
              id,
              hits.length.toLong,
              g.count(x => bench.exists(_._2(x))).toLong,
              hits.map(_._1).min
            )
          )
      }
      .sortBy(_._1)
      .toSeq
    val got = SparkEntry
      .queries("q156_decontaminate")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got.nonEmpty)
    assert(got == expected)
  }
}
