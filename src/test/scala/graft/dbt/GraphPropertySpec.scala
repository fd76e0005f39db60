package graft.dbt

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** Property-based invariants for the iterative graph operators: on
  * random DAGs, `transitiveClosure` must equal a driver-side
  * Floyd-Warshall-style shortest-hops reference, and
  * `reverseReachable` must equal the closure filtered to the seed set.
  * Raw ScalaCheck generators with pinned seeds (reproducible; the
  * scalatestplus bridge is not on the offline classpath).
  */
class GraphPropertySpec extends AnyFunSuite with SparkSpec {

  /** Random DAG on n nodes: edges only from lower to higher index, so
    * the closure is finite and acyclic by construction. */
  private def genDag(n: Int): Gen[List[(Int, Int)]] =
    Gen
      .listOfN(
        2 * n,
        for {
          a <- Gen.chooseNum(0, n - 2)
          b <- Gen.chooseNum(a + 1, n - 1)
        } yield (a, b)
      )
      .map(_.distinct)

  /** Driver-side BFS shortest-hops reference over the edge list. */
  private def refClosure(edges: List[(Int, Int)]): Map[(Int, Int), Int] = {
    val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val out = scala.collection.mutable.Map[(Int, Int), Int]()
    for (start <- edges.map(_._1).distinct) {
      var frontier = Set(start)
      var hops = 0
      while (frontier.nonEmpty && hops < 10) {
        hops += 1
        frontier = frontier.flatMap(x => adj.getOrElse(x, Nil))
        frontier.foreach { d =>
          if (!out.contains((start, d))) out((start, d)) = hops
        }
        frontier = frontier.filter(d => out((start, d)) == hops)
      }
    }
    out.toMap
  }

  private def edgesDf(edges: List[(Int, Int)]) = {
    val s = spark
    import s.implicits._
    edges.map { case (a, b) => (s"n$a", s"n$b") }.toDF("src", "dst")
  }

  test("transitiveClosure equals driver-side shortest-hops reference on random DAGs") {
    val samples =
      (1 to 5).flatMap(i => genDag(8).apply(Gen.Parameters.default, Seed(i.toLong)))
    assert(samples.nonEmpty)
    samples.filter(_.nonEmpty).foreach { edges =>
      val got = ManifestOps
        .transitiveClosure(edgesDf(edges))
        .collect()
        .map(r => (r.getAs[String]("src"), r.getAs[String]("dst")) -> r.getAs[Int]("hops"))
        .toMap
      val want = refClosure(edges).map { case ((a, b), h) => (s"n$a", s"n$b") -> h }
      assert(got == want, s"edges=$edges")
    }
  }

  test("upsert: update rows win on key collision, unmatched base rows carry over") {
    val s = spark
    import s.implicits._
    val base = Seq(("a", 1), ("b", 2), ("c", 3)).toDF("k", "v")
    val upd = Seq(("b", 20), ("d", 40)).toDF("k", "v")
    val got = ManifestOps
      .upsert(base, upd, "k")
      .collect()
      .map(r => r.getString(0) -> r.getInt(1))
      .toMap
    assert(got == Map("a" -> 1, "b" -> 20, "c" -> 3, "d" -> 40))
  }

  test("reverseReachable equals closure filtered to seeds") {
    val samples =
      (6 to 9).flatMap(i => genDag(8).apply(Gen.Parameters.default, Seed(i.toLong)))
    samples.filter(_.nonEmpty).foreach { edges =>
      val s = spark
      import s.implicits._
      // seed on the two highest-index nodes that appear as dst
      val seedIds = edges.map(_._2).distinct.sorted.takeRight(2).map(i => s"n$i")
      val seeds = seedIds.toDF("changed_id")
      val got = ManifestOps
        .reverseReachable(edgesDf(edges), seeds)
        .collect()
        .map(r =>
          (r.getAs[String]("src"), r.getAs[String]("changed_id")) -> r.getAs[Int]("hops")
        )
        .toMap
      val want = refClosure(edges).collect {
        case ((a, b), h) if seedIds.contains(s"n$b") => (s"n$a", s"n$b") -> h
      }
      assert(got == want, s"edges=$edges seeds=$seedIds")
    }
  }
}
