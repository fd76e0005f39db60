package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** Pins the determinized mode-label propagation against a plain-Scala
  * reference on seeded random graphs, plus the structural properties
  * (two dense cliques joined by one bridge edge keep distinct
  * communities; isolated-direction nodes keep their labels).
  */
class LabelPropagationSpec extends AnyFunSuite with SparkSpec {

  private def run(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val sess = spark
    import sess.implicits._
    LabelPropagation
      .propagate(edges.toDF("src", "dst"), iters)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
  }

  /** Reference implementation: same synchronous sweep, same
    * (count DESC, label ASC) tie order, no Spark. */
  private def reference(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val in = edges.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    var labels = nodes.map(n => n -> n).toMap
    (1 to iters).foreach { _ =>
      labels = nodes.map { n =>
        in.get(n) match {
          case None => n -> labels(n)
          case Some(srcs) =>
            val counted = srcs.map(labels).groupBy(identity).view.mapValues(_.size).toSeq
            n -> counted.minBy { case (l, c) => (-c, l) }._1
        }
      }.toMap
    }
    labels
  }

  test("matches the reference sweep on seeded random graphs") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 3) {
      val n = 30 + trial * 10
      val edges = (1 to n * 3).map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
        .distinct
      for (iters <- Seq(0, 1, 3)) {
        assert(run(edges, iters) == reference(edges, iters), s"trial $trial iters $iters")
      }
    }
  }

  test("two cliques with one bridge stay separate communities") {
    def clique(ids: Seq[Long]) =
      for (a <- ids; b <- ids if a != b) yield (a, b)
    val edges = clique(Seq(1L, 2L, 3L, 4L)) ++ clique(Seq(10L, 11L, 12L, 13L)) ++
      Seq((4L, 10L), (10L, 4L))
    val got = run(edges, 3)
    val left = Seq(1L, 2L, 3L).map(got)
    val right = Seq(11L, 12L, 13L).map(got)
    assert(left.distinct.size == 1 && right.distinct.size == 1)
    assert(left.head != right.head, "bridge edge merged the communities")
  }

  test("a node with no in-edges keeps its own label") {
    val got = run(Seq((5L, 6L), (6L, 7L)), 3)
    assert(got(5L) == 5L)
  }
}
