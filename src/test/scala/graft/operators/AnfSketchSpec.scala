package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** [[AnfSketch]]'s load-bearing property is EXACT, not statistical:
  * after d supersteps, node v's register for trial j must equal the
  * bitwise OR of the INITIAL registers of every node within d hops —
  * the estimator is then textbook FM over that union. The spec
  * computes d-hop neighborhoods brute-force on small known graphs and
  * compares registers bit-for-bit; a separate test sanity-bounds the
  * debiased estimate on a clique (where N(d≥1) is exact by hand).
  */
class AnfSketchSpec extends AnyFunSuite with SparkSpec {

  private def edgesDf(pairs: Seq[(Long, Long)]) = {
    val s = spark
    import s.implicits._
    val fwd = pairs.toDF("src", "dst")
    fwd.union(fwd.select(col("dst").as("src"), col("src").as("dst")))
  }

  private def nodesOf(pairs: Seq[(Long, Long)]) = {
    val s = spark
    import s.implicits._
    pairs.flatMap(p => Seq(p._1, p._2)).distinct.toDF("node")
  }

  /** Brute-force d-hop neighborhood (self included) on the symmetric
    * closure of `pairs`. */
  private def reach(pairs: Seq[(Long, Long)], start: Long, d: Int): Set[Long] = {
    val adj = (pairs ++ pairs.map(p => (p._2, p._1)))
      .groupBy(_._1)
      .map { case (k, v) => k -> v.map(_._2).toSet }
    var frontier = Set(start)
    var seen = Set(start)
    (1 to d).foreach { _ =>
      frontier = frontier.flatMap(adj.getOrElse(_, Set.empty)) -- Set.empty
      seen = seen ++ frontier
    }
    seen
  }

  test("d supersteps = bitwise OR of initial registers within d hops (path + disjoint triangle)") {
    // path 1-2-3-4-5 plus a disjoint triangle 10-11-12: unions must
    // respect distance AND component boundaries
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L), (11L, 12L), (12L, 10L))
    val edges = edgesDf(pairs)
    val nodes = nodesOf(pairs)
    val k = 8
    def collectRegs(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[Long]] =
      df.collect().map(r => r.getLong(0) -> (1 to k).map(r.getLong(_))).toMap
    val init = collectRegs(AnfSketch.initRegisters(nodes, k))
    var regs = AnfSketch.initRegisters(nodes, k)
    (1 to 3).foreach { d =>
      regs = AnfSketch.superstep(regs, edges).localCheckpoint()
      val got = collectRegs(regs)
      val nodeIds = pairs.flatMap(p => Seq(p._1, p._2)).distinct
      nodeIds.foreach { v =>
        val hood = reach(pairs, v, d)
        (0 until k).foreach { j =>
          val want = hood.map(u => init(u)(j)).reduce(_ | _)
          assert(
            got(v)(j) == want,
            s"node $v trial $j at d=$d: got ${got(v)(j)}, want $want (hood $hood)"
          )
        }
      }
    }
  }

  test("debiased estimate is within the FM bound on a 40-clique") {
    val s = spark
    import s.implicits._
    val n = 40
    val pairs = for { a <- 0 until n; b <- (a + 1) until n } yield (a.toLong, b.toLong)
    val edges = edgesDf(pairs)
    val nodes = nodesOf(pairs)
    var regs = AnfSketch.initRegisters(nodes, 32)
    regs = AnfSketch.superstep(regs, edges)
    // every node reaches the whole clique at d = 1: N = 40 exactly
    val ests = AnfSketch.estimate(regs).select("est").collect().map(_.getDouble(0))
    ests.foreach { e =>
      assert(e > 40 * 0.6 && e < 40 * 1.7, s"estimate $e outside the k=32 FM bound for N=40")
    }
  }
}
