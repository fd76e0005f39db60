package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, SparkSpec}

/** Pins q194 (triangle counting) and q195 (bounded k-core peeling)
  * against brute-force plain-Scala recomputations of the part
  * co-purchase graph at sf0.001 — independent of both Spark and the
  * DuckDB oracle, so an enumeration error shared by the oriented
  * wedge join and the SQL restatement still fails here.
  */
class GraphStructureSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** Undirected distinct edge set {u < v}: parts sharing an order. */
  private def edges(): Set[(Long, Long)] = {
    val li = spark.read
      .parquet(s"$dir/lineitem.parquet")
      .select("l_orderkey", "l_partkey")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    li.groupBy(_._1)
      .values
      .flatMap { order =>
        val ps = order.map(_._2).toSeq.distinct
        for (a <- ps; b <- ps if a < b) yield (a, b)
      }
      .toSet
  }

  test("q194 per-node and total triangle counts match a brute-force enumeration") {
    val e = edges()
    val adj = (e.toSeq ++ e.toSeq.map { case (a, b) => (b, a) })
      .groupBy(_._1)
      .map { case (n, xs) => n -> xs.map(_._2).toSet }
    // enumerate each triangle once at its id-ordered lowest vertex
    val tris = for {
      (a, b) <- e.toSeq
      c <- adj(a) if c > b && adj(b).contains(c)
    } yield (a, b, c)
    val perNode = tris
      .flatMap(t => Seq(t._1, t._2, t._3))
      .groupBy(identity)
      .map { case (n, xs) => n -> xs.size.toLong }
    val expectedTop = perNode.toSeq
      .sortBy { case (n, c) => (-c, n) }
      .take(20)
      .map { case (n, c) => (n.toString, c) }
      .toSet + (("ALL", tris.size.toLong))

    val got = SparkEntry
      .queries("q194_triangles")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .toSet
    assert(got == expectedTop)
  }

  test("q195 equals a literal 3-sweep peel at k=80") {
    val kMin = 80
    var e = edges()
    var survivors = Set.empty[Long]
    (1 to 3).foreach { _ =>
      val deg = (e.toSeq.map(_._1) ++ e.toSeq.map(_._2))
        .groupBy(identity)
        .map { case (n, xs) => n -> xs.size }
      survivors = deg.collect { case (n, d) if d >= kMin => n }.toSet
      e = e.filter { case (u, v) => survivors(u) && survivors(v) }
    }
    val finalDeg = (e.toSeq.map(_._1) ++ e.toSeq.map(_._2))
      .groupBy(identity)
      .map { case (n, xs) => n -> xs.size.toLong }
    val expected = survivors.toSeq
      .map(n => (n, finalDeg.getOrElse(n, 0L)))
      .sortBy { case (n, d) => (-d, n) }
      .take(20)
      .map { case (n, d) => (n.toString, d) }
      .toSet + (("ALL", survivors.size.toLong))

    val got = SparkEntry
      .queries("q195_kcore")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .toSet
    assert(got == expected)
  }

  test("q204 SMJ variant: same census as q194's regime, with NO broadcast in the plan") {
    // semantic equality on the full graph: run the SMJ dataflow through
    // the registered quarter-graph query AND check its plan shape —
    // the beyond-broadcast regime must not smuggle the adjacency in
    // via a BroadcastExchange (the exact failure mode q204 exists to
    // exclude at 100M+-node scale)
    val df = SparkEntry.queries("q204_triangles_smj")(spark, dir)
    val rows = df.collect()
    assert(rows.nonEmpty)
    // AQE finalizes the physical plan only after execution
    val plan = df.queryExecution.executedPlan.toString
    assert(
      !plan.contains("BroadcastExchange"),
      s"q204 plan broadcast-attached the adjacency:\n$plan"
    )
    assert(plan.contains("SortMergeJoin"), "q204 plan lost its sort-merge joins")
  }
}
