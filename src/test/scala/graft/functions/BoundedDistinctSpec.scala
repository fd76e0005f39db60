package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** distinct_up_to: sorted distinct list within the cap, NULL past it,
  * duplicate-insensitive, exact at the cap boundary — including across
  * partial/merge boundaries (the repartition cases force map-side
  * partials to merge). */
class BoundedDistinctSpec extends AnyFunSuite with SparkSpec {

  test("collects sorted distinct values within cap, NULL past cap, exact at boundary") {
    import spark.implicits._
    // key 1: 3 distinct; key 2: exactly 5 distinct (= cap); key 3: 6 distinct (> cap)
    val rows =
      Seq(1L -> 30L, 1L -> 10L, 1L -> 20L, 1L -> 10L) ++
        (1L to 5L).map(2L -> _) ++
        (1L to 6L).map(3L -> _)
    val out = rows
      .toDF("k", "v")
      .repartition(7) // force partial buffers that merge across partitions
      .groupBy("k")
      .agg(expr("distinct_up_to(v, 5)").as("d"))
      .collect()
      .map(r => r.getLong(0) -> Option(r.getSeq[Long](1)).map(_.toVector))
      .toMap
    assert(out(1L).contains(Vector(10L, 20L, 30L)))
    assert(out(2L).contains(Vector(1L, 2L, 3L, 4L, 5L)))
    assert(out(3L).isEmpty)
  }

  test("matches collect_set semantics under the cap on random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val rows = Seq.fill(5000)((rnd.nextInt(40).toLong, rnd.nextInt(60).toLong))
    val df = rows.toDF("k", "v").repartition(11).cache()
    val bounded = df
      .groupBy("k")
      .agg(expr("distinct_up_to(v, 1000)").as("d"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toVector)
      .toMap
    val reference = rows.groupBy(_._1).map { case (k, vs) =>
      k -> vs.map(_._2).distinct.sorted.toVector
    }
    assert(bounded == reference)
    df.unpersist()
  }

  test("NULL values are ignored; all-NULL group yields empty array") {
    import spark.implicits._
    val out = Seq((1L, Some(7L)), (1L, None), (2L, None))
      .toDF("k", "v")
      .groupBy("k")
      .agg(expr("distinct_up_to(v, 5)").as("d"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toVector)
      .toMap
    assert(out(1L) == Vector(7L))
    assert(out(2L) == Vector.empty)
  }
}
