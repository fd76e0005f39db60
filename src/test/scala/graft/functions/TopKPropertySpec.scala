package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** Property-based equivalence of the `top_k_structs` heap aggregate
  * against the rank-window formulation it replaced, on RANDOM scored
  * data — TopKStructsSpec pins the known traps (ties, under-k groups,
  * partial merge); this spec sweeps the space between them, including
  * the double-ordering edge cases the ANN rewrite's oracle-exactness
  * rests on: exact ties broken by id and ±0.0 (SQL comparison treats
  * them equal, so the id tiebreak must decide). NaN is deliberately
  * NOT generated: negating the sort key flips where NaN lands
  * (greatest before AND after negation), which is exactly why the
  * engine's cosine returns NULL — never NaN — on zero norms, and why
  * every ANN heap site filters undefined scores explicitly before
  * aggregating. Raw ScalaCheck generators with pinned seeds
  * (reproducible; the scalatestplus bridge is not on the offline
  * classpath).
  */
class TopKPropertySpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private val genScore: Gen[Double] =
    Gen.frequency(
      6 -> Gen.chooseNum(-1e6, 1e6),
      2 -> Gen.oneOf(0.0, -0.0),
      1 -> Gen.oneOf(1.5, -1.5, 3.25) // planted exact ties
    )

  private val genRows: Gen[List[(Long, Double)]] =
    Gen.listOf(Gen.zip(Gen.chooseNum(0L, 7L), genScore)).map(_.take(400))

  test("heap top-k equals the rank window on random data (ties, +-0.0)") {
    var seed = Seed(20260814L)
    for (trial <- 1 to 25) {
      val rows = genRows(Gen.Parameters.default, seed).getOrElse(Nil)
      seed = seed.next
      val k = 1 + trial % 9
      if (rows.nonEmpty) {
        val df = rows.zipWithIndex
          .map { case ((g, sc), i) => (g, i.toLong, sc) }
          .toDF("g", "id", "score")
          .repartition(5)
        val viaWindow = df
          .withColumn(
            "rk",
            expr(s"row_number() OVER (PARTITION BY g ORDER BY score DESC, id)")
          )
          .filter(col("rk") <= k)
          .select(col("g"), col("rk").cast("long").as("rank"), col("id"), col("score"))
          .orderBy("g", "rank")
          .collect()
          .toSeq
        val viaHeap = df
          .groupBy("g")
          .agg(expr(s"top_k_structs(struct(-score AS ns, id, score), $k)").as("top"))
          .select(col("g"), posexplode(col("top")))
          .select(
            col("g"),
            (col("pos") + 1).cast("long").as("rank"),
            col("col.id"),
            col("col.score")
          )
          .orderBy("g", "rank")
          .collect()
          .toSeq
        // bit-level equality: ±0.0 must round-trip unchanged through
        // the heap's negate-for-descending trick
        assert(
          viaHeap.map(_.toSeq.map(v => v match { case d: Double => java.lang.Double.doubleToLongBits(d); case x => x })) ==
            viaWindow.map(_.toSeq.map(v => v match { case d: Double => java.lang.Double.doubleToLongBits(d); case x => x })),
          s"trial $trial k=$k rows=${rows.size}"
        )
      }
    }
  }
}
