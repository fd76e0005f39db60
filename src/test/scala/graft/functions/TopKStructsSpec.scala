package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** Pins the `top_k_structs` heap aggregate: agreement with the
  * rank-window formulation it replaces (the oracle-hash-preservation
  * property the ANN rewrites rely on), partial-merge correctness
  * across partitionings, under-k groups, payload fidelity, and the
  * plan shape (ObjectHashAggregate with a partial stage — never a
  * window sort).
  */
class TopKStructsSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private def scored = {
    // deterministic pseudo-random scores over 3 groups × 2000 rows,
    // including exact score ties broken by id
    spark
      .range(6000)
      .select(
        (col("id") % 3).as("g"),
        col("id"),
        (expr("xxhash64(id)") % 1000).cast("double").as("score")
      )
  }

  test("matches the row_number window formulation exactly (desc by score, id tiebreak)") {
    val viaWindow = scored
      .withColumn(
        "rk",
        expr(
          "row_number() OVER (PARTITION BY g ORDER BY score DESC, id)"
        )
      )
      .filter(col("rk") <= 7)
      .select(col("g"), col("rk").cast("long").as("rank"), col("id"), col("score"))
      .orderBy("g", "rank")
      .collect()
      .toSeq
    val viaHeap = scored
      .groupBy("g")
      .agg(expr("top_k_structs(struct(-score AS ns, id, score), 7)").as("top"))
      .select(col("g"), posexplode(col("top")))
      .select(col("g"), (col("pos") + 1).cast("long").as("rank"), col("col.id"), col("col.score"))
      .orderBy("g", "rank")
      .collect()
      .toSeq
    assert(viaHeap == viaWindow)
  }

  test("partition-independent: 1 partition and 32 partitions merge to identical results") {
    def run(parts: Int) = scored
      .repartition(parts)
      .groupBy("g")
      .agg(expr("top_k_structs(struct(score, id), 5)").as("top"))
      .select(col("g"), col("top"))
      .orderBy("g")
      .collect()
      .toSeq
    assert(run(1) == run(32))
  }

  test("groups smaller than k return all rows, ascending") {
    val out = Seq((0L, 3.0), (0L, 1.0), (1L, 2.0))
      .toDF("g", "score")
      .groupBy("g")
      .agg(expr("top_k_structs(struct(score), 10)").as("top"))
      .select(col("g"), expr("transform(top, x -> x.score)").as("scores"))
      .orderBy("g")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1)))
      .toSeq
    assert(out == Seq((0L, Seq(1.0, 3.0)), (1L, Seq(2.0))))
  }

  test("plan: ObjectHashAggregate with a map-side partial stage, no window sort") {
    val df = scored
      .groupBy("g")
      .agg(expr("top_k_structs(struct(score, id), 5)").as("top"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan.take(2000))
    assert(plan.contains("partial_top_k_structs") || plan.contains("partial top_k_structs"),
      plan.take(2000))
    assert(!plan.contains("WindowExec") && !plan.contains("WindowGroupLimit"), plan.take(2000))
  }

  test("k must be a positive integer literal") {
    intercept[Exception] {
      scored.groupBy("g").agg(expr("top_k_structs(struct(score), 0)")).collect()
    }: Unit
  }
}
