package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, SparkSpec}

/** Pins the filtered-vector-search pair (q212 exact / q213 IVF-served):
  * every served hit satisfies the predicate, recall against the exact
  * filtered scan clears the bar, and the label predicate physically
  * reaches the index scan as a pushed filter.
  */
class FilteredAnnSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.01"
  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("q213: hits satisfy the predicate; recall ≥ 0.9 vs the exact filtered scan") {
    val exact = run("q212_filtered_ann")
      .collect()
      .map(r => (r.getLong(0), r.getLong(2)))
      .toSet
    assert(exact.nonEmpty)
    val served = run("q213_filtered_ivf").collect()
    assert(served.nonEmpty)
    // predicate satisfaction: every returned neighbor has label = 2
    val labels = graft.Tables(spark, dir, "embeddings")
      .select("vec_id", "label")
      .collect()
      .map(r => r.getLong(0) -> r.getInt(1))
      .toMap
    assert(served.forall(r => labels(r.getLong(2)) == 2), "a hit violates the predicate")
    // recall against exact
    val servedPairs = served.map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (servedPairs & exact).size.toDouble / exact.size
    assert(recall >= 0.9, s"filtered-IVF recall $recall < 0.9")
  }

  test("the label predicate reaches the index scan as a pushed filter") {
    val idx = graft.queries.Similarity.freshIndexDir("filtered_plan")
    val e = graft
      .Tables(spark, dir, "embeddings")
      .select(
        col("vec_id"),
        expr("transform(embedding, x -> cast(x AS double))").as("v"),
        col("label")
      )
      .withColumn("norm", sqrt(expr("aggregate(v, cast(0 AS double), (a, x) -> a + x*x)")))
    IvfIndex.build(e, idx, k = 8, maxIter = 3, seed = 42L, attrs = Seq("label"))
    val served = IvfIndex.probeFiltered(
      spark,
      idx,
      e.filter(col("vec_id") < 5).select(col("vec_id").as("q_id"), col("v").as("qv")),
      filterExpr = Some("label = 2"),
      nprobe = 2,
      topK = 3
    )
    val plan = served.queryExecution.executedPlan.toString
    assert(
      plan.contains("PushedFilters") && plan.contains("label"),
      s"label predicate not pushed into the index scan:\n$plan"
    )
  }
}
