package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Co-located (bucketed) join evidence for the 100 TB posture: when both
  * fact tables are bucketed on the join key, the sort-merge join runs
  * with ZERO shuffle exchanges on its inputs — the property that makes
  * repeated fact-fact joins affordable at scale. Verified against the
  * executed plan, not just claimed.
  */
class BucketingSpec extends AnyFunSuite with SparkSpec {

  test("bucketed fact-fact join plans without a shuffle exchange") {
    val wh = Files.createTempDirectory("graft_warehouse").toString
    val dir = "/root/testdata/sf0.001"

    // external tables at an explicit tmp path — independent of whatever
    // warehouse dir the shared test session was created with
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
    Tables(spark, dir, "orders").write
      .option("path", s"$wh/orders_b")
      .bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey")
      .saveAsTable("orders_b")
    Tables(spark, dir, "lineitem").write
      .option("path", s"$wh/lineitem_b")
      .bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey")
      .saveAsTable("lineitem_b")

    // at sf0.001 both sides fit the broadcast threshold; disable it so
    // the planner exercises the bucketed sort-merge path under test
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark
        .table("lineitem_b")
        .join(spark.table("orders_b"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"))

      joined.collect() // force execution so the adaptive plan finalizes
      val plan = joined.queryExecution.executedPlan.toString

      assert(plan.contains("SortMergeJoin"), s"expected bucketed SMJ:\n$plan")
      assert(plan.contains("Bucketed: true"), s"scan should be bucketed:\n$plan")
      // the join's inputs come straight from the bucketed scans: the only
      // Exchange in the plan is the one ABOVE the join for the final
      // aggregation key (o_orderstatus), never on the join keys
      assert(
        !plan.contains("hashpartitioning(l_orderkey") &&
          !plan.contains("hashpartitioning(o_orderkey"),
        s"bucketed join must not shuffle its inputs:\n$plan"
      )
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }
}
