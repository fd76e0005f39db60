package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** [[DistributedRank]] must reproduce the single-partition window's
  * answers EXACTLY while never planning a partition-less window or a
  * single-task sort — the whole point of the primitive.
  */
class DistributedRankSpec extends AnyFunSuite with SparkSpec {

  private def fixture(n: Int, seed: Long) = {
    import spark.implicits._
    // deterministic pseudo-random longs with heavy ties on v (the skew
    // case: one value dominating must still spread across partitions)
    (0 until n)
      .map { i =>
        val h = (i * 2654435761L + seed) & Long.MaxValue
        (i.toLong, if (h % 5 == 0) 0L else h % 97)
      }
      .toDF("id", "v")
  }

  test("rowNumber matches the global window rank exactly (ties broken by id)") {
    val df = fixture(5000, 7L)
    val got = DistributedRank
      .rowNumber(df, Seq(col("v"), col("id")), "rn", nPart = 8)
    assert(got.total == 5000L)
    val expected = df
      .withColumn("rn", row_number().over(Window.orderBy(col("v"), col("id"))).cast("long"))
    assert(got.df.exceptAll(expected).isEmpty && expected.exceptAll(got.df).isEmpty)
  }

  test("rowNumber plans no Window operator and no single-partition global sort") {
    val df = fixture(1000, 3L)
    val plan = DistributedRank
      .rowNumber(df, Seq(col("v"), col("id")), "rn", nPart = 8)
      .df
      .queryExecution
      .optimizedPlan
    val windows = plan.collect { case w: org.apache.spark.sql.catalyst.plans.logical.Window => w }
    assert(windows.isEmpty, s"rowNumber must not plan a window:\n$plan")
  }

  test("prefixSumExclusive matches the global running-sum window exactly") {
    val df = fixture(3000, 11L)
    val got = DistributedRank
      .prefixSumExclusive(df, Seq(col("v"), col("id")), col("v") * 3 + 1, "ps", nPart = 8)
    assert(got.total == 3000L)
    val w = Window
      .orderBy(col("v"), col("id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val expected = df
      .withColumn("ps", coalesce(sum(col("v") * 3 + 1).over(w), lit(0L)))
    assert(got.df.exceptAll(expected).isEmpty && expected.exceptAll(got.df).isEmpty)
  }

  test("prefixSumExclusive windows are partitioned (parallel), never global") {
    val df = fixture(1000, 5L)
    val plan = DistributedRank
      .prefixSumExclusive(df, Seq(col("v"), col("id")), col("v"), "ps", nPart = 8)
      .df
      .queryExecution
      .optimizedPlan
    val bad = plan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window if w.partitionSpec.isEmpty => w
    }
    assert(bad.isEmpty, s"prefix-sum window must be pid-partitioned:\n$plan")
  }

  test("single-row and empty frames") {
    import spark.implicits._
    val one = Seq((1L, 42L)).toDF("id", "v")
    val r1 = DistributedRank.rowNumber(one, Seq(col("v"), col("id")), "rn", nPart = 4)
    assert(r1.total == 1L && r1.df.select("rn").head().getLong(0) == 1L)
    val empty = one.filter(col("id") < 0)
    val r0 = DistributedRank.rowNumber(empty, Seq(col("v"), col("id")), "rn", nPart = 4)
    assert(r0.total == 0L && r0.df.count() == 0L)
  }
}
