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

  test("ranks are invariant to the partition count: nPart in {8, 32, 256} and auto") {
    val df = fixture(5000, 13L)
    val order = Seq(col("v"), col("id"))
    val base = DistributedRank.rowNumber(df, order, "rn", nPart = 8)
    for (p <- Seq(32, 256, 0 /* auto: derived from input stats */ )) {
      val got = DistributedRank.rowNumber(df, order, "rn", nPart = p)
      assert(got.total == base.total, s"total changed at nPart=$p")
      assert(
        got.df.exceptAll(base.df).isEmpty && base.df.exceptAll(got.df).isEmpty,
        s"ranks changed at nPart=$p"
      )
      // the offset fold must stay an array lookup — no plan-shape change
      val windows = got.df.queryExecution.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
      }
      assert(windows.isEmpty, s"nPart=$p introduced a window")
    }
    val ps8 = DistributedRank.prefixSumExclusive(df, order, col("v") + 1, "ps", nPart = 8)
    for (p <- Seq(32, 256, 0)) {
      val got = DistributedRank.prefixSumExclusive(df, order, col("v") + 1, "ps", nPart = p)
      assert(
        got.df.exceptAll(ps8.df).isEmpty && ps8.df.exceptAll(got.df).isEmpty,
        s"prefix sums changed at nPart=$p"
      )
    }
  }

  test("prefixSumExclusive: NULL values contribute 0, all-NULL partitions don't NPE") {
    import spark.implicits._
    val df = Seq[(Long, java.lang.Long)]((1L, null), (2L, 10L), (3L, null), (4L, 5L))
      .toDF("id", "v")
    val got = DistributedRank
      .prefixSumExclusive(df, Seq(col("id")), col("v"), "ps", nPart = 4)
    val rows = got.df.orderBy("id").select("ps").collect().map(_.getLong(0)).toSeq
    assert(rows == Seq(0L, 0L, 10L, 10L))
    // every partition all-NULL: the driver-side offset pass must not NPE
    val allNull = Seq[(Long, java.lang.Long)]((1L, null), (2L, null)).toDF("id", "v")
    val r2 = DistributedRank.prefixSumExclusive(allNull, Seq(col("id")), col("v"), "ps", nPart = 2)
    assert(r2.df.select(sum("ps")).head().getLong(0) == 0L)
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
