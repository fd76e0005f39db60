package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** Pins what q229's oracle cannot see: exact agreement with the
  * un-rewritten WindowExec plan on the same session (kill-switch A/B,
  * including null order values and a null partition key), the plan
  * shape (heap operators present, no Window operator, the exchange
  * elided when the child is already hash-partitioned on the keys),
  * rank-bound spellings, and every guard rail — rank()/dense_rank(),
  * multi-expression windows, global top-k, and non-rank filters all
  * keep their Window plan.
  */
class TopKRewriteSpec extends AnyFunSuite with SparkSpec {

  private def fired(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.exists(_.isInstanceOf[TopKPerKey])

  private def execString(df: DataFrame): String = {
    df.collect(): Unit // force AQE to finalize
    // the adaptive plan prints final + initial sections; count the final only
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
  }

  /** 400 rows over 7 keys plus a null key and null order values; ids
    * make the (v desc, id asc) ordering total. */
  private def fixture(): DataFrame = {
    val s = spark
    import s.implicits._
    (0 until 400)
      .map { i =>
        val k: java.lang.Long = if (i % 8 == 7) null else (i % 8).toLong
        val v: java.lang.Double = if (i % 13 == 0) null else (i * 37 % 101).toDouble
        (i.toLong, k, v)
      }
      .toDF("id", "k", "v")
  }

  private def topk(df: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("k").orderBy(col("v").desc, col("id").asc)
    df.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
  }

  private def withRewrite[A](on: Boolean)(body: => A): A = {
    val prev = spark.conf.getOption(TopKRewrite.ConfKey)
    spark.conf.set(TopKRewrite.ConfKey, on.toString)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(TopKRewrite.ConfKey, v)
      case None    => spark.conf.unset(TopKRewrite.ConfKey)
    }
  }

  test("rewrite matches the WindowExec plan bit-for-bit (nulls included)") {
    val df = fixture()
    for (k <- Seq(1, 3, 100)) {
      val (heap, window) = (
        withRewrite(on = true) {
          assert(fired(topk(df, k)), s"k=$k did not rewrite")
          topk(df, k).collect().toSet
        },
        withRewrite(on = false) {
          assert(!fired(topk(df, k)), s"kill-switch ignored at k=$k")
          topk(df, k).collect().toSet
        }
      )
      assert(heap == window, s"k=$k mismatch")
    }
  }

  test("plan shape: heap operators, no Window operator, one exchange") {
    val plan = execString(topk(fixture(), 3))
    assert(plan.contains("FinalTopK") && plan.contains("PartialTopK"), plan)
    assert(!plan.contains("Window ["), plan)
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1, plan)
  }

  test("exchange elided when the child is already partitioned on the keys") {
    val plan = execString(topk(fixture().repartition(col("k")), 3))
    assert(plan.contains("FinalTopK"), plan)
    // the only shuffle is the explicit repartition itself
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1, plan)
  }

  test("rank-bound spellings: rk < 4 == rk <= 3; rk = 1 is the per-key argmax") {
    val df = fixture()
    val w = Window.partitionBy("k").orderBy(col("v").desc, col("id").asc)
    val lt = df.withColumn("rk", row_number().over(w)).filter(col("rk") < 4)
    assert(fired(lt) && lt.collect().toSet == topk(df, 3).collect().toSet)
    val eq = df.withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
    assert(fired(eq))
    val rows = eq.collect()
    assert(rows.length == 8 && rows.forall(_.getInt(3) == 1)) // 7 keys + null key
  }

  test("the widening-cast spelling (row_number().cast(long) <= 3L) rewrites too") {
    val df = fixture()
    val w = Window.partitionBy("k").orderBy(col("v").desc, col("id").asc)
    val cast = df
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 3L)
    assert(fired(cast))
    val plain = topk(df, 3).withColumn("rk", col("rk").cast("long"))
    assert(cast.collect().toSet == plain.collect().toSet)
  }

  test("k past the group size emits whole groups with dense ranks") {
    val df = fixture().filter(col("k") === 2) // 50 rows, one key
    val out = topk(df, 100).collect()
    assert(out.length == 50)
    assert(out.map(_.getInt(3)).sorted.toSeq == (1 to 50))
  }

  test("guard rails: rank()/multi-expr/global/non-rank filters keep their Window") {
    val df = fixture()
    val w = Window.partitionBy("k").orderBy(col("v").desc, col("id").asc)
    val byRank = df.withColumn("rk", rank().over(w)).filter(col("rk") <= 3)
    assert(!fired(byRank))
    val multi = df
      .withColumn("rk", row_number().over(w))
      .withColumn("s", sum("v").over(w))
      .filter(col("rk") <= 3)
    assert(!fired(multi))
    val global = df
      .withColumn("rk", row_number().over(Window.orderBy(col("v").desc, col("id").asc)))
      .filter(col("rk") <= 3)
    assert(!fired(global))
    val foreign = df.withColumn("rk", row_number().over(w)).filter(col("v") > 50)
    assert(!fired(foreign))
    // values still right when the rewrite refuses
    assert(byRank.count() >= 24)
  }
}
