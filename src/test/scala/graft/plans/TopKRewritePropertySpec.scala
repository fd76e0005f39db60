package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, rng}
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** Property suite for the engine-wide window-top-k rewrite: ≥1000
  * generated (partition arity, order directions, null orderings, k,
  * bound spelling, tie/null density, key cardinality) combinations,
  * each executed rewrite-ON vs rewrite-OFF and compared bit-equal
  * after sorting. TopKRewriteSpec pins the shapes we thought of; this
  * closes the gap to the shapes 266 registered queries might contain.
  * The ordering is always made TOTAL with a unique id tiebreaker —
  * without it row_number over ties is legitimately nondeterministic
  * and no A/B comparison is meaningful. Cases are drawn from a FIXED
  * ScalaCheck seed so failures replay exactly.
  */
class TopKRewritePropertySpec extends AnyFunSuite with SparkSpec {

  private def fired(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.exists(_.isInstanceOf[TopKPerKey])

  private def withRewrite[A](on: Boolean)(body: => A): A = {
    val prev = spark.conf.getOption(TopKRewrite.ConfKey)
    spark.conf.set(TopKRewrite.ConfKey, on.toString)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(TopKRewrite.ConfKey, v)
      case None    => spark.conf.unset(TopKRewrite.ConfKey)
    }
  }

  /** Four fixtures spanning tie density × null density × key
    * cardinality, checkpointed once — cases only vary the query. */
  private lazy val fixtures: Vector[DataFrame] = {
    val s = spark
    import s.implicits._
    def mk(rows: Int, keys1: Int, keys2: Int, vMod: Int, nullEvery: Int) =
      (0 until rows)
        .map { i =>
          val k1: java.lang.Long =
            if (nullEvery > 0 && i % nullEvery == 3) null else (i % keys1).toLong
          val k2: java.lang.Long = (i % keys2).toLong
          val v: java.lang.Double =
            if (nullEvery > 0 && i % nullEvery == 0) null else (i * 31 % vMod).toDouble
          (i.toLong, k1, k2, v)
        }
        .toDF("id", "k1", "k2", "v")
        .localCheckpoint()
    Vector(
      mk(rows = 240, keys1 = 7, keys2 = 3, vMod = 97, nullEvery = 11), // mixed
      mk(rows = 240, keys1 = 5, keys2 = 2, vMod = 4, nullEvery = 7), // heavy ties
      mk(rows = 240, keys1 = 40, keys2 = 6, vMod = 211, nullEvery = 0), // many keys, no nulls
      mk(rows = 60, keys1 = 1, keys2 = 1, vMod = 3, nullEvery = 5) // one key, ties + nulls
    )
  }

  private case class Case(
      fixture: Int,
      partArity: Int, // 0 = global window (must NOT fire, must still match)
      orderOnV: Boolean, // order by v first (with direction/null spelling) or id only
      direction: Int, // 0-3: asc_nulls_first/asc_nulls_last/desc_nulls_first/desc_nulls_last
      k: Int,
      spelling: Int // 0: rk <= k, 1: rk < k+1, 2: rk === k (k==1 only), 3: cast long <= k
  )

  private val caseGen: Gen[Case] = for {
    f <- Gen.choose(0, 3)
    p <- Gen.frequency(1 -> 0, 5 -> 1, 3 -> 2)
    ov <- Gen.oneOf(true, false)
    d <- Gen.choose(0, 3)
    k <- Gen.choose(1, 12)
    sp <- Gen.choose(0, 3)
  } yield Case(f, p, ov, d, if (sp == 2) 1 else k, sp)

  private def run(c: Case): Unit = {
    val df = fixtures(c.fixture)
    val parts = Seq("k1", "k2").take(c.partArity).map(col)
    val vOrd = c.direction match {
      case 0 => col("v").asc_nulls_first
      case 1 => col("v").asc_nulls_last
      case 2 => col("v").desc_nulls_first
      case _ => col("v").desc_nulls_last
    }
    // the unique id tiebreaker makes the ordering total
    val order = if (c.orderOnV) Seq(vOrd, col("id").asc) else Seq(col("id").desc)
    val w =
      if (parts.isEmpty) Window.orderBy(order: _*)
      else Window.partitionBy(parts: _*).orderBy(order: _*)
    def q(): DataFrame = {
      val rn = row_number().over(w)
      c.spelling match {
        case 0 => df.withColumn("rk", rn).filter(col("rk") <= c.k)
        case 1 => df.withColumn("rk", rn).filter(col("rk") < c.k + 1)
        case 2 => df.withColumn("rk", rn).filter(col("rk") === c.k)
        case _ => df.withColumn("rk", rn.cast("long")).filter(col("rk") <= c.k.toLong)
      }
    }
    val (on, firedOn) = withRewrite(on = true) {
      val d = q(); (d.collect().toSeq.map(_.toSeq).sortBy(_.mkString("|")), fired(d))
    }
    val off = withRewrite(on = false) {
      val d = q()
      assert(!fired(d), s"kill-switch ignored: $c")
      d.collect().toSeq.map(_.toSeq).sortBy(_.mkString("|"))
    }
    if (c.partArity == 0)
      assert(!firedOn, s"global window must keep its Window operator: $c")
    else
      assert(firedOn, s"partitioned row_number bound must rewrite: $c")
    assert(on == off, s"rewrite-on != rewrite-off for $c\non=$on\noff=$off")
  }

  test("1000 generated window-top-k shapes: rewrite-on == rewrite-off bit-equal") {
    val n = 1000
    val params = Gen.Parameters.default
    var seed = rng.Seed(42L)
    var i = 0
    while (i < n) {
      val c = caseGen.pureApply(params, seed)
      withClue(s"case $i (seed $seed): ") { run(c) }
      seed = seed.next
      i += 1
    }
  }
}
