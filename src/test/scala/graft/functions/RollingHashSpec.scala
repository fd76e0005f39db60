package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkSpec, Tables}

class RollingHashSpec extends AnyFunSuite with SparkSpec {

  private val hof =
    """aggregate(
         transform(split(s, ''), c -> cast(ascii(c) AS bigint)),
         cast(0 AS bigint),
         (acc, c) -> pmod(acc * 31 + c, 1000000007))"""

  test("rolling_hash is bit-identical to the HOF formulation on the corpus") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(col("text").as("s"))
    val mismatches = docs
      .select(expr("rolling_hash(s)").as("native"), expr(hof).as("ref"))
      .filter(col("native") =!= col("ref"))
      .count()
    assert(mismatches == 0)
  }

  test("rolling_hash matches HOF on edge cases: empty, unicode, surrogate pairs") {
    val sess = spark
    import sess.implicits._
    val cases = Seq("", "a", "hello world", "héllo", "日本語テキスト", "emoji 😀 pair", "\n\t ")
    val rows = cases
      .toDF("s")
      .select(col("s"), expr("rolling_hash(s)").as("native"), expr(hof).as("ref"))
      .collect()
    rows.foreach(r => assert(r.getLong(1) == r.getLong(2), s"mismatch for '${r.getString(0)}'"))
  }

  test("rolling_hash is order-sensitive and null-propagating") {
    val sess = spark
    import sess.implicits._
    val df = Seq(("ab", "ba"), (null, "x")).toDF("a", "b")
    val r = df.select(expr("rolling_hash(a)"), expr("rolling_hash(b)")).collect()
    assert(r(0).getLong(0) != r(0).getLong(1)) // "ab" != "ba"
    assert(r(1).isNullAt(0))
  }
}
