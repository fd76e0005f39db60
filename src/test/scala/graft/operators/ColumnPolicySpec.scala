package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** Pins the policy-layer contracts the q290 oracle can't see: a typo'd
  * mask target refuses loudly (a policy that silently protects nothing
  * is the failure mode the layer exists to prevent), the hash mask is
  * a JOINABLE pseudonym, last4 keeps the classic shape, and row
  * filters compose with masks.
  */
class ColumnPolicySpec extends AnyFunSuite with SparkSpec {

  private def fresh(tag: String) = graft.queries.Similarity.freshIndexDir(tag)

  test("masks rewrite in place, filters compose, unknown targets refuse") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "alice@example.com", "4111111111112345", 1234L),
      (2L, "bob@example.com", "5500000000009876", 77L),
      (3L, "alice@example.com", "4111111111112345", 250L)
    ).toDF("id", "email", "card", "amount")
    val dir = fresh("pol_spec")
    ColumnPolicy.register(
      spark,
      dir,
      Seq(
        ColumnPolicy.Policy("hash", "email", "analyst", ""),
        ColumnPolicy.Policy("last4", "card", "analyst", ""),
        ColumnPolicy.Policy("zero_bucket", "amount", "analyst", "100"),
        ColumnPolicy.Policy("row_filter", "", "analyst", "id <> 2")
      )
    )
    val v = ColumnPolicy.apply(spark, dir, df, "analyst")
    assert(v.columns.toSeq == df.columns.toSeq, "schema shape must not change")
    val rows = v.orderBy("id").collect()
    assert(rows.length == 2, "row filter must apply")
    // joinable pseudonym: equal plaintexts map to the equal mask
    assert(rows(0).getString(1) == rows(1).getString(1))
    assert(rows(0).getString(1) != "alice@example.com")
    assert(rows(0).getString(2) == "****2345")
    assert(rows(0).getLong(3) == 1200L && rows(1).getLong(3) == 200L)
    // unknown target refuses loudly
    ColumnPolicy.register(
      spark,
      dir,
      Seq(ColumnPolicy.Policy("hash", "no_such_col", "analyst", ""))
    )
    intercept[IllegalArgumentException] {
      ColumnPolicy.apply(spark, dir, df, "analyst")
    }
    // a role with no policies reads everything
    ColumnPolicy.register(spark, dir, Seq(ColumnPolicy.Policy("hash", "email", "other", "")))
    assert(ColumnPolicy.apply(spark, dir, df, "admin").collect().toSet == df.collect().toSet)
  }
}
