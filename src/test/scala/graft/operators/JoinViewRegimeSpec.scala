package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** Regression: under the forced co-partitioned-SMJ delta regime
  * (broadcastMaxRows = 0), a sync window combining a fact delete with
  * a dimension payload update must net the delete×update overlap to
  * zero. Before the deltas were materialized once, the un-pinned
  * two-join + union + aggregate subtree re-evaluated inside
  * commitMerge's composite plans could emit the +1/−1 pair for one
  * content key UN-netted, resurrecting deleted rows under the updated
  * payload (and the broadcast regime masked it). Renamed from the
  * investigation's debug spec; StreamJoinViewSpec pins the regimes
  * drain bit-equal end to end.
  */
class JoinViewRegimeSpec extends AnyFunSuite with SparkSpec {
  private def fresh(tag: String) = graft.queries.Similarity.freshIndexDir(tag)

  test("SMJ regime nets a delete x dimension-update overlap exactly") {
    val s = spark
    import s.implicits._
    val (a, b, view) = (fresh("jvr_a"), fresh("jvr_b"), fresh("jvr_view"))
    TableVersions.commitAppend(
      (0L until 40L).map(i => (i, s"g${i % 3}", i * 10)).toDF("id", "g", "x"),
      a
    )
    TableVersions.commitAppend(
      Seq(("g0", 100L), ("g1", 101L), ("g2", 102L)).toDF("g", "w"),
      b
    )
    JoinView.init(s, a, b, view, "g", Seq("id", "x"), Seq("w"))
    TableVersions.commitDelete(s, a, "id % 4 = 1")
    TableVersions.commitUpdate(s, b, "g = 'g0'", _.withColumn("w", col("w") + 7))
    JoinView.sync(s, a, b, view, "g", Seq("id", "x"), Seq("w"), broadcastMaxRows = 0L)
    val got = JoinView
      .read(s, view)
      .select("g", "id", "x", "w", "mult")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    val want = (0L until 40L)
      .filter(_ % 4 != 1)
      .map(i => (s"g${i % 3}", i, i * 10, 100L + i % 3 + (if (i % 3 == 0) 7L else 0L), 1L))
      .toSet
    assert(got == want, s"missing=${want -- got}\nextra=${got -- want}")
  }
}
