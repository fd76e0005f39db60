package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** Pins what q232's oracle replay cannot isolate: pure-insert folds
  * equal the from-scratch sample exactly, erased members leave and the
  * group UNDER-FILLS (no biased refill from once-evicted rows),
  * re-inserted keys re-admit, payload updates refresh in place without
  * moving membership, and a second sync against an unmoved source is a
  * no-op (the atomic-cursor contract).
  */
class SampleViewSpec extends AnyFunSuite with SparkSpec {

  private def freshDir(tag: String) = graft.queries.Similarity.freshIndexDir(tag)

  private def rows(ids: Range) = {
    val s = spark
    import s.implicits._
    ids.map(i => (i.toLong, s"g${i % 3}", i * 10L)).toDF("id", "g", "x")
  }

  private def sampleSet(view: String, k: Int): Set[(String, String)] =
    SampleView
      .read(spark, view, k)
      .collect()
      .map(r => (r.getString(0), r.getString(2)))
      .toSet

  test("pure-insert folds land on exactly the from-scratch sample") {
    val (src, view, srcAll, viewAll) =
      (freshDir("sv_src"), freshDir("sv_view"), freshDir("sv_srcall"), freshDir("sv_viewall"))
    TableVersions.commitAppend(rows(0 until 120).repartition(3), src)
    SampleView.init(spark, src, view, "g", "id", "x", buf = 6)
    TableVersions.commitAppend(rows(120 until 300), src)
    TableVersions.commitAppend(rows(300 until 400), src)
    SampleView.sync(spark, src, view, "g", "id", "x", buf = 6)

    TableVersions.commitAppend(rows(0 until 400), srcAll)
    SampleView.init(spark, srcAll, viewAll, "g", "id", "x", buf = 6)
    assert(sampleSet(view, 6) == sampleSet(viewAll, 6))
    assert(sampleSet(view, 6).size == 18) // 3 groups × 6
  }

  test("erasure removes sampled members; the group under-fills, never refills") {
    val (src, view) = (freshDir("sv_src"), freshDir("sv_view"))
    TableVersions.commitAppend(rows(0 until 300).repartition(3), src)
    SampleView.init(spark, src, view, "g", "id", "x", buf = 4)
    val before = SampleView.read(spark, view, 4).filter(col("grp") === "g0")
    val victims = before.limit(2).collect().map(_.getString(2))
    assert(victims.length == 2)
    TableVersions.commitDelete(spark, src, s"id IN (${victims.mkString(", ")})")
    SampleView.sync(spark, src, view, "g", "id", "x", buf = 4)
    val after = SampleView.read(spark, view, 4).filter(col("grp") === "g0").collect()
    assert(after.length == 2, "erased slots must stay empty (under-fill)")
    assert(!after.exists(r => victims.contains(r.getString(2))))
    // other groups untouched
    assert(SampleView.read(spark, view, 4).filter(col("grp") =!= "g0").count() == 8)
  }

  test("a re-inserted key re-admits; an update refreshes payload in place") {
    val s = spark
    import s.implicits._
    val (src, view) = (freshDir("sv_src"), freshDir("sv_view"))
    TableVersions.commitAppend(rows(0 until 90).repartition(2), src)
    SampleView.init(spark, src, view, "g", "id", "x", buf = 5)
    val member = SampleView
      .read(spark, view, 5)
      .filter(col("grp") === "g1")
      .head()
      .getString(2)
      .toLong
    // erase, fold, re-insert the same key, fold again
    TableVersions.commitDelete(spark, src, s"id = $member")
    SampleView.sync(spark, src, view, "g", "id", "x", buf = 5)
    assert(!sampleSet(view, 5).contains(("g1", member.toString)))
    TableVersions.commitAppend(Seq((member, "g1", 777L)).toDF("id", "g", "x"), src)
    SampleView.sync(spark, src, view, "g", "id", "x", buf = 5)
    val back = SampleView
      .read(spark, view, 5)
      .filter(col("grp") === "g1" && col("key") === member.toString)
      .collect()
    assert(back.length == 1 && back(0).getLong(3) == 777L)
    // update via merge: payload refreshes, membership identical
    val pre = sampleSet(view, 5)
    TableVersions.commitMerge(
      Seq((member, "g1", 888L)).toDF("id", "g", "x"),
      src,
      "id"
    )
    SampleView.sync(spark, src, view, "g", "id", "x", buf = 5)
    assert(sampleSet(view, 5) == pre)
    val upd = SampleView
      .read(spark, view, 5)
      .filter(col("grp") === "g1" && col("key") === member.toString)
      .head()
    assert(upd.getLong(3) == 888L)
  }

  test("sync against an unmoved source is a no-op") {
    val (src, view) = (freshDir("sv_src"), freshDir("sv_view"))
    TableVersions.commitAppend(rows(0 until 60), src)
    SampleView.init(spark, src, view, "g", "id", "x", buf = 3)
    val v1 = TableVersions.currentVersion(spark, view)
    val c = SampleView.sync(spark, src, view, "g", "id", "x", buf = 3)
    assert(c == 0L)
    assert(TableVersions.currentVersion(spark, view) == v1, "no-op sync must not commit")
  }
}
