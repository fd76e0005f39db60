package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** Pins the change-data feed (changesFeed): replaying the O(changes)
  * event stream onto the old version reproduces the new one exactly,
  * each single-version window agrees with the reference full diff
  * (changes()), logical no-ops contribute nothing, and a restore in
  * the window fails loudly.
  */
class ChangeFeedSpec extends AnyFunSuite with SparkSpec {

  private def freshDir() = graft.queries.Similarity.freshIndexDir("cdf_spec")

  test("feed replay reproduces the head; windows agree with the reference diff") {
    val s = spark
    import s.implicits._
    val dir = freshDir()
    val base = (0L until 80L)
      .map(i => (i, s"doc$i", if (i % 2 == 0) "even" else "odd"))
      .toDF("id", "body", "par")
    TableVersions.commitAppend(base.repartitionByRange(4, col("id")), dir) // v0
    TableVersions.commitAppend(
      (100L until 120L).map(i => (i, s"doc$i", "late")).toDF("id", "body", "par"),
      dir
    ) // v1
    TableVersions.commitDelete(spark, dir, "id % 10 = 3") // v2
    TableVersions.commitUpdate(spark, dir, "id < 15", _.withColumn("body", lit("upd"))) // v3
    TableVersions.commitMerge(
      Seq((110L, "merged", "late"), (500L, "new", "brand")).toDF("id", "body", "par"),
      dir,
      "id"
    ) // v4
    TableVersions.commitDeleteMor(spark, dir, "id % 9 = 4") // v5
    val v6 = TableVersions.optimize(spark, dir, smallBytes = 1L << 30, targetBytes = 1L << 30)
    assert(v6 == 6L)

    // 1) replay (0, 6] onto v0 == readVersion(6)
    val events = TableVersions
      .changesFeed(spark, dir, 0L, 6L)
      .collect()
      .groupBy(_.getAs[Long]("_commit_version"))
    var state = TableVersions
      .readVersion(spark, dir, 0L)
      .collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2)))
      .toMap
    events.keys.toSeq.sorted.foreach { w =>
      val evs = events(w)
      val deleted = evs
        .filter(e => Set("delete", "update_preimage")(e.getAs[String]("_change_type")))
        .map(_.getAs[Long]("id"))
      state = state -- deleted
      evs
        .filter(e => Set("insert", "update_postimage")(e.getAs[String]("_change_type")))
        .foreach(e =>
          state += e.getAs[Long]("id") -> (e.getAs[String]("body"), e.getAs[String]("par"))
        )
    }
    val head = TableVersions
      .readVersion(spark, dir, 6L)
      .collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2)))
      .toMap
    assert(state == head, "feed replay diverged from the head")

    // 2) single-version windows agree with the reference diff
    Seq(2L, 3L, 4L, 5L).foreach { w =>
      val ref = TableVersions
        .changes(spark, dir, "id", w - 1, w)
        .collect()
        .map(r => (r.getLong(0), r.getString(1)))
        .toSet
      val feed = TableVersions.changesFeed(spark, dir, w - 1, w).collect()
      val feedTyped = feed.map(e => (e.getAs[Long]("id"), e.getAs[String]("_change_type")))
      val got: Set[(Long, String)] =
        feedTyped.collect { case (id, "delete") => (id, "delete") }.toSet ++
          feedTyped.collect { case (id, "insert") => (id, "insert") }.toSet ++
          feedTyped.collect { case (id, "update_postimage") => (id, "update") }.toSet
      assert(got == ref, s"feed window ($w) disagrees with changes(): $got vs $ref")
    }

    // 3) the optimize version contributes no events
    assert(!events.contains(6L))

    // 4) a restore in the window is refused
    TableVersions.restore(spark, dir, 2L) // v7
    intercept[IllegalArgumentException] {
      TableVersions.changesFeed(spark, dir, 0L, 7L).collect()
    }
    // windows strictly before the restore still work
    assert(TableVersions.changesFeed(spark, dir, 0L, 6L).count() > 0)
  }

  test("vacuum prunes feed segments below the horizon; stale windows fail loudly") {
    val s = spark
    import s.implicits._
    val dir = freshDir()
    val base = (0L until 60L).map(i => (i, s"doc$i", "p")).toDF("id", "body", "par")
    TableVersions.commitAppend(base.repartitionByRange(3, col("id")), dir) // v0
    TableVersions.commitDelete(spark, dir, "id % 10 = 3") // v1 (writes _cdf/v1)
    TableVersions.commitUpdate(spark, dir, "id < 5", _.withColumn("body", lit("u"))) // v2
    TableVersions.commitDelete(spark, dir, "id % 10 = 7") // v3
    val cdf = new java.io.File(s"$dir/_cdf")
    assert(cdf.list().toSet == Set("v1", "v2", "v3"))
    TableVersions.vacuum(spark, dir, 2L)
    // segments at or below the horizon are gone; newer ones retained
    assert(cdf.list().toSet == Set("v3"))
    // a window anchored below the horizon fails loudly — a missing
    // segment must never read as a no-op commit
    val ex = intercept[IllegalArgumentException] {
      TableVersions.changesFeed(spark, dir, 0L, 3L)
    }
    assert(ex.getMessage.contains("horizon"))
    // windows anchored at the horizon still serve
    val events = TableVersions.changesFeed(spark, dir, 2L, 3L).collect()
    assert(events.length == 6 && events.forall(_.getAs[String]("_change_type") == "delete"))
  }
}
