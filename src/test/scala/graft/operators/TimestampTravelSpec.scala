package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** Pins the timestamp-travel invariants q326's oracle cannot see:
  * effective commit times are strictly increasing even when directory
  * mtimes tie, resolution picks the latest commit at-or-before the
  * probe, and a probe older than the table refuses loudly.
  */
class TimestampTravelSpec extends AnyFunSuite with SparkSpec {

  private def freshDir() = graft.queries.Similarity.freshIndexDir("tt_spec")

  private def fixture(lo: Long, hi: Long) = {
    val s = spark
    import s.implicits._
    (lo until hi).map(i => (i, s"doc$i")).toDF("id", "body")
  }

  test("versionAt resolves each era; readVersionAsOf equals readVersion") {
    val dir = freshDir()
    TableVersions.commitAppend(fixture(0, 10), dir) // v0
    Thread.sleep(5)
    val t0 = System.currentTimeMillis()
    Thread.sleep(5)
    TableVersions.commitAppend(fixture(10, 25), dir) // v1
    Thread.sleep(5)
    val t1 = System.currentTimeMillis()
    Thread.sleep(5)
    TableVersions.commitDelete(spark, dir, "id < 5") // v2

    assert(TableVersions.versionAt(spark, dir, t0) == 0L)
    assert(TableVersions.versionAt(spark, dir, t1) == 1L)
    assert(TableVersions.versionAt(spark, dir, System.currentTimeMillis()) == 2L)

    assert(TableVersions.readVersionAsOf(spark, dir, t0).count() == 10)
    assert(TableVersions.readVersionAsOf(spark, dir, t1).count() == 25)
    assert(
      TableVersions.readVersionAsOf(spark, dir, System.currentTimeMillis()).count() == 20
    )
  }

  test("effective commit times are strictly increasing even under mtime ties") {
    val dir = freshDir()
    // commits land as fast as the store allows — any mtime ties must
    // be broken by the monotonicizer, never surfaced
    (0 until 4).foreach(i => TableVersions.commitAppend(fixture(i * 3L, i * 3L + 3L), dir))
    val cts = TableVersions.commitTimestamps(spark, dir)
    assert(cts.map(_._1) == Seq(0L, 1L, 2L, 3L))
    assert(cts.sliding(2).forall { case Seq((_, a), (_, b)) => b > a; case _ => true })
    // resolution at each effective timestamp returns exactly that version
    cts.foreach { case (v, eff) => assert(TableVersions.versionAt(spark, dir, eff) == v) }
    // and one ms before a commit resolves to its predecessor
    cts.tail.zip(cts).foreach { case ((v, eff), (pv, _)) =>
      assert(TableVersions.versionAt(spark, dir, eff - 1) == pv, s"before v$v")
    }
  }

  test("a timestamp that predates the first commit refuses loudly") {
    val dir = freshDir()
    TableVersions.commitAppend(fixture(0, 5), dir)
    val first = TableVersions.commitTimestamps(spark, dir).head._2
    val e = intercept[IllegalArgumentException] {
      TableVersions.versionAt(spark, dir, first - 1)
    }
    assert(e.getMessage.contains("predates"))
  }
}
