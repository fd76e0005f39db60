package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** Pins column mapping (q323): rename/drop are metadata-only, every
  * rewrite path (CoW delete/update, MOR delete, MERGE) survives a
  * rename untouched, time travel resolves the map as of the version
  * read, and the write adapter refuses the silent-collision shapes.
  */
class ColumnMappingSpec extends AnyFunSuite with SparkSpec {

  private def freshDir(tag: String) = graft.queries.Similarity.freshIndexDir(tag)

  private def fixture() = {
    val s = spark
    import s.implicits._
    (0L until 60L)
      .map(i => (i, s"b$i", i * 10))
      .toDF("id", "body", "score")
  }

  test("every rewrite path survives a rename: logical reads equal the unrenamed twin") {
    // twin A: no mapping; twin B: score renamed to points before the rewrites
    val a = freshDir("cm_a")
    val b = freshDir("cm_b")
    Seq(a, b).foreach(d => TableVersions.commitAppend(fixture().repartition(3), d))
    TableVersions.renameColumn(spark, b, "score", "points")
    for (d <- Seq(a, b)) {
      TableVersions.commitUpdate(spark, d, "id % 4 = 1", _.withColumn("score", col("score") + 5))
      TableVersions.commitDelete(spark, d, "id % 10 = 0")
      TableVersions.commitDeleteMor(spark, d, "id % 7 = 3")
      TableVersions.commitMerge(
        fixture().filter(col("id") < 5).withColumn("body", lit("merged")),
        d,
        "id"
      ): Unit
    }
    val wantA = TableVersions
      .readVersion(spark, a, TableVersions.currentVersion(spark, a))
      .collect()
      .map(_.toSeq)
      .toSet
    val gotB = TableVersions.readVersionLogical(spark, b, TableVersions.currentVersion(spark, b))
    assert(gotB.columns.toSeq == Seq("id", "body", "points"), "rename must hold through rewrites")
    assert(gotB.collect().map(_.toSeq).toSet == wantA, "rewrites must not disturb the mapping")
  }

  test("time travel resolves the map as of the version read") {
    val d = freshDir("cm_tt")
    TableVersions.commitAppend(fixture(), d) // v0
    TableVersions.renameColumn(spark, d, "score", "points") // v1
    TableVersions.commitDelete(spark, d, "id % 2 = 0") // v2
    TableVersions.renameColumn(spark, d, "body", "text") // v3
    assert(TableVersions.readVersionLogical(spark, d, 0L).columns.toSeq == Seq("id", "body", "score"))
    assert(TableVersions.readVersionLogical(spark, d, 2L).columns.toSeq == Seq("id", "body", "points"))
    assert(TableVersions.readVersionLogical(spark, d, 3L).columns.toSeq == Seq("id", "text", "points"))
    // values ride along: v2's rows under v2-era names
    assert(
      TableVersions.readVersionLogical(spark, d, 2L).filter(col("points") % 20 === 0).count() ==
        TableVersions.readVersion(spark, d, 2L).filter(col("score") % 20 === 0).count()
    )
  }

  test("drop hides from its era on; history below still serves; physical slot protected") {
    val d = freshDir("cm_drop")
    TableVersions.commitAppend(fixture(), d) // v0
    TableVersions.dropColumn(spark, d, "body") // v1
    assert(TableVersions.readVersionLogical(spark, d, 0L).columns.contains("body"))
    assert(!TableVersions.readVersionLogical(spark, d, 1L).columns.contains("body"))
    // the write adapter refuses a frame addressing the dropped slot
    val bad = fixture()
    intercept[IllegalArgumentException] {
      TableVersions.toPhysical(spark, d, bad)
    }
    // and accepts the live shape
    val ok = TableVersions.toPhysical(spark, d, fixture().drop("body"))
    assert(ok.columns.toSeq == Seq("id", "score"))
  }

  test("toPhysical translates logical writes; refusals on renamed physical slots") {
    val d = freshDir("cm_phys")
    TableVersions.commitAppend(fixture(), d) // v0
    TableVersions.renameColumn(spark, d, "score", "points") // v1
    val s = spark
    import s.implicits._
    val logicalBatch = Seq((100L, "new", 999L)).toDF("id", "body", "points")
    TableVersions.commitAppend(TableVersions.toPhysical(spark, d, logicalBatch), d) // v2
    val head = TableVersions.readVersionLogical(spark, d, 2L)
    assert(head.filter(col("id") === 100L).select("points").head().getLong(0) == 999L)
    // a frame still using the OLD name addresses a mapped physical slot
    intercept[IllegalArgumentException] {
      TableVersions.toPhysical(spark, d, Seq((101L, "x", 1L)).toDF("id", "body", "score"))
    }
    // rename refusals: unknown source, collision with a live name
    intercept[IllegalArgumentException] {
      TableVersions.renameColumn(spark, d, "nope", "x")
    }
    intercept[IllegalArgumentException] {
      TableVersions.renameColumn(spark, d, "points", "body")
    }
  }
}
