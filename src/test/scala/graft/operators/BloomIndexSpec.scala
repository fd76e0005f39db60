package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** Pins the bloom file-skipping invariants q196's oracle cannot see:
  * files are PHYSICALLY skipped, absence falls back to full reads,
  * all-NULL files skip correctly, refresh is incremental, and a
  * parameter mismatch is refused instead of silently mixing hash
  * families.
  */
class BloomIndexSpec extends AnyFunSuite with SparkSpec {

  private def freshDir() = graft.queries.Similarity.freshIndexDir("bloom_spec")

  private def fixture() = {
    val s = spark
    import s.implicits._
    (0L until 120L)
      .map(i => (i, s"src${i % 6}", s"body$i"))
      .toDF("id", "source", "body")
  }

  test("point lookup skips files, equals the plain filter, and probes never false-negative") {
    val dir = freshDir()
    TableVersions.commitAppend(fixture().repartition(6, col("source")), dir)
    val full = TableVersions.readVersion(spark, dir, 0L)
    val nFiles = full.inputFiles.length
    assert(nFiles >= 3, s"fixture produced only $nFiles files")
    assert(TableVersions.refreshBloom(spark, dir, Seq("source")) == nFiles.toLong)
    // every distinct value must come back complete (no false negatives)
    (0 until 6).foreach { k =>
      val v = s"src$k"
      val pruned = TableVersions.readVersionPoint(spark, dir, 0L, "source", v)
      val expected = full.filter(col("source") === v).orderBy("id").collect().toSeq
      assert(pruned.orderBy("id").collect().toSeq == expected, s"rows lost for $v")
      assert(
        pruned.inputFiles.length < nFiles,
        s"no file skipped for $v (${pruned.inputFiles.length} of $nFiles)"
      )
    }
    // a value in no file prunes to the empty schema-preserving read
    val none = TableVersions.readVersionPoint(spark, dir, 0L, "source", "absent")
    assert(none.count() == 0 && none.columns.toSeq == Seq("id", "source", "body"))
  }

  test("unindexed files are always read; refresh is incremental; all-NULL files skip") {
    val dir = freshDir()
    val s = spark
    import s.implicits._
    TableVersions.commitAppend(fixture().repartition(6, col("source")), dir)
    TableVersions.refreshBloom(spark, dir, Seq("source"))
    assert(TableVersions.refreshBloom(spark, dir, Seq("source")) == 0L, "rerun not incremental")

    // a late append without a bloom refresh must still be READ
    TableVersions.commitAppend(Seq((999L, "srcLate", "late")).toDF("id", "source", "body"), dir)
    val hit = TableVersions.readVersionPoint(spark, dir, 1L, "source", "srcLate")
    assert(hit.collect().map(_.getLong(0)).toSeq == Seq(999L))

    // an all-NULL column file gets the marker and ZERO bits → skipped
    val dir2 = freshDir()
    TableVersions.commitAppend(
      Seq((1L, Option.empty[String]), (2L, Option.empty[String]))
        .toDF("id", "source")
        .coalesce(1),
      dir2
    )
    TableVersions.commitAppend(Seq((3L, Option("srcX"))).toDF("id", "source").coalesce(1), dir2)
    TableVersions.refreshBloom(spark, dir2, Seq("source"))
    val p = TableVersions.readVersionPoint(spark, dir2, 1L, "source", "srcX")
    assert(p.collect().map(_.getLong(0)).toSeq == Seq(3L))
    assert(p.inputFiles.length == 1, "all-NULL file was not skipped")
  }

  test("bloom parameters are pinned by the index meta; a mismatch is refused") {
    val dir = freshDir()
    TableVersions.commitAppend(fixture().coalesce(2), dir)
    TableVersions.refreshBloom(spark, dir, Seq("source"), bits = 512, hashes = 4)
    val ex = intercept[IllegalArgumentException](
      TableVersions.refreshBloom(spark, dir, Seq("source"), bits = 1024, hashes = 3)
    )
    assert(ex.getMessage.contains("bits=512"))
    // reads self-configure from the meta — no parameters to pass wrong
    val got = TableVersions
      .readVersionPoint(spark, dir, 0L, "source", "src3")
      .count()
    assert(got == 20L)
  }
}
