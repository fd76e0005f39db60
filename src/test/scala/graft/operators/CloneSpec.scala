package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** Pins the shallow-clone invariants q201's oracle cannot see: the
  * clone references, never copies; clone commits never touch source
  * bytes; clone vacuum cannot destroy foreign files; init-over-existing
  * and sub-horizon clones are refused.
  */
class CloneSpec extends AnyFunSuite with SparkSpec {

  private def freshDir() = graft.queries.Similarity.freshIndexDir("clone_spec")

  private def fixture() = {
    val s = spark
    import s.implicits._
    (0L until 80L)
      .map(i => (i, s"doc$i", if (i % 2 == 0) "even" else "odd"))
      .toDF("id", "body", "par")
  }

  test("clone is zero-copy; clone commits leave the source untouched") {
    val src = freshDir()
    val dst = freshDir()
    TableVersions.commitAppend(fixture().repartitionByRange(4, col("id")), src)
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    def srcFiles() =
      fs.listStatus(new org.apache.hadoop.fs.Path(s"$src/data/b0"))
        .filter(_.getPath.getName.endsWith(".parquet"))
        .map(f => f.getPath.getName -> (f.getLen, f.getModificationTime))
        .toMap

    val before = srcFiles()
    TableVersions.cloneShallow(spark, src, dst, 0L)
    // zero-copy: the clone has NO data directory of its own yet
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dst/data")))
    assert(
      TableVersions.readVersion(spark, dst, 0L).orderBy("id").collect().toSeq ==
        TableVersions.readVersion(spark, src, 0L).orderBy("id").collect().toSeq
    )

    // a destructive commit on the CLONE
    TableVersions.commitDelete(spark, dst, "par = 'odd'")
    assert(TableVersions.readVersion(spark, dst, 1L).count() == 40)
    // source bytes and content untouched
    assert(srcFiles() == before, "clone commit modified source files")
    assert(TableVersions.readVersion(spark, src, 0L).count() == 80)
    // and the clone's rewrite landed under the CLONE's directory
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$dst/data/b1")))
  }

  test("clone vacuum un-references foreign files but never deletes them") {
    val src = freshDir()
    val dst = freshDir()
    TableVersions.commitAppend(fixture().repartitionByRange(4, col("id")), src)
    TableVersions.cloneShallow(spark, src, dst, 0L)
    // v1 rewrites two shared files; survivors 30-39 land under the clone
    TableVersions.commitDelete(spark, dst, "id < 30")
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val doomed = TableVersions.vacuum(spark, dst, keepFrom = 1L)
    // nothing under the source's directory may ever be deleted by the
    // clone's vacuum — the un-referenced foreign files are skipped
    assert(doomed.isEmpty, s"clone vacuum deleted foreign files: $doomed")
    assert(TableVersions.readVersion(spark, src, 0L).count() == 80, "source lost data")
    assert(TableVersions.readVersion(spark, dst, 1L).count() == 50)
    // the clone's OWN dead files are still reclaimed by a later vacuum:
    // v2 rewrites the clone-owned b1 file (rows 20-39) away
    TableVersions.commitDelete(spark, dst, "id < 40")
    assert(TableVersions.readVersion(spark, dst, 2L).count() == 40)
    val doomed2 = TableVersions.vacuum(spark, dst, keepFrom = 2L)
    assert(doomed2.nonEmpty && doomed2.forall(_.contains(dst)), s"expected clone-owned files, got $doomed2")
    doomed2.foreach(f => assert(!fs.exists(new org.apache.hadoop.fs.Path(f))))
  }

  test("clone refuses an initialized destination and a vacuumed source version") {
    val src = freshDir()
    TableVersions.commitAppend(fixture(), src)
    TableVersions.commitDelete(spark, src, "id < 10")
    TableVersions.vacuum(spark, src, keepFrom = 1L)
    val dst = freshDir()
    val ex = intercept[IllegalArgumentException](
      TableVersions.cloneShallow(spark, src, dst, 0L)
    )
    assert(ex.getMessage.contains("vacuumed"))
    TableVersions.cloneShallow(spark, src, dst, 1L)
    val ex2 = intercept[IllegalArgumentException](
      TableVersions.cloneShallow(spark, src, dst, 1L)
    )
    assert(ex2.getMessage.contains("already initialized"))
  }
}
