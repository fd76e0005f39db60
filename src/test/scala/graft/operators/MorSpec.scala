package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** Pins the merge-on-read delete path (positional deletion vectors):
  * a DV commit touches NO data file, every read path applies the
  * vectors, time travel / restore / checkpoint keep their contracts,
  * and compactMor folds the vectors away without changing content.
  */
class MorSpec extends AnyFunSuite with SparkSpec {

  private def freshDir() = graft.queries.Similarity.freshIndexDir("mor_spec")

  private def fixture() = {
    val s = spark
    import s.implicits._
    (0L until 80L)
      .map(i => (i, s"doc$i", if (i % 2 == 0) "even" else "odd"))
      .toDF("id", "body", "par")
  }

  private def dataFiles(dir: String): Set[String] = {
    val d = new java.io.File(s"$dir/data")
    d.listFiles().flatMap(_.listFiles()).map(_.getName).toSet
  }

  test("DV delete writes no data file; reads, time travel, and CDC see it") {
    val dir = freshDir()
    TableVersions.commitAppend(fixture().repartitionByRange(4, col("id")), dir)
    val filesBefore = dataFiles(dir)
    val v = TableVersions.commitDeleteMor(spark, dir, "id % 10 = 3")
    assert(v == 1L)
    assert(dataFiles(dir) == filesBefore, "merge-on-read delete rewrote a data file")
    val head = TableVersions.readVersion(spark, dir, 1L)
    assert(head.count() == 72)
    assert(head.filter(col("id") % 10 === 3).count() == 0)
    // time travel below the DV sees the rows
    assert(TableVersions.readVersion(spark, dir, 0L).count() == 80)
    // CDC reports exactly the deletes
    val delta = TableVersions.changes(spark, dir, "id", 0L, 1L).collect()
    assert(delta.length == 8 && delta.forall(_.getString(1) == "delete"))
    // double delete: recorded no-op, content unchanged
    val v2 = TableVersions.commitDeleteMor(spark, dir, "id % 10 = 3")
    assert(v2 == 2L)
    assert(TableVersions.readVersion(spark, dir, 2L).count() == 72)
    assert(!new java.io.File(s"$dir/_dv/v2").exists(), "empty DV commit wrote a vector")
  }

  test("copy-on-write, merge, optimize, and zorder never resurrect DV-deleted rows") {
    val s = spark
    import s.implicits._
    val dir = freshDir()
    TableVersions.commitAppend(fixture().repartitionByRange(4, col("id")), dir)
    TableVersions.commitDeleteMor(spark, dir, "id < 10") // v1
    // copy-on-write delete on a DV-carrying table
    TableVersions.commitDelete(spark, dir, "id >= 70") // v2 rewrites the last file
    assert(TableVersions.readVersion(spark, dir, 2L).count() == 60)
    assert(TableVersions.readVersion(spark, dir, 2L).filter(col("id") < 10).count() == 0)
    // update must not see or copy deleted rows
    TableVersions.commitUpdate(spark, dir, "id < 15", _.withColumn("body", lit("upd"))) // v3
    val v3 = TableVersions.readVersion(spark, dir, 3L)
    assert(v3.count() == 60)
    assert(v3.filter(col("body") === "upd").count() == 5) // ids 10-14 only
    // merge against a DV-deleted key INSERTS (the row is gone)
    TableVersions.commitMerge(Seq((5L, "merged", "odd")).toDF("id", "body", "par"), dir, "id") // v4
    val v4 = TableVersions.readVersion(spark, dir, 4L)
    assert(v4.count() == 61)
    assert(v4.filter(col("id") === 5L).select("body").head().getString(0) == "merged")
    // optimize packs the small files without materializing deleted rows
    TableVersions.optimize(spark, dir, smallBytes = 1L << 30, targetBytes = 1L << 30)
    val head = TableVersions.currentVersion(spark, dir)
    assert(TableVersions.readVersion(spark, dir, head).count() == 61)
    assert(
      TableVersions.readVersion(spark, dir, head).filter(col("id") < 5).count() == 0,
      "optimize resurrected DV-deleted rows"
    )
  }

  test("compactMor folds vectors as a logical no-op; restore resurrects; checkpoint folds") {
    val dir = freshDir()
    TableVersions.commitAppend(fixture().repartitionByRange(4, col("id")), dir)
    TableVersions.commitDeleteMor(spark, dir, "id % 5 = 0") // v1: 16 rows
    val before = TableVersions.readVersion(spark, dir, 1L).orderBy("id").collect().toSeq
    // checkpoint ABOVE the DV: the fold must keep the deletes applied
    TableVersions.checkpoint(spark, dir)
    assert(
      TableVersions.readVersion(spark, dir, 1L).orderBy("id").collect().toSeq == before,
      "checkpoint dropped the folded deletion vectors"
    )
    // a second DV above the checkpoint stacks
    TableVersions.commitDeleteMor(spark, dir, "id % 5 = 1") // v2
    assert(TableVersions.readVersion(spark, dir, 2L).count() == 48)
    // compactMor: content identical, vectors no longer needed
    val v3 = TableVersions.compactMor(spark, dir)
    assert(v3 == 3L)
    val after = TableVersions.readVersion(spark, dir, 3L).orderBy("id").collect().toSeq
    assert(after == TableVersions.readVersion(spark, dir, 2L).orderBy("id").collect().toSeq)
    assert(TableVersions.changes(spark, dir, "id", 2L, 3L).isEmpty)
    // compacting again is a no-op (nothing applies)
    assert(TableVersions.compactMor(spark, dir) == 3L)
    // time travel below the compaction still sees each DV stage
    assert(TableVersions.readVersion(spark, dir, 1L).count() == 64)
    assert(TableVersions.readVersion(spark, dir, 0L).count() == 80)
    // restore to v0 resurrects everything (the DV anchors below the re-add)
    val v4 = TableVersions.restore(spark, dir, 0L)
    assert(TableVersions.readVersion(spark, dir, v4).count() == 80)
  }

  test("countAt is footer-exact at every version; history lists commits; vacuum folds dead DVs") {
    val dir = freshDir()
    TableVersions.commitAppend(fixture().repartitionByRange(4, col("id")), dir) // v0
    TableVersions.commitDeleteMor(spark, dir, "id % 5 = 0") // v1
    TableVersions.commitDelete(spark, dir, "id >= 70") // v2 copy-on-write
    (0L to 2L).foreach { v =>
      assert(
        TableVersions.countAt(spark, dir, v) == TableVersions.readVersion(spark, dir, v).count(),
        s"metadata count diverged at v$v"
      )
    }
    val hist = TableVersions.history(spark, dir).collect()
    assert(hist.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((0L, "init"), (1L, "mor_delete"), (2L, "delete")))
    assert(hist.filter(_.getLong(0) == 1L).head.getAs[Boolean]("has_dv"))
    assert(!hist.filter(_.getLong(0) == 0L).head.getAs[Boolean]("has_dv"))
    // vacuum to v2: the copy-on-write-removed file dies; its DV rows
    // fold away while the surviving files' vectors keep applying
    val dvRowsBefore = spark.read
      .option("recursiveFileLookup", "true")
      .parquet(s"$dir/_dv")
      .count()
    TableVersions.vacuum(spark, dir, 2L)
    val dvRowsAfter = spark.read
      .option("recursiveFileLookup", "true")
      .parquet(s"$dir/_dv")
      .count()
    assert(dvRowsAfter < dvRowsBefore, "vacuum folded no dead DV rows")
    val head = TableVersions.readVersion(spark, dir, 2L)
    assert(head.count() == 56) // 80 - 16 (id%5=0) - 8 (ids 70-79 minus the 2 already vector-deleted)
    assert(head.filter(col("id") % 5 === 0).count() == 0, "vacuum fold dropped a live vector")
    assert(TableVersions.countAt(spark, dir, 2L) == 56)
  }

  test("countAt answers from the log alone — correct with every data file gone") {
    val dir = freshDir()
    TableVersions.commitAppend(fixture().repartitionByRange(4, col("id")), dir) // v0
    TableVersions.commitDeleteMor(spark, dir, "id % 5 = 0") // v1
    TableVersions.commitDelete(spark, dir, "id >= 70") // v2
    TableVersions.checkpoint(spark, dir)
    val s2 = spark
    import s2.implicits._
    TableVersions.commitAppend(
      (200L until 210L).map(i => (i, s"doc$i", "late")).toDF("id", "body", "par"),
      dir
    ) // v3 — post-checkpoint tail
    val expected = (0L to 3L).map(v => TableVersions.readVersion(spark, dir, v).count())
    // hide ALL data files: the log carries every add's row count, so
    // the metadata count must not notice (no footer fallback fires)
    val data = new java.io.File(s"$dir/data")
    val hidden = new java.io.File(s"$dir/data_hidden")
    assert(data.renameTo(hidden), "test setup: rename failed")
    try (0L to 3L).foreach { v =>
      assert(
        TableVersions.countAt(spark, dir, v) == expected(v.toInt),
        s"countAt touched data files at v$v"
      )
    } finally assert(hidden.renameTo(data), "test teardown: rename-back failed")
  }

  test("countAt falls back to footers for logs written before counts existed") {
    val s2 = spark
    import s2.implicits._
    val dir = graft.queries.Similarity.freshIndexDir("mor_legacy")
    // hand-write a LEGACY v0: batch files plus a count-less log entry
    fixture().repartition(2).write.parquet(s"$dir/data/b0")
    val files = new java.io.File(s"$dir/data/b0")
      .listFiles()
      .filter(_.getName.endsWith(".parquet"))
      .map(f => "file:" + f.getAbsolutePath)
      .toSeq
    files
      .map(f => ("init", f, "add"))
      .toDF("op", "file", "action")
      .coalesce(1)
      .write
      .parquet(s"$dir/_log/version=0")
    assert(TableVersions.countAt(spark, dir, 0L) == 80L)
    // a NEW commit on the legacy table logs counts for its own adds
    TableVersions.commitAppend(
      (300L until 310L).map(i => (i, s"doc$i", "new")).toDF("id", "body", "par"),
      dir
    )
    assert(TableVersions.countAt(spark, dir, 1L) == 90L)
  }

  test("stats- and bloom-pruned reads apply the vectors") {
    val dir = freshDir()
    TableVersions.commitAppend(fixture().repartitionByRange(4, col("id")), dir)
    TableVersions.refreshStats(spark, dir, Seq("id"))
    TableVersions.refreshBloom(spark, dir, Seq("par"))
    TableVersions.commitDeleteMor(spark, dir, "id BETWEEN 20 AND 29")
    val pruned = TableVersions.readVersionPruned(spark, dir, 1L, "id", 15, 35)
    assert(pruned.count() == 11) // 15-19 and 30-35
    assert(pruned.filter(col("id").between(20, 29)).count() == 0)
    val point = TableVersions.readVersionPoint(spark, dir, 1L, "par", "even")
    assert(point.count() == 35) // 40 evens minus 5 deleted evens
  }
}
