package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** Pins what q200's oracle cannot see about OPTIMIZE ZORDER: the
  * rewrite is a logical no-op (byte-equal content, empty CDC), and the
  * Morton layout actually buys MULTI-dimensional pruning — a
  * single-column sort serves only its own dimension.
  */
class ZorderSpec extends AnyFunSuite with SparkSpec {

  private def freshDir() = graft.queries.Similarity.freshIndexDir("zorder_spec")

  /** 64×64 grid: every (x, y) once, id unique. */
  private def grid() = {
    val s = spark
    import s.implicits._
    (0L until 4096L).map(i => (i, i % 64L, i / 64L)).toDF("id", "x", "y")
  }

  test("zorder commit is a logical no-op: byte-equal content, empty CDC, history intact") {
    val dir = freshDir()
    TableVersions.commitAppend(grid().repartition(8), dir)
    val before = TableVersions.readVersion(spark, dir, 0L).orderBy("id").collect().toSeq
    val v = TableVersions.optimizeZorder(spark, dir, Seq("x", "y"), nOut = 8)
    assert(v == 1L)
    val after = TableVersions.readVersion(spark, dir, 1L).orderBy("id").collect().toSeq
    assert(after == before)
    assert(TableVersions.changes(spark, dir, "id", 0L, 1L).isEmpty)
    // pre-zorder version still readable (files stay live in the log)
    assert(TableVersions.readVersion(spark, dir, 0L).count() == 4096)
  }

  test("zorder buys pruning on BOTH dimensions; a single-column sort only on its own") {
    // baseline: range-sorted by x only
    val xDir = freshDir()
    TableVersions.commitAppend(grid().repartitionByRange(8, col("x")), xDir)
    TableVersions.refreshStats(spark, xDir, Seq("x", "y"))
    val xOnlyX = TableVersions.readVersionPruned(spark, xDir, 0L, "x", 0d, 7d)
    val xOnlyY = TableVersions.readVersionPruned(spark, xDir, 0L, "y", 0d, 7d)
    assert(xOnlyX.inputFiles.length <= 2, "x-sorted layout should prune x ranges")
    assert(
      xOnlyY.inputFiles.length >= 7,
      "x-sorted layout cannot prune y ranges — every file spans all y"
    )

    // z-ordered: both dimensions prune
    val zDir = freshDir()
    TableVersions.commitAppend(grid().repartition(8), zDir)
    TableVersions.optimizeZorder(spark, zDir, Seq("x", "y"), nOut = 8)
    TableVersions.refreshStats(spark, zDir, Seq("x", "y"))
    val zX = TableVersions.readVersionPruned(spark, zDir, 1L, "x", 0d, 7d)
    val zY = TableVersions.readVersionPruned(spark, zDir, 1L, "y", 0d, 7d)
    // ≤ 5 not 4: repartitionByRange samples boundaries, so the exact
    // file split jitters by one under concurrent-suite timing
    assert(zX.inputFiles.length <= 5, s"zorder x-range read ${zX.inputFiles.length} of 8 files")
    assert(zY.inputFiles.length <= 5, s"zorder y-range read ${zY.inputFiles.length} of 8 files")
    // and rows are exactly the plain filters
    assert(zX.count() == 8 * 64)
    assert(zY.count() == 8 * 64)
    assert(zX.filter(col("x") > 7).count() == 0)
  }

  test("zorder handles NULLs and degenerate columns without losing rows") {
    val dir = freshDir()
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, Option(5L), 9L),
      (2L, Option.empty[Long], 3L),
      (3L, Option(7L), 3L)
    ).toDF("id", "x", "c")
    TableVersions.commitAppend(df, dir)
    // c is constant (hi == lo): scales to 0; x has a NULL: coalesces to lo
    TableVersions.optimizeZorder(spark, dir, Seq("x", "c"), nOut = 2)
    val out = TableVersions.readVersion(spark, dir, 1L).orderBy("id").collect().toSeq
    assert(out.map(_.getLong(0)) == Seq(1L, 2L, 3L))
    assert(out(1).isNullAt(1), "NULL x must survive the rewrite as NULL")
  }

  test("a STRING dimension clusters and prunes: point reads touch ≤ half the files") {
    val dir = freshDir()
    val s = spark
    import s.implicits._
    // 16 string keys × 256 rows, interleaved with a numeric dimension
    val df = (0L until 4096L)
      .map(i => (i, i % 64L, f"key${i % 16L}%02d"))
      .toDF("id", "x", "k")
    TableVersions.commitAppend(df.repartition(8), dir)
    TableVersions.optimizeZorder(spark, dir, Seq("x", "k"), nOut = 8)
    TableVersions.refreshStats(spark, dir, Seq("x"))
    TableVersions.refreshBloom(spark, dir, Seq("k"))
    // the string dimension prunes through the bloom index because the
    // curve clustered each key into few files
    val point = TableVersions.readVersionPoint(spark, dir, 1L, "k", "key03")
    assert(
      point.inputFiles.length <= 4,
      s"string point read touched ${point.inputFiles.length} of 8 files"
    )
    assert(point.count() == 256)
    // the numeric dimension still prunes alongside it
    val ranged = TableVersions.readVersionPruned(spark, dir, 1L, "x", 0d, 7d)
    assert(
      ranged.inputFiles.length <= 5,
      s"numeric range read touched ${ranged.inputFiles.length} of 8 files"
    )
    assert(ranged.count() == 512)
    // an all-NULL string column no longer NPEs and loses no rows
    val nullDir = freshDir()
    TableVersions.commitAppend(
      Seq((1L, 2L, Option.empty[String]), (2L, 3L, Option.empty[String]))
        .toDF("id", "x", "k"),
      nullDir
    )
    TableVersions.optimizeZorder(spark, nullDir, Seq("x", "k"), nOut = 2)
    assert(TableVersions.readVersion(spark, nullDir, 1L).count() == 2)
  }

  test("incremental zorder: each pass rewrites ≤ maxFiles as a logical no-op and progresses") {
    val dir = freshDir()
    TableVersions.commitAppend(grid().repartition(8), dir)
    val before = TableVersions.readVersion(spark, dir, 0L).orderBy("id").collect().toSeq
    val v1 = TableVersions.optimizeZorderIncremental(spark, dir, Seq("x", "y"), nOut = 2, maxFiles = 4)
    assert(v1 == 1L)
    // the commit removed exactly the bounded subset
    val removed1 = spark.read
      .parquet(s"$dir/_log")
      .filter(col("version") === 1 && col("action") === "remove")
      .count()
    assert(removed1 == 4, s"pass 1 rewrote $removed1 files, expected 4")
    // mid-sequence reads are byte-equal and CDC is empty
    assert(TableVersions.readVersion(spark, dir, 1L).orderBy("id").collect().toSeq == before)
    assert(TableVersions.changes(spark, dir, "id", 0L, 1L).isEmpty)
    // the second pass walks the REMAINING ingest files (they are the
    // smallest now that pass 1 packed its subset into 2 larger files)
    val v2 = TableVersions.optimizeZorderIncremental(spark, dir, Seq("x", "y"), nOut = 2, maxFiles = 4)
    assert(v2 == 2L)
    assert(TableVersions.readVersion(spark, dir, 2L).orderBy("id").collect().toSeq == before)
    assert(TableVersions.changes(spark, dir, "id", 0L, 2L).isEmpty)
    // after two passes every ingest file has been clustered away
    TableVersions.refreshStats(spark, dir, Seq("x", "y"))
    val pruned = TableVersions.readVersionPruned(spark, dir, 2L, "x", 0d, 7d)
    assert(pruned.count() == 8 * 64)
  }

  test("4-column interleave stays inside the bigint sign bit") {
    val dir = freshDir()
    val s = spark
    import s.implicits._
    // max scaled values in every dimension — under a 16-bit interleave
    // the top bit would land at position 63 and flip the sort's sign
    val df = (0L until 1024L).map(i => (i, i % 32L, i / 32L, i % 7L, i % 11L))
      .toDF("id", "a", "b", "c", "d")
    TableVersions.commitAppend(df.repartition(4), dir)
    TableVersions.optimizeZorder(spark, dir, Seq("a", "b", "c", "d"), nOut = 4)
    val out = TableVersions.readVersion(spark, dir, 1L)
    assert(out.count() == 1024)
    assert(out.orderBy("id").collect().map(_.getLong(0)).toSeq == (0L until 1024L))
    // the curve must still cluster: the top-of-range rows in every
    // dimension sort LAST, not first (the sign-flip failure mode)
    TableVersions.refreshStats(spark, dir, Seq("a"))
    val lowA = TableVersions.readVersionPruned(spark, dir, 1L, "a", 0d, 7d)
    assert(lowA.count() == 256)
  }
}
