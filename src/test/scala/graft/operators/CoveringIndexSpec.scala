package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** Pins the covering-index contracts the q282 oracle can't see: a
  * sync crash between the segment publish and the cursor move replays
  * idempotently (latest-wins absorbs the duplicate segment), a
  * delete-then-reinsert key resolves to the reinserted row, an
  * interrupted compact swap resumes, and the lookup plan pushes the
  * probed keys into the segment scans.
  */
class CoveringIndexSpec extends AnyFunSuite with SparkSpec {

  private def fresh(tag: String) = graft.queries.Similarity.freshIndexDir(tag)

  private def table(n: Long): (String, String) = {
    val s = spark
    import s.implicits._
    val dir = fresh("ci_src")
    TableVersions.commitAppend(
      (0L until n).map(i => (i, s"g${i % 3}", i * 10)).toDF("k", "g", "v"),
      dir
    )
    dir -> fresh("ci_idx")
  }
  private val cols = Seq("g", "v")

  private def viewOf(idx: String): Set[(Long, String, Long)] =
    CoveringIndex
      .read(spark, idx, "k", cols)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSet

  test("a crashed sync leaves only staging trash; publish is atomic (segment carries its cursor)") {
    val s = spark
    import s.implicits._
    val (src, idx) = table(60)
    CoveringIndex.init(spark, src, idx, "k", cols)
    TableVersions.commitDelete(spark, src, "k % 5 = 0")
    TableVersions.commitAppend(Seq((500L, "gx", 7L)).toDF("k", "g", "v"), src)
    // simulate a publish that died mid-write: a partial staging dir —
    // never readable, never a cursor entry
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$idx/_staging/dead-attempt"))
    assert(CoveringIndex.cursor(spark, idx) == 0L, "staging trash must not advance the cursor")
    // the re-run sync picks the window up from the last PUBLISHED state
    assert(CoveringIndex.sync(spark, src, idx, "k", cols) == 2L)
    val want = viewOf(idx)
    assert(CoveringIndex.cursor(spark, idx) == 2L)
    // a sync with nothing new is a no-op: no segment, same view
    assert(CoveringIndex.sync(spark, src, idx, "k", cols) == 2L)
    assert(viewOf(idx) == want)
    val head = TableVersions
      .readVersion(spark, src, TableVersions.currentVersion(spark, src))
      .select("k", "g", "v")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(want == head, "index must equal the table head exactly")
  }

  test("delete-then-reinsert resolves to the reinserted row; updates to the post-image") {
    val s = spark
    import s.implicits._
    val (src, idx) = table(30)
    CoveringIndex.init(spark, src, idx, "k", cols)
    TableVersions.commitDelete(spark, src, "k = 7")
    TableVersions.commitAppend(Seq((7L, "reborn", 777L)).toDF("k", "g", "v"), src)
    TableVersions.commitUpdate(spark, src, "k = 8", _.withColumn("v", lit(888L)))
    CoveringIndex.sync(spark, src, idx, "k", cols)
    val view = viewOf(idx)
    assert(view.contains((7L, "reborn", 777L)), "reinserted key lost to the earlier delete")
    assert(view.contains((8L, "g2", 888L)), "update must resolve to the post-image")
    // and the index still equals the table head exactly
    val head = TableVersions
      .readVersion(spark, src, TableVersions.currentVersion(spark, src))
      .select("k", "g", "v")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(view == head)
  }

  test("non-unique keys refuse loudly at init and at sync") {
    val s = spark
    import s.implicits._
    // init: duplicate keys already in the table
    val dupDir = fresh("ci_dup_src")
    TableVersions.commitAppend(
      Seq((1L, "a", 1L), (1L, "b", 2L), (2L, "c", 3L)).toDF("k", "g", "v"),
      dupDir
    )
    intercept[IllegalArgumentException] {
      CoveringIndex.init(spark, dupDir, fresh("ci_dup_idx"), "k", cols)
    }
    // sync, cross-commit: an append landing on a key that was already
    // live BEFORE the window (the table now has two rows; latest-wins
    // would silently serve one) refuses via the liveness-seeded balance
    val (src, idx) = table(10)
    CoveringIndex.init(spark, src, idx, "k", cols)
    TableVersions.commitAppend(Seq((3L, "dup", 99L)).toDF("k", "g", "v"), src)
    intercept[IllegalArgumentException] {
      CoveringIndex.sync(spark, src, idx, "k", cols)
    }
    // sync, within-commit: two inserts of one NEW key in one commit
    // refuse through the same balance (prefix reaches 2 with seed 0)
    val (src2, idx2) = table(10)
    CoveringIndex.init(spark, src2, idx2, "k", cols)
    TableVersions.commitAppend(
      Seq((500L, "x", 1L), (500L, "y", 2L)).toDF("k", "g", "v"),
      src2
    )
    intercept[IllegalArgumentException] {
      CoveringIndex.sync(spark, src2, idx2, "k", cols)
    }
  }


  test("an interrupted compact swap resumes; lookups push probed keys into the scan") {
    val (src, idx) = table(50)
    CoveringIndex.init(spark, src, idx, "k", cols)
    TableVersions.commitDelete(spark, src, "k % 4 = 1")
    CoveringIndex.sync(spark, src, idx, "k", cols)
    val want = viewOf(idx)
    CoveringIndex.compact(spark, idx, "k", cols)
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // crash state: live gone, staged complete
    assert(
      fs.rename(
        new org.apache.hadoop.fs.Path(s"$idx/data"),
        new org.apache.hadoop.fs.Path(s"$idx/data_compacted")
      )
    )
    CoveringIndex.compact(spark, idx, "k", cols) // must resume, not fail
    assert(viewOf(idx) == want)
    // probed keys reach the parquet reader as pushed filters
    val plan = CoveringIndex
      .lookup(spark, idx, "k", cols, Seq(2L, 30L))
      .queryExecution
      .executedPlan
      .toString
    assert(plan.contains("PushedFilters") && plan.contains("k"), "probe keys not pushed")
  }

  test("maintain sweeps crashed-sync staging orphans; answers unchanged") {
    val (src, idx) = table(40)
    CoveringIndex.init(spark, src, idx, "k", cols)
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(CoveringIndex.maintain(spark, idx, olderThanMs = 0L) == 0, "nothing to sweep yet")
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$idx/_staging/dead-1"))
    fs.create(new org.apache.hadoop.fs.Path(s"$idx/_staging/dead-2/part-0.parquet"), true).close()
    val want = viewOf(idx)
    // the age guard: a just-created staging dir is indistinguishable
    // from a LIVE in-flight sync's — the default cutoff must leave it
    assert(CoveringIndex.maintain(spark, idx) == 0, "default cutoff destroyed fresh staging")
    assert(
      fs.exists(new org.apache.hadoop.fs.Path(s"$idx/_staging/dead-1")),
      "a fresh (possibly live) staging dir must survive the default cutoff"
    )
    assert(CoveringIndex.maintain(spark, idx, olderThanMs = 0L) == 2)
    assert(fs.listStatus(new org.apache.hadoop.fs.Path(s"$idx/_staging")).isEmpty)
    assert(viewOf(idx) == want, "janitor changed an answer")
    assert(CoveringIndex.maintain(spark, idx, olderThanMs = 0L) == 0, "sweep is idempotent")
  }

  test("string business keys: full lifecycle incl. the sync guard's pushed-probe fast path") {
    val s = spark
    import s.implicits._
    val src = fresh("cis_src")
    val idx = fresh("cis_idx")
    val scols = Seq("v")
    TableVersions.commitAppend(
      (0L until 30L).map(i => (f"key_$i%03d", i * 10)).toDF("k", "v"),
      src
    )
    CoveringIndex.init(spark, src, idx, "k", scols)
    // window touches 3 keys (≤1000) → the guard probes the index with
    // collected STRING values — the former Row.getLong crash site
    TableVersions.commitDelete(spark, src, "k = 'key_005'")
    TableVersions.commitAppend(Seq(("key_new", 7L), ("key_005", 55L)).toDF("k", "v"), src)
    assert(CoveringIndex.sync(spark, src, idx, "k", scols) == 2L)
    val got = CoveringIndex
      .lookup(spark, idx, "k", scols, Seq("key_005", "key_new", "key_010"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .toSet
    assert(got == Set(("key_005", 55L), ("key_new", 7L), ("key_010", 100L)))
    // the guard still REFUSES an insert onto a live string key
    TableVersions.commitAppend(Seq(("key_010", 999L)).toDF("k", "v"), src)
    intercept[IllegalArgumentException] {
      CoveringIndex.sync(spark, src, idx, "k", scols)
    }
  }
}
