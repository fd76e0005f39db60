package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** Pins what q234's oracle cannot isolate: bm25AsOf at the head equals
  * a from-scratch InvertedIndex over the same state (rank and score),
  * compact preserves every answer at and above the new floor while
  * refusing below it, a deleted-then-reinserted doc is visible exactly
  * at its re-insert version, and the floor/cursor guards are loud.
  */
class AsOfIndexSpec extends AnyFunSuite with SparkSpec {

  private def fresh(tag: String) = graft.queries.Similarity.freshIndexDir(tag)

  private def docs(rows: Seq[(Long, String)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  private def conjSet(idx: String, terms: Seq[String], v: Long): Set[(Long, Long)] =
    AsOfIndex
      .conjunctiveAsOf(spark, idx, terms, v)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet

  test("bm25AsOf at the head equals a from-scratch index of the head state") {
    val (src, idx) = (fresh("aoi_src"), fresh("aoi_idx"))
    val base = (0L until 200L).map(i => (i, s"alpha beta w${i % 17} w${i % 5} gamma"))
    TableVersions.commitAppend(docs(base).repartition(3), src)
    AsOfIndex.init(spark, src, idx)
    TableVersions.commitAppend(docs((200L until 300L).map(i => (i, s"beta delta w${i % 17}"))), src)
    TableVersions.commitDelete(spark, src, "doc_id % 7 = 0")
    AsOfIndex.sync(spark, src, idx)

    val n = TableVersions.countAt(spark, src, 2L)
    val queries = Seq(1L -> Seq("alpha", "beta"), 2L -> Seq("delta", "w3"))
    val asOf = AsOfIndex
      .bm25AsOf(spark, idx, queries, n, v = 2L, topK = 10)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val scratch = fresh("aoi_scratch")
    InvertedIndex.build(TableVersions.readVersion(spark, src, 2L), scratch)
    val ref = InvertedIndex
      .bm25TopK(spark, scratch, queries, n, topK = 10)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(asOf == ref)
  }

  test("compact preserves answers at/above the floor and refuses below it") {
    val (src, idx) = (fresh("aoi_src"), fresh("aoi_idx"))
    TableVersions.commitAppend(docs((0L until 100L).map(i => (i, s"red blue w${i % 9}"))), src)
    AsOfIndex.init(spark, src, idx)
    TableVersions.commitDelete(spark, src, "doc_id % 4 = 1")
    TableVersions.commitAppend(docs(Seq((500L, "red blue extra"))), src)
    AsOfIndex.sync(spark, src, idx)
    val at2 = conjSet(idx, Seq("red", "blue"), 2L)
    val at1 = conjSet(idx, Seq("red", "blue"), 1L)
    AsOfIndex.compact(spark, idx)
    assert(AsOfIndex.floor(spark, idx) == 2L)
    assert(conjSet(idx, Seq("red", "blue"), 2L) == at2)
    intercept[IllegalArgumentException] { conjSet(idx, Seq("red", "blue"), 1L) }
    assert(at1 != at2) // the histories genuinely differed
    // post-compact syncs keep working
    TableVersions.commitAppend(docs(Seq((501L, "red blue later"))), src)
    AsOfIndex.sync(spark, src, idx)
    assert(conjSet(idx, Seq("red", "blue"), 3L).exists(_._1 == 501L))
    // not-yet-synced versions refuse loudly
    intercept[IllegalArgumentException] { conjSet(idx, Seq("red"), 9L) }
  }

  test("a deleted-then-reinserted doc is visible exactly at its re-insert version") {
    val s = spark
    import s.implicits._
    val (src, idx) = (fresh("aoi_src"), fresh("aoi_idx"))
    TableVersions.commitAppend(docs(Seq((1L, "zeta old"), (2L, "other row"))), src)
    AsOfIndex.init(spark, src, idx)
    TableVersions.commitDelete(spark, src, "doc_id = 1") // v1
    AsOfIndex.sync(spark, src, idx)
    TableVersions.commitAppend(Seq((1L, "zeta new")).toDF("doc_id", "text"), src) // v2
    AsOfIndex.sync(spark, src, idx)
    assert(conjSet(idx, Seq("zeta"), 0L).map(_._1) == Set(1L))
    assert(conjSet(idx, Seq("zeta"), 1L).isEmpty)
    assert(conjSet(idx, Seq("zeta"), 2L).map(_._1) == Set(1L))
    assert(conjSet(idx, Seq("old"), 2L).isEmpty) // the old text never leaks forward
    assert(conjSet(idx, Seq("new"), 0L).isEmpty) // nor the new text backward
    // repeated sync against an unmoved source is a no-op
    assert(AsOfIndex.sync(spark, src, idx) == 2L)
    assert(AsOfIndex.cursor(spark, idx) == 2L)
  }

  test("a sync crash between the segment and tombstone writes loses nothing on replay") {
    val (src, idx) = (fresh("aoi_src"), fresh("aoi_idx"))
    TableVersions.commitAppend(docs((0L until 50L).map(i => (i, s"kappa w${i % 6}"))), src)
    AsOfIndex.init(spark, src, idx)
    TableVersions.commitDelete(spark, src, "doc_id % 5 = 0") // v1: tombstones matter
    AsOfIndex.sync(spark, src, idx)
    val at1 = conjSet(idx, Seq("kappa"), 1L)
    assert(at1.size == 40)
    // simulate the crash: the v1 segment landed but the tombstone dir
    // and the commit marker did not — the exact window ADVICE named
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.delete(new org.apache.hadoop.fs.Path(s"$idx/tomb/v1"), true))
    assert(fs.delete(new org.apache.hadoop.fs.Path(s"$idx/done/v1"), true))
    // the cursor must NOT report v1 as folded (a seg-derived cursor
    // would, and the replay below would no-op, losing the deletes)
    assert(AsOfIndex.cursor(spark, idx) == 0L)
    assert(AsOfIndex.sync(spark, src, idx) == 1L)
    assert(conjSet(idx, Seq("kappa"), 1L) == at1)
  }

  test("an interrupted compact swap refuses loudly and the re-run recovers") {
    val (src, idx) = (fresh("aoi_src"), fresh("aoi_idx"))
    TableVersions.commitAppend(docs((0L until 60L).map(i => (i, s"sigma w${i % 7}"))), src)
    AsOfIndex.init(spark, src, idx)
    TableVersions.commitDelete(spark, src, "doc_id % 3 = 2") // v1
    AsOfIndex.sync(spark, src, idx)
    val at1 = conjSet(idx, Seq("sigma"), 1L)
    AsOfIndex.compact(spark, idx)
    assert(conjSet(idx, Seq("sigma"), 1L) == at1)
    // simulate a crash between the old-layout delete and the staged
    // rename: the live layout is gone, the staged one is complete
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(
      fs.rename(
        new org.apache.hadoop.fs.Path(s"$idx/seg"),
        new org.apache.hadoop.fs.Path(s"$idx/seg_compacted")
      )
    )
    // queries refuse loudly instead of answering from nothing
    intercept[IllegalArgumentException] { conjSet(idx, Seq("sigma"), 1L) }
    // the re-run resumes the swap and answers return unchanged
    AsOfIndex.compact(spark, idx)
    assert(conjSet(idx, Seq("sigma"), 1L) == at1)
  }

  test("a compact crashed MID-STAGING leaves no stale segment to duplicate postings") {
    val (src, idx) = (fresh("aoi_src"), fresh("aoi_idx"))
    TableVersions.commitAppend(docs((0L until 40L).map(i => (i, s"tau w${i % 5}"))), src)
    AsOfIndex.init(spark, src, idx)
    val at0 = conjSet(idx, Seq("tau"), 0L)
    // simulate a compact that crashed mid-staging while the live
    // layout still existed: a partial staged/v0 is left behind, then
    // syncs advance the cursor before compact re-runs
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    org.apache.hadoop.fs.FileUtil.copy(
      fs,
      new org.apache.hadoop.fs.Path(s"$idx/seg"),
      fs,
      new org.apache.hadoop.fs.Path(s"$idx/seg_compacted"),
      /* deleteSource = */ false,
      spark.sparkContext.hadoopConfiguration
    )
    TableVersions.commitDelete(spark, src, "doc_id % 4 = 1") // v1
    AsOfIndex.sync(spark, src, idx)
    val at1 = conjSet(idx, Seq("tau"), 1L)
    AsOfIndex.compact(spark, idx) // cursor is now 1; stale staged/v0 must NOT survive
    // duplicated postings would inflate tf — the sets (doc, score)
    // must be EXACTLY the pre-compact answers
    assert(conjSet(idx, Seq("tau"), 1L) == at1, "stale staging duplicated postings")
    // and the raised floor refuses v0 loudly rather than serving the
    // stale copy
    intercept[IllegalArgumentException] { conjSet(idx, Seq("tau"), 0L) }
    assert(at0.nonEmpty)
  }
}
