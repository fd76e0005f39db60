package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** Pins the bitmap-index properties the q260/q275 oracles can't see:
  * the delete mask is SEGMENT-VERSIONED (a key erased and later
  * re-appended survives — no retroactive erasure of legitimate new
  * data), compact() folds EVERY column before clearing the shared
  * mask (compacting one column must not un-erase the others), an
  * interrupted compact swap RESUMES instead of leaving the index
  * unreadable, and a torn delete (missing `_asof` sidecar) fails
  * closed.
  */
class BitmapIndexSpec extends AnyFunSuite with SparkSpec {

  private def fresh(tag: String) = graft.queries.Similarity.freshIndexDir(tag)

  private def rows(ids: Seq[Long], v: Long => String) = {
    val s = spark
    import s.implicits._
    ids.map(i => (i, v(i))).toDF("id", "g")
  }

  test("a key erased and later re-appended survives reads AND compaction") {
    val idx = fresh("bm_reappend")
    BitmapIndex.build(rows(0L until 100L, i => s"g${i % 2}"), "id", "g", idx)
    BitmapIndex.delete(rows(Seq(7L, 8L), _ => "x").select("id"), "id", idx)
    assert(BitmapIndex.count(spark, idx, "g", "g1") == 49L) // 7 gone
    assert(BitmapIndex.count(spark, idx, "g", "g0") == 49L) // 8 gone
    // the subject re-registers: a NEW append of the same key must not
    // be retro-erased by the old mask
    BitmapIndex.append(rows(Seq(7L), _ => "g1"), "id", "g", idx)
    assert(BitmapIndex.count(spark, idx, "g", "g1") == 50L, "re-appended key retro-erased")
    BitmapIndex.compact(spark, idx)
    assert(BitmapIndex.count(spark, idx, "g", "g1") == 50L, "compact baked the stale mask in")
    assert(BitmapIndex.count(spark, idx, "g", "g0") == 49L, "compact lost the erasure")
  }

  test("compact folds EVERY column before clearing the shared delete mask") {
    val idx = fresh("bm_multicol")
    val df = rows(0L until 64L, i => s"g${i % 2}").withColumn("h", concat(lit("h"), col("id") % 4))
    BitmapIndex.build(df, "id", "g", idx)
    BitmapIndex.build(df, "id", "h", idx)
    BitmapIndex.delete(df.filter(col("id") % 8 === 1).select("id"), "id", idx)
    val gBefore = BitmapIndex.valueCounts(spark, idx, "g").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val hBefore = BitmapIndex.valueCounts(spark, idx, "h").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    BitmapIndex.compact(spark, idx)
    val gAfter = BitmapIndex.valueCounts(spark, idx, "g").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val hAfter = BitmapIndex.valueCounts(spark, idx, "h").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(gAfter == gBefore, "compact changed column g")
    assert(hAfter == hBefore, "compact changed column h — erasure un-applied by the del clear")
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$idx/del")), "del masks survived compact")
  }

  test("a compact interrupted between live-delete and rename resumes on the next call") {
    val idx = fresh("bm_resume")
    BitmapIndex.build(rows(0L until 50L, i => s"g${i % 2}"), "id", "g", idx)
    BitmapIndex.delete(rows(Seq(3L), _ => "x").select("id"), "id", idx)
    val want = BitmapIndex.valueCounts(spark, idx, "g").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    // simulate the crash window: the staged layout fully written, the
    // live dir already deleted, the rename never issued
    BitmapIndex.compact(spark, idx) // produces a clean folded base
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val live = new org.apache.hadoop.fs.Path(s"$idx/col=g")
    val staged = new org.apache.hadoop.fs.Path(s"$idx/col=g.compacting")
    assert(fs.rename(live, staged)) // live missing + staging present = the crash state
    BitmapIndex.compact(spark, idx) // must resume, not throw on a missing live dir
    val got = BitmapIndex.valueCounts(spark, idx, "g").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == want, "resumed compact changed answers")
    assert(fs.exists(live) && !fs.exists(staged))
  }

  test("a torn delete (missing _asof sidecar) fails closed: masks every segment") {
    val idx = fresh("bm_torn")
    BitmapIndex.build(rows(0L until 40L, _ => "g"), "id", "g", idx)
    BitmapIndex.delete(rows(Seq(5L), _ => "x").select("id"), "id", idx)
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.delete(new org.apache.hadoop.fs.Path(s"$idx/del/seg=0/_asof"), false))
    // the sidecar-less mask now covers EVERY segment — a re-append of
    // the key is over-erased (never under-erased)
    BitmapIndex.append(rows(Seq(5L), _ => "g"), "id", "g", idx)
    assert(BitmapIndex.count(spark, idx, "g", "g") == 39L, "torn delete leaked the key")
  }
}
