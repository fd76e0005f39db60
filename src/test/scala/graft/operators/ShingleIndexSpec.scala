package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, SparkSpec}

/** Pins the persisted near-dup admission index (q190): index-served
  * verdicts equal the from-scratch q146 recompute (the shared oracle
  * checks the registered split; this spec extends the equality through
  * the maintenance lifecycle — after df compaction, and on a SECOND
  * batch admitted after the first is folded in), and the df segment
  * layout behaves as documented (one segment per append, folded to one
  * by compactDf, summed counts unchanged).
  */
class ShingleIndexSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.01"
  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  private def docs = graft.Tables(spark, dir, "documents").select("doc_id", "text")

  test("q190 index-served verdicts equal the q146 recompute") {
    val served = run("q190_shingle_index_admission").collect().toSeq
    val recomputed = run("q146_incremental_neardup").collect().toSeq
    assert(served.nonEmpty)
    assert(served == recomputed)
  }

  test("df segments: one per append, compaction folds them, admission unchanged") {
    val idx = graft.queries.Similarity.freshIndexDir("shingle_spec")
    ShingleIndex.build(docs.filter(col("doc_id") % 5 <= 2), idx)
    ShingleIndex.append(docs.filter(col("doc_id") % 5 === 3), idx)
    def segs = new java.io.File(s"$idx/df").listFiles().count(_.getName.startsWith("seg="))
    assert(segs == 2)
    val batch = docs.filter(col("doc_id") % 5 === 4)
    val before = ShingleIndex.admit(spark, idx, batch, 0.5).collect().toSeq
    ShingleIndex.compactDf(spark, idx)
    assert(segs == 1, "compactDf did not fold the segments")
    assert(ShingleIndex.admit(spark, idx, batch, 0.5).collect().toSeq == before)
  }

  test("second batch after folding the first: verdicts equal the grown-corpus recompute") {
    val idx = graft.queries.Similarity.freshIndexDir("shingle_spec2")
    // corpus = %3 != 2 docs; first batch (%3 == 2, even half) folded in;
    // then admit the odd half against the grown corpus
    ShingleIndex.build(docs.filter(col("doc_id") % 3 =!= 2), idx)
    ShingleIndex.append(docs.filter(col("doc_id") % 3 === 2 && col("doc_id") % 2 === 0), idx)
    val second = docs.filter(col("doc_id") % 3 === 2 && col("doc_id") % 2 === 1)
    val served = ShingleIndex.admit(spark, idx, second, 0.5).collect().toSeq
    val grown = docs.filter(col("doc_id") % 3 =!= 2 || col("doc_id") % 2 === 0)
    val recomputed =
      graft.queries.Dedup.admissionPairs(grown, second, 0.5).collect().toSeq
    assert(served == recomputed)
  }
}
