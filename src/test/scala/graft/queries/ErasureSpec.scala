package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkSpec, Tables}
import graft.operators.{InvertedIndex, ShingleIndex, TableVersions}

/** Pins q202's negative space — after the erasure workflow, the
  * subjects must be invisible through EVERY read path (plain scan,
  * bloom point lookup, keyword index), and replaying the propagation
  * is idempotent.
  */
class ErasureSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("erased subjects are invisible via scan, point lookup, and index; replay idempotent") {
    val tdir = Similarity.freshIndexDir("erasure_spec_store")
    val idx = Similarity.freshIndexDir("erasure_spec_idx")
    val docs = Tables(spark, dir, "documents")
    TableVersions.commitAppend(docs.repartition(4, col("source")), tdir)
    TableVersions.refreshBloom(spark, tdir, Seq("doc_id"), bits = 16384, hashes = 3)
    InvertedIndex.build(docs, idx)

    val erased = docs.filter(col("doc_id") % 29 === 3).select("doc_id")
    val ids = erased.collect().map(_.getLong(0)).toSeq
    assert(ids.nonEmpty)

    TableVersions.commitDelete(spark, tdir, "doc_id % 29 = 3")
    val delta = TableVersions.changes(spark, tdir, "doc_id", 0L, 1L)
    InvertedIndex.delete(delta.filter(col("change_type") === "delete").select("doc_id"), idx)
    InvertedIndex.compact(spark, idx)

    // plain scan of the head: gone
    val head = TableVersions.readVersion(spark, tdir, 1L)
    assert(head.filter(col("doc_id").isin(ids: _*)).count() == 0)
    // bloom point lookup at the head: gone (stale bloom rows of the
    // rewritten files must not resurrect anything)
    ids.foreach { id =>
      assert(
        TableVersions.readVersionPoint(spark, tdir, 1L, "doc_id", id.toString).count() == 0,
        s"point lookup resurfaced $id"
      )
    }
    // keyword index: no lookup may return an erased id — probe with
    // each erased doc's own most distinctive terms
    val terms = docs
      .filter(col("doc_id").isin(ids: _*))
      .select(explode(split(col("text"), " ")).as("t"))
      .filter(length(col("t")) > 2)
      .distinct()
      .limit(5)
      .collect()
      .map(_.getString(0))
      .toSeq
    terms.foreach { t =>
      val hits = InvertedIndex
        .conjunctiveQuery(spark, idx, Seq(t))
        .filter(col("doc_id").isin(ids: _*))
      assert(hits.count() == 0, s"index lookup for '$t' resurfaced an erased doc")
    }
    // replaying the propagation changes nothing
    InvertedIndex.delete(delta.filter(col("change_type") === "delete").select("doc_id"), idx)
    val again = InvertedIndex
      .conjunctiveQuery(spark, idx, Seq("spark", "join"))
      .orderBy(col("score").desc, col("doc_id"))
      .collect()
      .toSeq
    InvertedIndex.compact(spark, idx)
    val afterCompact = InvertedIndex
      .conjunctiveQuery(spark, idx, Seq("spark", "join"))
      .orderBy(col("score").desc, col("doc_id"))
      .collect()
      .toSeq
    assert(again == afterCompact)
  }

  test("admission index: an erased doc can never appear as d_old, pre- or post-compact") {
    val idx = Similarity.freshIndexDir("erasure_spec_shingle")
    val docs = Tables(spark, dir, "documents").select("doc_id", "text")
    val corpus = docs.filter(col("doc_id") % 5 =!= 4)
    val batch = docs.filter(col("doc_id") % 5 === 4)
    ShingleIndex.build(corpus, idx)
    val erased = corpus.filter(col("doc_id") % 29 === 3).select("doc_id")
    val ids = erased.collect().map(_.getLong(0)).toSet
    assert(ids.nonEmpty)
    ShingleIndex.delete(erased, idx)

    // pre-compact serving (tombstone anti-join + negative df segment):
    // verdicts equal the from-scratch recompute over the erased corpus,
    // and no erased id survives as d_old
    val preCompact = ShingleIndex.admit(spark, idx, batch, 0.5).collect().toSeq
    val recomputed = Dedup
      .admissionPairs(corpus.filter(col("doc_id") % 29 =!= 3), batch, 0.5)
      .collect()
      .toSeq
    assert(preCompact == recomputed)
    assert(preCompact.forall(r => !ids.contains(r.getLong(1))))

    // replaying the erasure decrements nothing twice
    ShingleIndex.delete(erased, idx)
    assert(ShingleIndex.admit(spark, idx, batch, 0.5).collect().toSeq == preCompact)

    // compaction folds tombstones out of the rows and rebuilds df from
    // the survivors — verdicts unchanged, no row of an erased doc left
    ShingleIndex.compact(spark, idx)
    assert(ShingleIndex.admit(spark, idx, batch, 0.5).collect().toSeq == preCompact)
    val leftover = ShingleIndex
      .liveRows(spark, idx)
      .filter(col("doc_id").isin(ids.toSeq: _*))
    assert(leftover.count() == 0, "compacted admission index retains erased docs' shingles")
    // tombstone table cleared; replaying compact is a no-op
    ShingleIndex.compact(spark, idx)
    assert(ShingleIndex.admit(spark, idx, batch, 0.5).collect().toSeq == preCompact)
  }
}
