package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkSpec, Tables}

/** Pins the positional-index lifecycle the q276/q277 oracles can't
  * see: append equals a one-shot rebuild, tombstoned docs vanish from
  * phrase AND prefix answers idempotently, compact folds the
  * tombstones away without changing a single answer, and the build's
  * write fan-out is the shuffle width — never the 16-value bucket
  * domain (the round-13 100 TB-build bottleneck).
  */
class PositionalIndexSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def docs = Tables(spark, dir, "documents").select("doc_id", "text")

  private def phrase(idx: String): Map[Long, Long] =
    PositionalIndex
      .phraseCounts(spark, idx, Seq("spark", "join"))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap

  private def prefix(idx: String): Map[String, (Long, Long)] =
    PositionalIndex
      .prefixStats(spark, idx, "s")
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap

  test("append equals a one-shot rebuild; deletes hide docs idempotently; compact folds") {
    val incr = graft.queries.Similarity.freshIndexDir("pos_incr")
    PositionalIndex.build(docs.filter(col("doc_id") % 3 =!= 0), incr)
    PositionalIndex.append(docs.filter(col("doc_id") % 3 === 0), incr)
    val full = graft.queries.Similarity.freshIndexDir("pos_full")
    PositionalIndex.build(docs, full)
    assert(phrase(incr) == phrase(full), "append diverged from one-shot build (phrase)")
    assert(prefix(incr) == prefix(full), "append diverged from one-shot build (prefix)")

    val gone = docs.filter(col("doc_id") % 4 === 1).select("doc_id")
    PositionalIndex.delete(gone, incr)
    val afterOnce = phrase(incr)
    assert(afterOnce.keySet.forall(_ % 4 != 1), "deleted doc surfaced in phrase hits")
    assert(afterOnce == phrase(full).filter { case (id, _) => id % 4 != 1 })
    val prefixAfter = prefix(incr)
    PositionalIndex.delete(gone, incr) // replayed erasure request
    assert(phrase(incr) == afterOnce, "duplicate tombstones changed phrase results")
    assert(prefix(incr) == prefixAfter, "duplicate tombstones changed prefix results")

    PositionalIndex.compact(spark, incr)
    assert(phrase(incr) == afterOnce, "compaction changed phrase results")
    assert(prefix(incr) == prefixAfter, "compaction changed prefix results")
    val fs = new org.apache.hadoop.fs.Path(incr)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(
      !fs.exists(new org.apache.hadoop.fs.Path(s"$incr/tombstones")),
      "tombstone table survived compaction"
    )
    val layoutIds = spark.read
      .parquet(s"$incr/data")
      .select("doc_id")
      .distinct()
      .collect()
      .map(_.getLong(0))
    assert(layoutIds.forall(_ % 4 != 1), "erased docs still physically in the layout")
    // idempotent: compacting a tombstone-free index is a no-op
    PositionalIndex.compact(spark, incr)
    assert(phrase(incr) == afterOnce)
  }

  test("phrase lookup prunes to the phrase tokens' buckets") {
    val idx = graft.queries.Similarity.freshIndexDir("pos_prune")
    PositionalIndex.build(docs, idx)
    val q = PositionalIndex.phraseCounts(spark, idx, Seq("spark", "join"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("bkt"), "no bucket pruning")
    assert(plan.contains("PushedFilters") && plan.contains("tok"), "term filter not pushed")
  }

  test("kwic renders from the forward layout; tombstoned docs vanish BEFORE compact folds them") {
    val idx = graft.queries.Similarity.freshIndexDir("pos_fwd")
    PositionalIndex.build(docs.filter(col("doc_id") % 3 =!= 0), idx)
    PositionalIndex.append(docs.filter(col("doc_id") % 3 === 0), idx)
    def kwicRows() = PositionalIndex
      .kwic(spark, idx, Seq("spark", "join"), window = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .toSet
    val all = kwicRows()
    assert(all.nonEmpty, "fixture phrase must occur")
    // delete every hit doc's neighbors-by-modulus; the render must drop
    // them from tombstones ALONE (the mid-compact crash window: one
    // layout swapped, the other not — reads stay correct either way)
    PositionalIndex.delete(docs.filter(col("doc_id") % 2 === 0).select("doc_id"), idx)
    val afterDelete = kwicRows()
    assert(afterDelete == all.filter(_._1 % 2 != 0), "tombstones not applied to the render")
    PositionalIndex.compact(spark, idx)
    assert(kwicRows() == afterDelete, "compact changed a kwic answer")
  }

  test("build write fan-out is the shuffle width, not the 16-value bucket domain") {
    // 16 md5 buckets but 32 shuffle partitions: partitionBy must route
    // rows while MANY tasks write — the round-13 `weak` was exactly a
    // repartition(bkt) funneling every build through 16 tasks. AQE's
    // small-partition coalescing is disabled for the probe: at sf0.001
    // it legitimately folds the tiny shuffle to one task, which would
    // hide the 16-value cap this test exists to catch (at 100 TB the
    // partitions are large and AQE keeps the full width).
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try {
      val idx = graft.queries.Similarity.freshIndexDir("pos_fanout")
      PositionalIndex.build(docs, idx)
      val taskIds = new java.io.File(s"$idx/data")
        .listFiles()
        .filter(_.isDirectory)
        .flatMap(_.listFiles())
        .map(_.getName)
        .filter(_.startsWith("part-"))
        .map(_.split("-")(1)) // part-<taskId>-<uuid>…
        .toSet
      assert(taskIds.size > 16, s"build wrote with only ${taskIds.size} tasks")
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", "4")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    }
  }
}
