package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkSpec, Tables}

/** Pins the inverted-index properties the q170 oracle can't see: the
  * lookup plan actually prunes to the queried buckets, and queries
  * spanning several buckets / missing terms behave exactly.
  */
class InvertedIndexSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def fresh(): String = {
    val idx = graft.queries.Similarity.freshIndexDir("inv_spec")
    InvertedIndex.build(Tables(spark, dir, "documents"), idx)
    idx
  }

  test("lookup scan prunes to the queried terms' bucket directories") {
    val idx = fresh()
    val q = InvertedIndex.conjunctiveQuery(spark, idx, Seq("spark", "join"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), "no partition pruning in the lookup scan")
    assert(plan.contains("bkt"), "bucket column absent from scan filters")
    // the term predicate reaches the parquet reader
    assert(plan.contains("PushedFilters") && plan.contains("tok"), "term filter not pushed")
    // and only the queried buckets' directories are read
    val bkts = Seq("spark", "join").map(InvertedIndex.bucketOf).distinct.toSet
    def leaves(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] =
      p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => leaves(a.executedPlan)
        case other => other.collectLeaves().flatMap {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => leaves(a)
          case l => Seq(l)
        }
      }
    val scanned = leaves(q.queryExecution.executedPlan).flatMap {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.relation.location
          .listFiles(f.partitionFilters, f.dataFilters)
          .map(_.values.getInt(0))
      case _ => Nil
    }.toSet
    assert(scanned == bkts, s"scanned buckets $scanned != queried $bkts")
  }

  test("conjunctive semantics match a direct computation, across bucket layouts") {
    val idx = fresh()
    val docs = Tables(spark, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
      .collect()
      .map(r => r.getLong(0) -> r.getString(1))
    def direct(terms: Seq[String]): Map[Long, Long] =
      docs
        .filter { case (_, t) => terms.contains(t) }
        .groupBy(_._1)
        .collect {
          case (id, hits) if hits.map(_._2).distinct.size == terms.size =>
            id -> hits.size.toLong
        }
        .toMap
    for (terms <- Seq(Seq("spark"), Seq("spark", "join"), Seq("spark", "join", "window"))) {
      val got = InvertedIndex
        .conjunctiveQuery(spark, idx, terms)
        .collect()
        .map(r => r.getLong(0) -> r.getLong(1))
        .toMap
      assert(got == direct(terms), s"mismatch for $terms")
    }
  }

  test("a term absent from the corpus empties the conjunction") {
    val idx = fresh()
    assert(InvertedIndex.conjunctiveQuery(spark, idx, Seq("spark", "zzzmissing")).isEmpty)
  }

  test("bm25 ranking: rare terms dominate, scores positive, ranks dense per query") {
    val idx = fresh()
    val n = Tables(spark, dir, "documents").count()
    val got = InvertedIndex
      .bm25TopK(spark, idx, Seq(1L -> Seq("spark", "join")), nDocs = n, topK = 10)
      .collect()
    assert(got.nonEmpty)
    assert(got.forall(_.getLong(3) > 0L))
    val ranks = got.map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(ranks.map(_._2).toSeq == (1L to ranks.length).toSeq, "ranks not dense")
    // idf monotonicity: for equal tf, a rarer term scores strictly higher
    val docs = Tables(spark, dir, "documents").count()
    val dfs = spark.read.parquet(s"$idx/data").groupBy("tok").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val (rare, common) = (dfs.minBy(_._2), dfs.maxBy(_._2))
    if (rare._2 < common._2) {
      def idf(df: Long) = (1000000L * docs) / df
      assert(idf(rare._2) > idf(common._2))
    }
  }

  test("append equals a one-shot rebuild; deletes hide docs and are idempotent") {
    val docs = Tables(spark, dir, "documents")
    val incr = graft.queries.Similarity.freshIndexDir("inv_incr")
    InvertedIndex.build(docs.filter(org.apache.spark.sql.functions.col("doc_id") % 3 =!= 0), incr)
    InvertedIndex.append(docs.filter(org.apache.spark.sql.functions.col("doc_id") % 3 === 0), incr)
    val full = fresh()
    val terms = Seq("spark", "join")
    def res(idx: String) =
      InvertedIndex.conjunctiveQuery(spark, idx, terms).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(res(incr) == res(full), "append diverged from one-shot build")

    val gone = docs.filter(org.apache.spark.sql.functions.col("doc_id") % 4 === 1).select("doc_id")
    InvertedIndex.delete(gone, incr)
    val afterOnce = res(incr)
    assert(afterOnce.keySet.forall(_ % 4 != 1), "deleted doc surfaced")
    assert(afterOnce == res(full).filter { case (id, _) => id % 4 != 1 })
    InvertedIndex.delete(gone, incr) // replayed erasure request
    assert(res(incr) == afterOnce, "duplicate tombstones changed results")

    // compaction folds the tombstones into the layout: lookups are
    // unchanged, the tombstone table is GONE (the anti-join side no
    // longer grows), the layout physically dropped the erased docs,
    // and bucket pruning still works on the rewritten layout
    InvertedIndex.compact(spark, incr)
    assert(res(incr) == afterOnce, "compaction changed lookup results")
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
    val plan = InvertedIndex
      .conjunctiveQuery(spark, incr, terms)
      .queryExecution
      .executedPlan
      .toString
    assert(plan.contains("PartitionFilters") && plan.contains("bkt"), "pruning lost after compact")
    // idempotent: compacting a tombstone-free index is a no-op
    InvertedIndex.compact(spark, incr)
    assert(res(incr) == afterOnce)
  }

  test("q181 metric identities: dcg <= idcg, ndcg in (0, 1e6], mrr from first relevant rank") {
    val rows = graft.SparkEntry
      .queries("q181_retrieval_quality")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      val (p10, mrr, dcg, idcg, ndcg) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(p10 >= 0 && p10 <= 1000000)
      assert(dcg <= idcg, "DCG exceeded the ideal ordering")
      assert(ndcg >= 0 && ndcg <= 1000000)
      if (idcg > 0) {
        assert(ndcg == dcg * 1000000L / idcg)
        // a relevant doc exists, so MRR is 1e6/rank for some rank 1..10
        assert((1 to 10).exists(k => mrr == 1000000L / k), s"mrr $mrr not a valid rank reciprocal")
      } else assert(mrr == 0L && ndcg == 0L)
    }
    // on this corpus every query term matches docs — rankings are
    // non-degenerate and at least one query achieves a perfect p@10
    assert(rows.exists(_.getLong(1) == 1000000L))
  }

  test("duplicate query terms do not change the required match count") {
    val idx = fresh()
    val a = InvertedIndex.conjunctiveQuery(spark, idx, Seq("spark", "join")).collect().toSet
    val b = InvertedIndex.conjunctiveQuery(spark, idx, Seq("spark", "join", "spark")).collect().toSet
    assert(a == b)
  }
}
