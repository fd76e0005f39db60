package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted inverted index for keyword retrieval — the other half of
  * the serving story next to the vector indexes (IvfIndex/IvfAdc):
  * q158's hybrid retrieval computes its keyword channel by scanning
  * the corpus per query; this index pays one build pass so a lookup
  * touches only the postings of the queried terms.
  *
  * Layout: RELATIONAL posting lists — one row per (term, doc, tf),
  * `partitionBy` a 16-way md5 bucket of the term. Rows, not arrays:
  * a posting ARRAY for a stop-word-frequency term would be one
  * unsplittable multi-GB cell at corpus scale, while rows stay
  * partitionable and the (term, doc) layout sorts/compresses well.
  * The bucket directory bounds WHERE a lookup reads (partition
  * pruning); the term predicate is pushed into the parquet scan so
  * row-group stats bound WHAT it reads within the bucket — the same
  * two-level pruning discipline as the IVF cell layout.
  */
object InvertedIndex {

  private val HexDigits = "0123456789abcdef"

  /** Driver-side twin of the bucket expression below (for pruning the
    * lookup to the queried terms' buckets). */
  private[graft] def bucketOf(term: String): Int = {
    val h = MessageDigest.getInstance("MD5").digest(term.getBytes("UTF-8"))
    HexDigits.indexOf(HexDigits((h(0) & 0xf0) >> 4))
  }

  private def postings(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy("tok", "doc_id")
      .agg(count(lit(1)).as("tf"))
      .withColumn("bkt", expr(s"instr('$HexDigits', substring(md5(tok), 1, 1)) - 1"))
      // local sort so row-group min/max stats on tok actually skip
      .sortWithinPartitions("tok", "doc_id")

  /** One pass over the corpus: per-(term, doc) frequencies, bucketed
    * and laid out `partitionBy(bkt)`. The groupBy is the only
    * exchange; everything downstream of the build reads prunable
    * postings. */
  def build(docs: DataFrame, indexDir: String): Unit =
    postings(docs).write.partitionBy("bkt").mode("errorifexists").parquet(s"$indexDir/data")

  /** Incremental maintenance, IvfIndex-lifecycle parity: a new crawl
    * batch's postings append into the bucket layout — cost O(batch
    * tokens), the existing postings are never re-read (a doc's
    * postings are disjoint rows from every other doc's, so append
    * needs no merge). */
  def append(newDocs: DataFrame, indexDir: String): Unit =
    postings(newDocs).write.partitionBy("bkt").mode("append").parquet(s"$indexDir/data")

  /** Deletion = doc-id tombstones (one tiny write; the erasure path).
    * Lookups anti-join the tombstone set out — identical contract to
    * IvfIndex.delete: request cost never touches the posting layout,
    * duplicate tombstones are idempotent at lookup. */
  def delete(docIds: DataFrame, indexDir: String): Unit =
    docIds
      .select(col("doc_id"))
      .write
      .mode("append")
      .parquet(s"$indexDir/tombstones")

  /** Fold accumulated doc-id tombstones into the posting layout —
    * IvfIndex.compact's checked staged-rewrite discipline
    * (IvfIndex.scala's swap), ported to the bucket layout: without it,
    * sustained erasure grows the lookup anti-join's broadcast side
    * forever. Survivor postings are rewritten `partitionBy(bkt)` into
    * a staging directory NEXT to the live layout, then swapped in with
    * CHECKED FileSystem operations (a failed delete/rename throws with
    * the staged directory intact for retry — never a silently
    * destroyed index), and the tombstone table is cleared last.
    * No-op (and cheap) when no tombstones exist.
    */
  def compact(s: SparkSession, indexDir: String): Unit = {
    import org.apache.hadoop.fs.Path
    val tombs = new Path(s"$indexDir/tombstones")
    val fs = tombs.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(tombs)) return
    val survivors = s.read
      .schema(postingSchema)
      .parquet(s"$indexDir/data")
      .join(broadcast(s.read.parquet(tombs.toString)), Seq("doc_id"), "left_anti")
      // restore the build-time layout invariant: tok-sorted row groups
      // inside each bucket so min/max stats keep skipping. (bkt, tok)
      // fan-out, not bkt alone: partitionBy still routes rows to the
      // right bucket directory, but write parallelism is the shuffle
      // width instead of the 16-value bucket domain — a 100 TB rewrite
      // must not funnel through 16 tasks
      .repartition(col("bkt"), col("tok"))
      .sortWithinPartitions("tok", "doc_id")
    val staged = new Path(s"$indexDir/data_compacted")
    survivors.write.mode("overwrite").partitionBy("bkt").parquet(staged.toString)
    val live = new Path(s"$indexDir/data")
    if (!fs.delete(live, /* recursive = */ true))
      throw new java.io.IOException(s"compact: failed to remove old layout $live")
    if (!fs.rename(staged, live))
      throw new java.io.IOException(
        s"compact: failed to swap $staged into place — staged rewrite preserved at $staged"
      )
    if (!fs.delete(tombs, /* recursive = */ true))
      throw new java.io.IOException(s"compact: failed to clear tombstone table $tombs")
  }

  /** Explicit schema: an index built from an EMPTY corpus is a valid
    * index (a partitioned dir with no files), and schema inference
    * would fail on it — a degenerate-input crash the 100 TB posture
    * can't afford (DegenerateCorpusSpec pins lookups return empty). */
  private val postingSchema = org.apache.spark.sql.types.StructType(
    Seq(
      org.apache.spark.sql.types.StructField("tok", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("tf", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("bkt", org.apache.spark.sql.types.IntegerType)
    )
  )

  private def liveData(s: SparkSession, indexDir: String): DataFrame = {
    val raw = s.read.schema(postingSchema).parquet(s"$indexDir/data")
    val tombs = new org.apache.hadoop.fs.Path(s"$indexDir/tombstones")
    val fs = tombs.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(tombs))
      raw.join(broadcast(s.read.parquet(s"$indexDir/tombstones")), Seq("doc_id"), "left_anti")
    else raw
  }

  /** Disjunctive ranked retrieval with BM25-shaped scoring in EXACT
    * integer arithmetic: idf_micros(t) = 10⁶·N DIV df(t) (the
    * rational-idf trick — log idf would rank identically but drift in
    * libm low bits and forfeit the oracle), tf saturation
    * tf·(k1+1)/(tf+k1) with k1 = 6/5 cleared to integers as
    * 11·tf DIV (5·tf+6), per-(query, doc) score the sum of term
    * scores. Headroom: a term score is ≤ 10⁶·N·11 — int64-safe to
    * N ≈ 8·10¹¹ docs; scale the idf constant down past that.
    *
    * Plan: the scan reads only the queried terms' buckets (same
    * pruning as [[conjunctiveQuery]]); df(t) comes from the postings
    * themselves (term-keyed partial agg, vocabulary-bounded); the
    * per-query top-k is a bounded heap (top_k_structs), never a
    * corpus-scaled window sort.
    */
  def bm25TopK(
      s: SparkSession,
      indexDir: String,
      queries: Seq[(Long, Seq[String])],
      nDocs: Long,
      topK: Int = 10
  ): DataFrame = {
    require(queries.nonEmpty, "empty query set")
    import s.implicits._
    val terms = queries.flatMap { case (qid, ts) => ts.distinct.map(qid -> _) }
    val qdf = terms.toDF("query_id", "tok")
    val allTerms = terms.map(_._2).distinct
    val bkts = allTerms.map(bucketOf).distinct
    val postings = liveData(s, indexDir)
      .filter(col("bkt").isin(bkts: _*) && col("tok").isin(allTerms: _*))
    val df = postings.groupBy("tok").agg(count(lit(1)).as("df"))
    postings
      .join(broadcast(df), Seq("tok"))
      .join(broadcast(qdf), Seq("tok"))
      .withColumn("idf_micros", expr(s"(1000000L * ${nDocs}L) DIV df"))
      .withColumn("term_score", expr("(idf_micros * 11L * tf) DIV (5L * tf + 6L)"))
      .groupBy("query_id", "doc_id")
      .agg(sum("term_score").as("score"))
      .groupBy("query_id")
      .agg(expr(s"top_k_structs(struct(-score AS ns, doc_id, score), $topK)").as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .select(
        col("query_id"),
        (col("pos") + 1).cast("long").as("rank"),
        col("col.doc_id"),
        col("col.score")
      )
  }

  /** Conjunctive (AND) keyword query: docs containing EVERY term,
    * ranked by summed term frequency. Reads only the queried terms'
    * bucket directories (partition pruning) with the term list pushed
    * into the scan; the per-doc roll-up shuffles only the matched
    * postings — O(Σ df(term)), never corpus-scaled. */
  def conjunctiveQuery(s: SparkSession, indexDir: String, terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "empty term list")
    val bkts = terms.map(bucketOf).distinct
    liveData(s, indexDir)
      .filter(col("bkt").isin(bkts: _*) && col("tok").isin(terms: _*))
      .groupBy("doc_id")
      .agg(countDistinct(col("tok")).as("n_terms"), sum("tf").as("score"))
      .filter(col("n_terms") === terms.distinct.size)
      .select(col("doc_id"), col("score"))
  }
}
