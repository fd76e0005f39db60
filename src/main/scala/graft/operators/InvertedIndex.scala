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

  /** One pass over the corpus: per-(term, doc) frequencies, bucketed
    * and laid out `partitionBy(bkt)`. The groupBy is the only
    * exchange; everything downstream of the build reads prunable
    * postings. */
  def build(docs: DataFrame, indexDir: String): Unit =
    docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy("tok", "doc_id")
      .agg(count(lit(1)).as("tf"))
      .withColumn("bkt", expr(s"instr('$HexDigits', substring(md5(tok), 1, 1)) - 1"))
      // local sort so row-group min/max stats on tok actually skip
      .sortWithinPartitions("tok", "doc_id")
      .write
      .partitionBy("bkt")
      .mode("errorifexists")
      .parquet(indexDir)

  /** Conjunctive (AND) keyword query: docs containing EVERY term,
    * ranked by summed term frequency. Reads only the queried terms'
    * bucket directories (partition pruning) with the term list pushed
    * into the scan; the per-doc roll-up shuffles only the matched
    * postings — O(Σ df(term)), never corpus-scaled. */
  def conjunctiveQuery(s: SparkSession, indexDir: String, terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "empty term list")
    val bkts = terms.map(bucketOf).distinct
    s.read
      .parquet(indexDir)
      .filter(col("bkt").isin(bkts: _*) && col("tok").isin(terms: _*))
      .groupBy("doc_id")
      .agg(countDistinct(col("tok")).as("n_terms"), sum("tf").as("score"))
      .filter(col("n_terms") === terms.distinct.size)
      .select(col("doc_id"), col("score"))
  }
}
