package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** POSITIONAL inverted index — the layout that answers the queries
  * the (tok, doc, tf) index structurally cannot: exact PHRASE search
  * ("spark join" as adjacent tokens, not a conjunctive bag) and
  * prefix/wildcard term scans. Postings are (tok, doc_id, pos) rows
  * under the same 16-way md5 term bucketing as [[InvertedIndex]]
  * (phrase lookups prune to the phrase tokens' buckets at listing
  * time) with tok-sorted row groups (prefix scans can't bucket-prune —
  * md5 destroys order — but parquet min/max on the sorted tok column
  * skips row groups instead; that trade is why Lucene keeps a term
  * dictionary and this engine keeps BOTH layouts).
  *
  * Phrase matching is the classic positional join: token i of the
  * phrase at position p matches iff token i+1 sits at p+1 — each
  * phrase term contributes a (doc, pos − i) frame and the occurrence
  * set is their equi-join on (doc, start), never a text re-scan. At
  * 100 TB each frame is df(term)-scaled and the join keys on
  * (doc, start) — rare-term phrases cost their rarest term.
  */
object PositionalIndex {

  /** Index `docs` (doc_id, text): whitespace tokens with positions. */
  def build(docs: DataFrame, indexDir: String): Unit =
    docs
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
      .filter(length(col("tok")) > 0)
      .withColumn("bkt", expr("instr('0123456789abcdef', substring(md5(tok), 1, 1)) - 1"))
      .repartition(col("bkt"))
      .sortWithinPartitions("tok", "doc_id", "pos")
      .write
      .mode("overwrite")
      .partitionBy("bkt")
      .parquet(indexDir)

  /** Exact-phrase occurrence counts per document. Reads only the
    * phrase tokens' buckets. */
  def phraseCounts(s: SparkSession, indexDir: String, phrase: Seq[String]): DataFrame = {
    require(phrase.size >= 2, "a phrase needs at least two tokens")
    val bkts = phrase.map(InvertedIndex.bucketOf).distinct
    val posts = s.read
      .parquet(indexDir)
      .filter(col("bkt").isin(bkts: _*) && col("tok").isin(phrase.distinct: _*))
    phrase.zipWithIndex
      .map { case (w, i) =>
        posts.filter(col("tok") === w).select(col("doc_id"), (col("pos") - i).as("start"))
      }
      .reduce((a, b) => a.join(b, Seq("doc_id", "start")))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_occurrences"))
  }

  /** Term statistics for every token with the given prefix: document
    * frequency and total occurrences. Bucket pruning is impossible
    * (md5 buckets), but the tok-sorted row groups give min/max
    * skipping within every bucket file. */
  def prefixStats(s: SparkSession, indexDir: String, prefix: String): DataFrame =
    s.read
      .parquet(indexDir)
      .filter(col("tok").startsWith(prefix))
      .groupBy("tok")
      .agg(countDistinct("doc_id").as("df"), count(lit(1)).as("n_occurrences"))
}
