package graft.operators

import org.apache.spark.ml.feature.{CountVectorizer, CountVectorizerModel, HashingTF, IDF, NGram, RegexTokenizer, StopWordsRemover}
import org.apache.spark.ml.linalg.{SparseVector, Vector}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** MLlib text-featurization pipeline over `documents` (SURVEY.md §2.3
  * E14): RegexTokenizer → StopWordsRemover → HashingTF → IDF, plus
  * word n-grams. The fitted IDF model is a 2^18-dim vector broadcast by
  * MLlib; the transform stays a per-row map — no extra shuffles beyond
  * the IDF fit's one aggregation over the corpus.
  */
object TextPipeline {

  val NumFeatures = 1 << 18

  /** tokens + filtered tokens + 2-grams, as plain array columns. */
  def tokenized(spark: SparkSession, dir: String): DataFrame = {
    // spread the tokenizer/TF CPU off the single file split (see
    // Dedup.docsWide); every downstream MLlib transform is a per-row
    // map, so the parallelism carries through the whole pipeline
    val docs = Tables(spark, dir, "documents")
      .repartition(spark.sparkContext.defaultParallelism)
    val tok = new RegexTokenizer()
      .setInputCol("text")
      .setOutputCol("tokens")
      .setPattern("\\s+")
    val stop = new StopWordsRemover()
      .setInputCol("tokens")
      .setOutputCol("filtered")
    val ngram = new NGram().setN(2).setInputCol("filtered").setOutputCol("bigrams")
    ngram.transform(stop.transform(tok.transform(docs)))
  }

  /** TF-IDF vectors (hashing trick). Returns doc_id + the sparse vector
    * plus summary scalars that are cheap to inspect. */
  def tfidf(spark: SparkSession, dir: String): DataFrame = {
    val tokens = tokenized(spark, dir)
    val tf = new HashingTF()
      .setInputCol("filtered")
      .setOutputCol("tf")
      .setNumFeatures(NumFeatures)
    val withTf = tf.transform(tokens)
    val idf = new IDF().setInputCol("tf").setOutputCol("tfidf").fit(withTf)
    idf.transform(withTf)
  }

  /** Exact-vocabulary term counts (CountVectorizer) — the collision-free
    * alternative to the hashing trick when the vocabulary fits the
    * driver (it's broadcast to executors). Returns the fitted model too
    * so callers can map indices back to terms.
    */
  def countVectorized(spark: SparkSession, dir: String, vocabSize: Int = 1 << 16): (DataFrame, CountVectorizerModel) = {
    val tokens = tokenized(spark, dir)
    val cv = new CountVectorizer()
      .setInputCol("filtered")
      .setOutputCol("counts")
      .setVocabSize(vocabSize)
      .fit(tokens)
    (cv.transform(tokens), cv)
  }

  /** Flat, deterministic summary of the MLlib pipeline output (vector
    * internals are implementation-defined → rows-only query). */
  def featureSummary(spark: SparkSession, dir: String): DataFrame = {
    // operate on the sparse representation — v.toArray would walk all
    // 2^18 slots per row (measured 50x slower at sf0.1)
    val nnz = udf((v: Vector) => v.numNonzeros)
    val l1 = udf((v: Vector) =>
      v match {
        case sv: SparseVector => sv.values.sum
        case dv               => dv.toArray.sum
      }
    )
    tfidf(spark, dir)
      .select(
        col("doc_id"),
        size(col("tokens")).cast("long").as("n_tokens"),
        size(col("filtered")).cast("long").as("n_filtered"),
        size(col("bigrams")).cast("long").as("n_bigrams"),
        nnz(col("tfidf")).cast("long").as("tfidf_nnz"),
        round(l1(col("tfidf")), 3).as("tfidf_l1")
      )
      .orderBy("doc_id")
  }
}
