package graft.operators

import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.feature.{HashingTF, RegexTokenizer}
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MODEL-BASED quality filtering — the fastText/CCNet classifier
  * shape: featurize documents with the hashing trick, fit a logistic
  * regression against weak labels, score the whole corpus in one
  * distributed pass, and gate on the probability. The heuristic
  * scorers (q32's length/punct/stopword ratios) are transparent but
  * fixed; the trained filter learns whatever separates the reference
  * class from the reject class in feature space — the standard second
  * stage of a production curation pipeline.
  *
  * Scale shape: HashingTF and the model transform are per-row maps
  * (no vocabulary table — the hashing trick is what makes this
  * trainable on a 100 TB corpus without a driver-side dictionary);
  * the LBFGS fit aggregates gradients tree-wise per iteration, the
  * only corpus-wide exchanges. Scoring broadcasts one 2^15-dim
  * coefficient vector. Determinism: the fit is exactly reproducible
  * for a fixed partition layout (callers repartition by a key before
  * fitting — float gradient sums are order-sensitive), which
  * QualityModelSpec pins by refitting.
  *
  * The synthetic corpus carries no natural quality signal (every lang
  * and source draws from one vocabulary), so the fixture injects
  * known-garbage negatives — token-REVERSED copies of real docs:
  * disjoint hashed vocabulary, identical length/shape statistics, and
  * deterministic. Separating them is exactly the smoke contract a
  * real pipeline uses to validate its classifier plumbing before
  * spending labels.
  */
object QualityModel {

  val NumFeatures = 1 << 15

  /** Real docs (label 1) + token-reversed garbage twins (label 0),
    * with a deterministic md5 train/holdout split. */
  def labeledCorpus(spark: SparkSession, dir: String): DataFrame = {
    val docs = graft.Tables(spark, dir, "documents").select(col("doc_id"), col("lang"), col("text"))
    val garbage = docs.select(
      (col("doc_id") + 1000000L).as("doc_id"),
      col("lang"),
      expr("array_join(transform(split(text, ' '), x -> reverse(x)), ' ')").as("text")
    )
    docs
      .withColumn("label", lit(1.0))
      .unionByName(garbage.withColumn("label", lit(0.0)))
      .withColumn(
        "part",
        expr(
          "CASE WHEN substring(md5(cast(doc_id AS string)), 1, 1) < 'c' " +
            "THEN 'train' ELSE 'heldout' END"
        )
      )
      // fixed layout => bitwise-reproducible gradient sums => a
      // deterministic fit (QualityModelSpec refits and compares)
      .repartition(8, col("doc_id"))
  }

  /** Fit on the train split, score EVERYTHING. Returns one row per doc
    * with the model probability and the 0.5-gate verdict. */
  def trainAndScore(spark: SparkSession, dir: String): DataFrame = {
    val corpus = labeledCorpus(spark, dir).localCheckpoint()
    val tok = new RegexTokenizer()
      .setInputCol("text")
      .setOutputCol("tokens")
      .setPattern("\\s+")
    val tf = new HashingTF()
      .setInputCol("tokens")
      .setOutputCol("tf")
      .setNumFeatures(NumFeatures)
    val featurized = tf.transform(tok.transform(corpus))
    val lr = new LogisticRegression()
      .setFeaturesCol("tf")
      .setLabelCol("label")
      .setMaxIter(25)
      .setRegParam(1e-3)
    val model = lr.fit(featurized.filter(col("part") === "train"))
    model
      .transform(featurized)
      .select(
        col("doc_id"),
        col("lang"),
        col("part"),
        col("label"),
        vector_to_array(col("probability")).getItem(1).as("p_good"),
        (vector_to_array(col("probability")).getItem(1) >= 0.5).cast("long").as("pass")
      )
  }
}
