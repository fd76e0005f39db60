package graft.queries

import graft.QueryDef
import graft.operators.TextPipeline
import org.apache.spark.sql.functions._

/** MLlib featurization pipeline exposed as a named query (rows-only:
  * hashed-vector internals are implementation-defined).
  */
object MlText {
  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q51_mllib_tfidf",
      (s, dir) => TextPipeline.featureSummary(s, dir),
      None
    ),
    // MLlib-primitive variants of the native LSH ops (SURVEY §2.3 rows
    // name MinHashLSH / BucketedRandomProjectionLSH explicitly): same
    // semantics as q36 / q41 through the estimator API. Rows-only —
    // hash families are MLlib-internal; MlLshSpec pins recall against
    // the exact formulations.
    QueryDef(
      "q78_mllib_minhash",
      (s, dir) => graft.operators.MlLsh.minhashPairs(s, dir),
      None
    ),
    QueryDef(
      "q79_mllib_ann",
      (s, dir) => graft.operators.MlLsh.annCosineTopK(s, dir),
      None
    ),

    // ------------------------------------------------------------------
    // MODEL-BASED quality filtering (the fastText/CCNet second stage):
    // hashing-trick featurization → logistic regression fit on weak
    // labels → one distributed scoring pass → probability gate. The
    // synthetic corpus has no natural quality signal, so the fixture
    // injects token-REVERSED garbage twins (disjoint vocabulary, same
    // shape statistics) — the smoke contract a real pipeline runs
    // before spending labels. Output is the (split, label, verdict)
    // confusion table plus per-lang pass rates on the real half.
    // Rows-only (LR weights aren't SQL — q51/q78/q79 precedent);
    // QualityModelSpec pins holdout accuracy ≥ 0.95, the gate
    // actually filtering, and a refit reproducing the scores.
    QueryDef(
      "q221_quality_model",
      (s, dir) => {
        val scored = graft.operators.QualityModel.trainAndScore(s, dir).localCheckpoint()
        val confusion = scored
          .groupBy("part", "label", "pass")
          .agg(count(lit(1)).as("n"))
          .select(
            lit("confusion").as("kind"),
            concat(col("part"), lit("/l"), col("label").cast("int"), lit("/p"), col("pass"))
              .as("k"),
            col("n")
          )
        val perLang = scored
          .filter(col("label") === 1.0)
          .groupBy("lang")
          .agg(sum("pass").as("n"))
          .select(lit("lang_pass").as("kind"), col("lang").as("k"), col("n"))
        confusion.unionByName(perLang).orderBy("kind", "k")
      },
      None
    )
  )
}
