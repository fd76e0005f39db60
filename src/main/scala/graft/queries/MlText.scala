package graft.queries

import graft.QueryDef
import graft.operators.TextPipeline

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
    )
  )
}
