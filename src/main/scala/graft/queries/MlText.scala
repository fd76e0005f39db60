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
    )
  )
}
