package graft.queries

import graft.QueryDef
import graft.operators.Multimodal

/** Multimodal feature extraction exposed as a named query (rows-only:
  * the checksum/feature values are engine-defined; MultimodalSpec
  * asserts the contract).
  */
object Media {
  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q50_multimodal_features",
      (s, dir) => Multimodal.featureSummary(s, dir),
      None
    )
  )
}
