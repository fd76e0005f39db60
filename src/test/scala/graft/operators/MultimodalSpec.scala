package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

class MultimodalSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("binary payload plumbing: schema, row preservation, deterministic features") {
    val media = Multimodal.mediaTable(spark, dir)
    val feats = Multimodal.extractFeatures(media)

    assert(media.schema("payload").dataType.typeName == "binary")
    assert(feats.count() == media.count())

    val rows = feats.collect()
    assert(rows.forall(_.feat_dim == 16))
    assert(rows.forall(_.features.length == 16))
    // histogram features are ratios — each in [0,1], summing to ~1
    assert(rows.forall(r => math.abs(r.features.map(_.toDouble).sum - 1.0) < 1e-5))
    // deterministic across runs
    val again = Multimodal.extractFeatures(Multimodal.mediaTable(spark, dir)).collect()
    assert(rows.map(r => (r.media_id, r.checksum)).toSeq.sorted ==
      again.map(r => (r.media_id, r.checksum)).toSeq.sorted)
  }

  test("payload bytes match declared metadata (ASCII corpus: n_chars == byte length)") {
    val media = Multimodal.mediaTable(spark, dir).collect()
    assert(media.forall(m => m.payload.length == m.declared_bytes))
  }
}
