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

  test("frame sampling with stride 1 reassembles the payload exactly") {
    val media = Multimodal.mediaTable(spark, dir)
    val texts = media.collect().map(m => m.media_id -> new String(m.payload, "UTF-8")).toMap
    val frames = Multimodal.sampleFrames(media, frameBytes = 32, stride = 1).collect()
    frames.groupBy(_.media_id).foreach { case (id, fs) =>
      val joined = fs.sortBy(_.frame_idx).map(_.frame_text).mkString
      assert(joined == texts(id))
      assert(fs.init.forall(_.frame_len == 32)) // only the tail frame may be short
    }
  }

  test("frame sampling with stride 4 keeps every 4th offset") {
    val media = Multimodal.mediaTable(spark, dir)
    val frames = Multimodal.sampleFrames(media, frameBytes = 32, stride = 4).collect()
    val texts = media.collect().map(m => m.media_id -> new String(m.payload, "UTF-8")).toMap
    frames.foreach { f =>
      val expect = texts(f.media_id).slice(f.frame_idx.toInt * 128, f.frame_idx.toInt * 128 + 32)
      assert(f.frame_text == expect)
    }
  }

  test("resize decimates to at most targetBytes+1 samples, preserving content order") {
    val media = Multimodal.mediaTable(spark, dir)
    val resized = Multimodal.resize(media, targetBytes = 16).collect()
    val texts = media.collect().map(m => m.media_id -> new String(m.payload, "UTF-8")).toMap
    resized.foreach { r =>
      assert(r.payload.length <= 17)
      assert(r.declared_bytes == r.payload.length)
      val t = texts(r.media_id)
      val step = math.max(1, (t.length + 15) / 16)
      val expect = (0 until t.length by step).map(t.charAt).mkString
      assert(new String(r.payload, "UTF-8") == expect)
    }
  }
}
