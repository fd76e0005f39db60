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

  test("image codec: real PNG encode→decode round-trips exact pixel sums") {
    val imgs = Multimodal.syntheticImages(spark, dir)
    val sample = imgs.take(5)
    // payloads are genuine PNG files (magic bytes), not a fake container
    assert(sample.forall(m =>
      (m.payload(0) & 0xff) == 0x89 && m.payload(1) == 'P' && m.payload(2) == 'N' && m.payload(3) == 'G'))
    assert(sample.forall(_.media_type == "image/png"))

    val feats = Multimodal.decodeImageFeatures(imgs).collect()
    assert(feats.nonEmpty && feats.forall(_.decode_ok))
    // decoded sums equal the generating formula — the codec lost nothing
    feats.foreach { f =>
      val id = f.media_id
      assert(f.width == (8 + id % 9).toInt && f.height == (8 + (id / 9) % 9).toInt)
      var (sr, sg, sb) = (0L, 0L, 0L)
      for (y <- 0 until f.height; x <- 0 until f.width) {
        sr += (3L * x + 5L * y + id) % 251L
        sg += (7L * x + 11L * y + 2L * id) % 251L
        sb += (13L * x + 17L * y + 3L * id) % 251L
      }
      assert((f.sum_r, f.sum_g, f.sum_b) == ((sr, sg, sb)))
    }
  }

  test("image codec: corrupt payloads become decode_ok=false rows, not failures") {
    val sess = spark
    import sess.implicits._
    val good = Multimodal.syntheticImages(spark, dir).take(1).head
    val corrupt = Seq(
      Multimodal.MediaRecord(900001L, "image/png", Array[Byte](1, 2, 3, 4), 4L),
      Multimodal.MediaRecord(900002L, "image/png", good.payload.take(10), 10L),
      good
    ).toDS()
    val out = Multimodal.decodeImageFeatures(corrupt).collect().sortBy(_.media_id)
    assert(out.length == 3)
    assert(out.count(_.decode_ok) == 1)
    assert(out.filter(!_.decode_ok).forall(f => f.width == -1 && f.sum_r == -1L))
  }

  test("audio codec: real WAV encode→decode round-trips exact sample stats") {
    val clips = Multimodal.syntheticAudio(spark, dir)
    val sample = clips.take(5)
    // payloads are genuine RIFF/WAVE containers, not a fake format
    assert(sample.forall(m =>
      m.payload(0) == 'R' && m.payload(1) == 'I' && m.payload(2) == 'F' && m.payload(3) == 'F' &&
        m.payload(8) == 'W' && m.payload(9) == 'A' && m.payload(10) == 'V' && m.payload(11) == 'E'))
    assert(sample.forall(_.media_type == "audio/wav"))

    val feats = Multimodal.decodeAudioFeatures(clips).collect()
    assert(feats.nonEmpty && feats.forall(_.decode_ok))
    assert(feats.forall(_.sample_rate == 8000))
    // decoded stats equal the generating formula — the codec lost nothing
    feats.foreach { f =>
      val id = f.media_id
      val n = (64 + id % 65).toInt
      assert(f.n_samples == n.toLong)
      val samples = (0 until n).map(i => ((7L * i + id) % 2001L - 1000L).toInt)
      assert(f.sum_s == samples.map(_.toLong).sum)
      assert(f.sum_abs == samples.map(v => math.abs(v).toLong).sum)
      assert(f.min_s == samples.min && f.max_s == samples.max)
    }
  }

  test("audio codec: corrupt payloads become decode_ok=false rows, not failures") {
    val sess = spark
    import sess.implicits._
    val good = Multimodal.syntheticAudio(spark, dir).take(1).head
    val corrupt = Seq(
      Multimodal.MediaRecord(900001L, "audio/wav", Array[Byte](1, 2, 3, 4), 4L),
      Multimodal.MediaRecord(900002L, "audio/wav", good.payload.take(12), 12L),
      good
    ).toDS()
    val out = Multimodal.decodeAudioFeatures(corrupt).collect().sortBy(_.media_id)
    assert(out.length == 3)
    assert(out.count(_.decode_ok) == 1)
    assert(out.filter(!_.decode_ok).forall(f => f.sample_rate == -1 && f.sum_s == -1L))
  }

  test("audio downsample: boxcar decimation halves rate/count with exact floorDiv averages") {
    val clips = Multimodal.syntheticAudio(spark, dir)
    val out = Multimodal.decodeAudioFeatures(Multimodal.downsampleAudio(clips)).collect()
    assert(out.nonEmpty && out.forall(_.decode_ok))
    assert(out.forall(_.sample_rate == 4000))
    out.foreach { f =>
      val id = f.media_id
      val n = (64 + id % 65).toInt
      val orig = (0 until n).map(i => ((7L * i + id) % 2001L - 1000L).toInt)
      // trailing odd sample dropped; negative sums floor (not truncate)
      val dec = (0 until n / 2).map(k => Math.floorDiv(orig(2 * k) + orig(2 * k + 1), 2))
      assert(f.n_samples == (n / 2).toLong)
      assert(f.sum_s == dec.map(_.toLong).sum)
      assert(f.sum_abs == dec.map(v => math.abs(v).toLong).sum)
      assert(f.min_s == dec.min && f.max_s == dec.max)
    }
  }

  test("image downscale: nearest-neighbor 2x keeps exactly the even-grid pixels") {
    val imgs = Multimodal.syntheticImages(spark, dir)
    val out = Multimodal.decodeImageFeatures(Multimodal.downscaleImages(imgs)).collect()
    assert(out.nonEmpty && out.forall(_.decode_ok))
    out.foreach { f =>
      val id = f.media_id
      val (w0, h0) = ((8 + id % 9).toInt, (8 + (id / 9) % 9).toInt)
      assert(f.width == w0 / 2 && f.height == h0 / 2)
      val pts = for (y <- 0 until h0 / 2; x <- 0 until w0 / 2) yield (2 * x, 2 * y)
      assert(f.sum_r == pts.map { case (x, y) => (3L * x + 5L * y + id) % 251L }.sum)
      assert(f.sum_g == pts.map { case (x, y) => (7L * x + 11L * y + 2L * id) % 251L }.sum)
      assert(f.sum_b == pts.map { case (x, y) => (13L * x + 17L * y + 3L * id) % 251L }.sum)
    }
  }

  test("image downscale: corrupt payloads flow through as decode_ok=false rows") {
    val sess = spark
    import sess.implicits._
    val good = Multimodal.syntheticImages(spark, dir).take(1).head
    val mixed = Seq(
      Multimodal.MediaRecord(900011L, "image/png", Array[Byte](0, 1, 2, 3), 4L),
      good
    ).toDS()
    val out = Multimodal
      .decodeImageFeatures(Multimodal.downscaleImages(mixed))
      .collect()
      .sortBy(_.media_id)
    assert(out.length == 2)
    assert(out.count(_.decode_ok) == 1)
    assert(!out.find(_.media_id == 900011L).get.decode_ok)
  }

  test("audio downsample: corrupt payloads flow through as decode_ok=false rows") {
    val sess = spark
    import sess.implicits._
    val good = Multimodal.syntheticAudio(spark, dir).take(1).head
    val mixed = Seq(
      Multimodal.MediaRecord(900001L, "audio/wav", Array[Byte](9, 9, 9, 9), 4L),
      good
    ).toDS()
    val out = Multimodal
      .decodeAudioFeatures(Multimodal.downsampleAudio(mixed))
      .collect()
      .sortBy(_.media_id)
    assert(out.length == 2)
    assert(out.count(_.decode_ok) == 1)
    assert(!out.find(_.media_id == 900001L).get.decode_ok)
  }

  test("video codec: container of real PNG frames round-trips exact sampled-pixel sums") {
    val vids = Multimodal.syntheticVideos(spark, dir)
    val sample = vids.take(5)
    // payloads are the documented container: magic, frame count, then
    // length-prefixed genuine PNG frames
    sample.foreach { m =>
      assert(new String(m.payload.take(4), "US-ASCII") == "GFV1")
      val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(m.payload.drop(4)))
      val nFrames = in.readInt()
      assert(nFrames == (2 + m.media_id % 3).toInt)
      for (_ <- 0 until nFrames) {
        val len = in.readInt()
        val frame = new Array[Byte](len)
        in.readFully(frame)
        assert((frame(0) & 0xff) == 0x89 && frame(1) == 'P' && frame(2) == 'N' && frame(3) == 'G')
      }
      assert(in.read() == -1) // no trailing bytes
    }

    val feats = Multimodal.decodeVideoFeatures(vids, stride = 2).collect()
    assert(feats.nonEmpty && feats.forall(_.decode_ok))
    feats.foreach { f =>
      val id = f.media_id
      val (w, h) = ((8 + id % 5).toInt, (8 + (id / 5) % 5).toInt)
      val nFrames = (2 + id % 3).toInt
      assert(f.width == w && f.height == h)
      assert(f.n_frames == nFrames && f.n_sampled == (nFrames + 1) / 2)
      var (sr, sg, sb) = (0L, 0L, 0L)
      for (fr <- 0 until nFrames by 2; y <- 0 until h; x <- 0 until w) {
        sr += (3L * x + 5L * y + 19L * fr + id) % 251L
        sg += (7L * x + 11L * y + 23L * fr + 2L * id) % 251L
        sb += (13L * x + 17L * y + 29L * fr + 3L * id) % 251L
      }
      assert((f.sum_r, f.sum_g, f.sum_b) == ((sr, sg, sb)))
    }
  }

  test("video codec: stride sampling skips frames at the container level") {
    val vids = Multimodal.syntheticVideos(spark, dir)
    val all = Multimodal.decodeVideoFeatures(vids, stride = 1).collect()
      .map(f => f.media_id -> f).toMap
    val sampled = Multimodal.decodeVideoFeatures(vids, stride = 2).collect()
    sampled.foreach { f =>
      val full = all(f.media_id)
      assert(full.n_sampled == full.n_frames)
      assert(f.n_sampled == (f.n_frames + 1) / 2)
      // a 3+-frame video has strictly more pixels at stride 1 — the
      // stride-2 decode really skipped frame payloads
      if (f.n_frames > 1) assert(full.sum_r + full.sum_g + full.sum_b >
        f.sum_r + f.sum_g + f.sum_b)
    }
  }

  test("video codec: corrupt containers become decode_ok=false rows, not failures") {
    val sess = spark
    import sess.implicits._
    val good = Multimodal.syntheticVideos(spark, dir).take(1).head
    val badMagic = good.payload.clone(); badMagic(0) = 'X'
    val corrupt = Seq(
      Multimodal.MediaRecord(900001L, "video/gfv1", Array[Byte](1, 2, 3), 3L),
      Multimodal.MediaRecord(900002L, "video/gfv1", badMagic, badMagic.length.toLong),
      Multimodal.MediaRecord(900003L, "video/gfv1", good.payload.take(20), 20L),
      good
    ).toDS()
    val out = Multimodal.decodeVideoFeatures(corrupt).collect().sortBy(_.media_id)
    assert(out.length == 4)
    assert(out.count(_.decode_ok) == 1)
    assert(out.filter(!_.decode_ok).forall(f => f.width == -1 && f.sum_r == -1L))
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
