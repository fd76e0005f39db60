package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal-column plumbing (training-data-pipeline brief): media
  * payloads travel as opaque BINARY columns with typed metadata; decode /
  * feature-extraction runs partition-wise over a typed Dataset so a real
  * decoder (libjpeg/ffmpeg via JNI, or an sidecar process) can be slotted
  * in per executor without changing the schema, partitioning, or the
  * surrounding plan.
  *
  * The IMAGE path is a real codec: [[syntheticImages]] encodes a
  * deterministic PNG per document and [[decodeImageFeatures]] decodes it
  * back with `javax.imageio` (JDK-standard, no external deps) and
  * reduces pixels to exact integer channel sums — oracle-checkable
  * because PNG is lossless, so the decoded pixels equal the generating
  * formula the oracle restates. The AUDIO path is equally real:
  * [[syntheticAudio]] writes 16-bit PCM WAV clips with the
  * `javax.sound.sampled` container writer and [[decodeAudioFeatures]]
  * parses them back (header, format negotiation, frame extraction) into
  * exact integer sample stats. The VIDEO path is real too:
  * [[syntheticVideos]] packs length-prefixed PNG frames behind a
  * container header and [[decodeVideoFeatures]] walks the container,
  * stride-samples frames by seeking over skipped length prefixes, and
  * decodes the kept frames with the real `javax.imageio` codec.
  * [[extractFeatures]] remains as the codec-free generic-binary
  * featurizer (byte histogram) for payloads with no registered codec;
  * its per-partition batching, fixed feature dim, and
  * binary-in/vector-out schema are the production shape.
  *
  * Scale posture: `mapPartitions` keeps decode calls batched per
  * partition (amortizing codec init), payload bytes never hit the
  * driver, and the output is columnar-friendly fixed-width vectors.
  */
object Multimodal {

  /** One media object: payload is the raw encoded bytes. */
  final case class MediaRecord(
      media_id: Long,
      media_type: String,
      payload: Array[Byte],
      declared_bytes: Long
  )

  /** Extracted features: fixed-dim vector + content checksum. */
  final case class MediaFeatures(
      media_id: Long,
      media_type: String,
      feat_dim: Int,
      features: Array[Float],
      checksum: Long
  )

  implicit private val mediaEnc: Encoder[MediaRecord] = Encoders.product[MediaRecord]
  implicit private val featEnc: Encoder[MediaFeatures] = Encoders.product[MediaFeatures]

  /** Synthesize a media table from `documents`: the UTF-8 bytes of
    * `text` stand in for encoded image payloads. At 100 TB the payload
    * column comes from parquet BINARY written by ingestion; the schema
    * here is identical.
    */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    Tables(spark, dir, "documents")
      .select(
        col("doc_id").as("media_id"),
        lit("image").as("media_type"),
        encode(col("text"), "UTF-8").as("payload"),
        col("n_chars").as("declared_bytes")
      )
      .as[MediaRecord]
  }

  /** Generic-binary featurizer (byte histogram): the fallback for
    * payloads whose codec is not registered — image, audio, AND video
    * all have real JDK codec paths now ([[decodeImageFeatures]],
    * [[decodeAudioFeatures]], [[decodeVideoFeatures]]). A production
    * build replaces the body of the per-record function with whatever
    * proprietary codec the payload needs; everything around it (typed
    * Dataset in/out, per-partition batching, fixed feature dim) is the
    * production shape.
    */
  def extractFeatures(ds: Dataset[MediaRecord], dim: Int = 16): Dataset[MediaFeatures] =
    ds.mapPartitions { it =>
      // per-partition init point: real impl opens the codec ONCE here
      it.map { m =>
        val counts = new Array[Int](dim)
        var i = 0
        while (i < m.payload.length) {
          counts((m.payload(i) & 0xff) % dim) += 1
          i += 1
        }
        val n = math.max(m.payload.length, 1).toFloat
        val feats = counts.map(_ / n)
        val checksum = m.payload.foldLeft(0L)((a, b) => a * 31 + (b & 0xff))
        MediaFeatures(m.media_id, m.media_type, dim, feats, checksum)
      }
    }

  /** Exact per-channel pixel sums of one decoded image. */
  final case class ImageFeatures(
      media_id: Long,
      decode_ok: Boolean,
      width: Int,
      height: Int,
      sum_r: Long,
      sum_g: Long,
      sum_b: Long
  )

  implicit private val imgEnc: Encoder[ImageFeatures] = Encoders.product[ImageFeatures]
  implicit private val longEnc: Encoder[Long] = Encoders.scalaLong

  /** One deterministic PNG payload per document: a w×h RGB image
    * (8 ≤ w,h ≤ 16, sized by doc_id) whose channel at (x, y) is a fixed
    * modular form of (x, y, doc_id) — encoded with the real
    * `javax.imageio` PNG writer inside `mapPartitions`. At 100 TB the
    * payload column comes from parquet BINARY written by ingestion; the
    * generator stands in for the scan, the codec work is real.
    */
  def syntheticImages(spark: SparkSession, dir: String): Dataset[MediaRecord] =
    Tables(spark, dir, "documents")
      .select(col("doc_id"))
      .as[Long]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false) // codec init: in-memory streams, no tmp-file cache
        it.map { id =>
          val w = (8 + id % 9).toInt
          val h = (8 + (id / 9) % 9).toInt
          val img =
            new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val r = ((3L * x + 5L * y + id) % 251L).toInt
              val g = ((7L * x + 11L * y + 2L * id) % 251L).toInt
              val b = ((13L * x + 17L * y + 3L * id) % 251L).toInt
              img.setRGB(x, y, (r << 16) | (g << 8) | b)
              x += 1
            }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          MediaRecord(id, "image/png", bos.toByteArray, bos.size().toLong)
        }
      }

  /** 2× image downscale through the REAL codec — the image-side twin
    * of [[downsampleAudio]]: decode PNG → nearest-neighbor resample
    * (output pixel (x, y) = input pixel (2x, 2y); floor dimensions) →
    * re-encode PNG. Nearest-neighbor rather than a Graphics2D
    * interpolation because NN is EXACTLY restatable — interpolated
    * resamplers are implementation-defined in their rounding, which
    * would forfeit the oracle; a production thumbnailer swaps the
    * kernel, the plumbing stays. Undecodable payloads become
    * `image/invalid` records that downstream decode reports as
    * `decode_ok = false` rows.
    */
  def downscaleImages(ds: Dataset[MediaRecord]): Dataset[MediaRecord] =
    ds.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { m =>
        try {
          val src = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(m.payload))
          require(src != null, "no registered reader for payload")
          val (w, h) = (src.getWidth / 2, src.getHeight / 2)
          require(w > 0 && h > 0, s"source ${src.getWidth}×${src.getHeight} too small to halve")
          val out =
            new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              out.setRGB(x, y, src.getRGB(2 * x, 2 * y))
              x += 1
            }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(out, "png", bos)
          MediaRecord(m.media_id, "image/png", bos.toByteArray, bos.size().toLong)
        } catch {
          case scala.util.control.NonFatal(_) =>
            MediaRecord(m.media_id, "image/invalid", Array.emptyByteArray, 0L)
        }
      }
    }

  /** REAL decode: `javax.imageio` reads each payload back into pixels
    * and reduces them to exact integer channel sums. Undecodable
    * payloads yield a `decode_ok = false` row (schema-stable error
    * channel) instead of failing the partition — at scale a corrupt
    * object must cost one row, not a stage retry loop.
    */
  def decodeImageFeatures(ds: Dataset[MediaRecord]): Dataset[ImageFeatures] =
    ds.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false) // per-partition codec init
      it.map { m =>
        // NonFatal, not just IOException: the JDK image readers throw
        // RuntimeExceptions (IllegalArgument, NegativeArraySize, …) on
        // malformed-but-recognized payloads — any of them must cost one
        // row, never a stage retry loop
        val img =
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(m.payload))
          catch { case scala.util.control.NonFatal(_) => null }
        if (img == null) ImageFeatures(m.media_id, decode_ok = false, -1, -1, -1L, -1L, -1L)
        else {
          var (sr, sg, sb) = (0L, 0L, 0L)
          var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) {
              val p = img.getRGB(x, y)
              sr += (p >> 16) & 0xff
              sg += (p >> 8) & 0xff
              sb += p & 0xff
              x += 1
            }
            y += 1
          }
          ImageFeatures(m.media_id, decode_ok = true, img.getWidth, img.getHeight, sr, sg, sb)
        }
      }
    }

  /** Exact integer sample stats of one decoded audio clip. */
  final case class AudioFeatures(
      media_id: Long,
      decode_ok: Boolean,
      sample_rate: Int,
      n_samples: Long,
      sum_s: Long,
      min_s: Int,
      max_s: Int,
      sum_abs: Long
  )

  implicit private val audEnc: Encoder[AudioFeatures] = Encoders.product[AudioFeatures]

  /** One deterministic WAV payload per document: mono 16-bit signed PCM
    * at 8 kHz with `64 + doc_id % 65` samples, sample i being the fixed
    * modular form `(7i + doc_id) mod 2001 - 1000` — encoded with the
    * real `javax.sound.sampled` WAV writer inside `mapPartitions`.
    * PCM-in-WAV is lossless, so the decoded samples equal the
    * generating formula the oracle restates.
    */
  def syntheticAudio(spark: SparkSession, dir: String): Dataset[MediaRecord] =
    Tables(spark, dir, "documents")
      .select(col("doc_id"))
      .as[Long]
      .mapPartitions { it =>
        // per-partition codec init point: the WAV container writer is
        // stateless, but a compressed codec would open here once
        val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
        it.map { id =>
          val n = (64 + id % 65).toInt
          val pcm = new Array[Byte](n * 2) // little-endian per fmt
          var i = 0
          while (i < n) {
            val v = ((7L * i + id) % 2001L - 1000L).toShort
            pcm(2 * i) = (v & 0xff).toByte
            pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
            i += 1
          }
          val ais = new javax.sound.sampled.AudioInputStream(
            new java.io.ByteArrayInputStream(pcm),
            fmt,
            n.toLong
          )
          val bos = new java.io.ByteArrayOutputStream()
          javax.sound.sampled.AudioSystem
            .write(ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
          MediaRecord(id, "audio/wav", bos.toByteArray, bos.size().toLong)
        }
      }

  /** 2× audio downsample through the REAL codec — the resample/
    * feature-extraction shape of a multimodal pipeline (decode →
    * transform PCM → re-encode), with the simplest resampler whose
    * output is exactly restatable: boxcar decimation. Each adjacent
    * sample pair averages to one output sample (floorDiv — exact
    * integer semantics, trailing odd sample dropped) and the result
    * re-encodes as WAV at half the rate with the same
    * `javax.sound.sampled` writer. A production resampler would
    * window-sinc here; the Spark-side plumbing — binary in, binary
    * out, codec init per partition, error-as-data — is identical.
    * Undecodable payloads become `audio/invalid` records (empty
    * payload), which downstream [[decodeAudioFeatures]] reports as
    * `decode_ok = false` rows — one bad clip never retries a stage.
    */
  def downsampleAudio(ds: Dataset[MediaRecord]): Dataset[MediaRecord] =
    ds.mapPartitions { it =>
      it.map { m =>
        try {
          val ais = javax.sound.sampled.AudioSystem
            .getAudioInputStream(new java.io.ByteArrayInputStream(m.payload))
          val fmt = ais.getFormat
          val bytes = ais.readAllBytes()
          require(
            fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 &&
              fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
              !fmt.isBigEndian,
            s"unsupported frame format $fmt"
          )
          val n = bytes.length / fmt.getFrameSize
          val half = n / 2
          val out = new Array[Byte](half * 2)
          var k = 0
          while (k < half) {
            val a = (((bytes(4 * k + 1) & 0xff) << 8) | (bytes(4 * k) & 0xff)).toShort.toInt
            val b = (((bytes(4 * k + 3) & 0xff) << 8) | (bytes(4 * k + 2) & 0xff)).toShort.toInt
            val v = Math.floorDiv(a + b, 2).toShort
            out(2 * k) = (v & 0xff).toByte
            out(2 * k + 1) = ((v >> 8) & 0xff).toByte
            k += 1
          }
          val halfFmt =
            new javax.sound.sampled.AudioFormat(fmt.getSampleRate / 2, 16, 1, true, false)
          val outAis = new javax.sound.sampled.AudioInputStream(
            new java.io.ByteArrayInputStream(out),
            halfFmt,
            half.toLong
          )
          val bos = new java.io.ByteArrayOutputStream()
          javax.sound.sampled.AudioSystem
            .write(outAis, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
          MediaRecord(m.media_id, "audio/wav", bos.toByteArray, bos.size().toLong)
        } catch {
          case scala.util.control.NonFatal(_) =>
            MediaRecord(m.media_id, "audio/invalid", Array.emptyByteArray, 0L)
        }
      }
    }

  /** REAL audio decode: `javax.sound.sampled` parses each WAV payload
    * (container header, format negotiation, frame extraction) and the
    * PCM frames reduce to exact integer sample stats. Same error
    * contract as [[decodeImageFeatures]]: an undecodable payload costs
    * one `decode_ok = false` row, never a stage retry loop.
    */
  def decodeAudioFeatures(ds: Dataset[MediaRecord]): Dataset[AudioFeatures] =
    ds.mapPartitions { it =>
      it.map { m =>
        val decoded =
          try {
            val ais = javax.sound.sampled.AudioSystem
              .getAudioInputStream(new java.io.ByteArrayInputStream(m.payload))
            val fmt = ais.getFormat
            val bytes = ais.readAllBytes()
            require(
              fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 &&
                fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
              s"unsupported frame format $fmt"
            )
            val n = bytes.length / fmt.getFrameSize
            var (sum, sabs) = (0L, 0L)
            var (mn, mx) = (Int.MaxValue, Int.MinValue)
            var i = 0
            while (i < n) {
              val (b0, b1) = (bytes(2 * i) & 0xff, bytes(2 * i + 1) & 0xff)
              val v =
                (if (fmt.isBigEndian) (b0 << 8) | b1 else (b1 << 8) | b0).toShort.toInt
              sum += v
              sabs += math.abs(v)
              if (v < mn) mn = v
              if (v > mx) mx = v
              i += 1
            }
            Some(
              AudioFeatures(m.media_id, decode_ok = true, fmt.getSampleRate.toInt, n.toLong, sum, mn, mx, sabs)
            )
          } catch { case scala.util.control.NonFatal(_) => None }
        decoded.getOrElse(
          AudioFeatures(m.media_id, decode_ok = false, -1, -1L, -1L, -1, -1, -1L)
        )
      }
    }

  /** Exact per-channel pixel sums over the sampled frames of one video. */
  final case class VideoFeatures(
      media_id: Long,
      decode_ok: Boolean,
      n_frames: Int,
      n_sampled: Int,
      width: Int,
      height: Int,
      sum_r: Long,
      sum_g: Long,
      sum_b: Long
  )

  implicit private val vidEnc: Encoder[VideoFeatures] = Encoders.product[VideoFeatures]

  /** Container magic for the frame-packed video format: 4 ASCII bytes,
    * then a big-endian int32 frame count, then per frame a big-endian
    * int32 byte length followed by that many bytes of a REAL PNG
    * payload. Length-prefixed frame packing is the shape of every
    * production video container (an MP4 `mdat` holds length-prefixed
    * NAL units); the per-frame codec here is the JDK's PNG instead of
    * H.264 only because the JDK ships no video codec — the container
    * parse, frame walk, stride sampling, and per-frame decode are the
    * production video path, and every stage is real code.
    */
  private val VideoMagic: Array[Byte] = "GFV1".getBytes("US-ASCII")

  /** One deterministic frame-packed video per document: `2 + id % 3`
    * frames of a w×h RGB PNG (8 ≤ w,h ≤ 12, sized by doc_id), pixel
    * (x, y) of frame f being a fixed modular form of (x, y, f, id) —
    * each frame encoded with the real `javax.imageio` PNG writer, then
    * packed length-prefixed behind the [[VideoMagic]] header. PNG is
    * lossless, so the decoded pixels equal the generating formula the
    * oracle restates.
    */
  def syntheticVideos(spark: SparkSession, dir: String): Dataset[MediaRecord] =
    Tables(spark, dir, "documents")
      .select(col("doc_id"))
      .as[Long]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false) // codec init: in-memory streams
        it.map { id =>
          val w = (8 + id % 5).toInt
          val h = (8 + (id / 5) % 5).toInt
          val nFrames = (2 + id % 3).toInt
          val bos = new java.io.ByteArrayOutputStream()
          val out = new java.io.DataOutputStream(bos)
          out.write(VideoMagic)
          out.writeInt(nFrames)
          var f = 0
          while (f < nFrames) {
            val img =
              new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val r = ((3L * x + 5L * y + 19L * f + id) % 251L).toInt
                val g = ((7L * x + 11L * y + 23L * f + 2L * id) % 251L).toInt
                val b = ((13L * x + 17L * y + 29L * f + 3L * id) % 251L).toInt
                img.setRGB(x, y, (r << 16) | (g << 8) | b)
                x += 1
              }
              y += 1
            }
            val frameBos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(img, "png", frameBos)
            out.writeInt(frameBos.size())
            frameBos.writeTo(out)
            f += 1
          }
          out.flush()
          MediaRecord(id, "video/gfv1", bos.toByteArray, bos.size().toLong)
        }
      }

  /** REAL video decode: walk the length-prefixed container, decode every
    * `stride`-th frame with `javax.imageio`, and reduce the sampled
    * frames to exact integer channel sums. Frame sampling happens at the
    * CONTAINER level — skipped frames are seeked over by their length
    * prefix and never handed to the pixel codec, which is the whole
    * point of stride sampling at 100 TB (decode cost scales with frames
    * kept, not frames stored). Same error contract as the other codecs:
    * a malformed container or frame costs one `decode_ok = false` row,
    * never a stage retry loop.
    */
  def decodeVideoFeatures(ds: Dataset[MediaRecord], stride: Int = 2): Dataset[VideoFeatures] =
    ds.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false) // per-partition codec init
      it.map { m =>
        try {
          val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(m.payload))
          val magic = new Array[Byte](4)
          in.readFully(magic)
          require(java.util.Arrays.equals(magic, VideoMagic), "bad container magic")
          val nFrames = in.readInt()
          require(nFrames >= 0, "negative frame count")
          var (sr, sg, sb) = (0L, 0L, 0L)
          var (w, h) = (-1, -1)
          var sampled = 0
          var f = 0
          while (f < nFrames) {
            val len = in.readInt()
            require(len >= 0, "negative frame length")
            if (f % stride == 0) {
              val bytes = new Array[Byte](len)
              in.readFully(bytes)
              val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
              require(img != null, "undecodable frame")
              require(
                w == -1 || (w == img.getWidth && h == img.getHeight),
                "frame size drift within one video"
              )
              w = img.getWidth
              h = img.getHeight
              var y = 0
              while (y < h) {
                var x = 0
                while (x < w) {
                  val p = img.getRGB(x, y)
                  sr += (p >> 16) & 0xff
                  sg += (p >> 8) & 0xff
                  sb += p & 0xff
                  x += 1
                }
                y += 1
              }
              sampled += 1
            } else {
              in.skipNBytes(len.toLong) // container-level seek: codec never sees this frame
            }
            f += 1
          }
          VideoFeatures(m.media_id, decode_ok = true, nFrames, sampled, w, h, sr, sg, sb)
        } catch {
          case scala.util.control.NonFatal(_) =>
            VideoFeatures(m.media_id, decode_ok = false, -1, -1, -1, -1, -1L, -1L, -1L)
        }
      }
    }

  /** One sampled frame of a media payload. */
  final case class MediaFrame(
      media_id: Long,
      frame_idx: Long,
      frame_len: Int,
      frame_text: String
  )

  implicit private val frameEnc: Encoder[MediaFrame] = Encoders.product[MediaFrame]

  /** Frame sampling: treat the payload as fixed-width frames and emit
    * every `stride`-th one — the video-pipeline primitive (decode is
    * stubbed: a real build hands each frame to a codec; the row-per-frame
    * generator shape, offsets, and batching are the production plumbing).
    * Payloads are ASCII here so the emitted frame bytes round-trip as
    * text, which keeps the operator oracle-checkable.
    */
  def sampleFrames(
      ds: Dataset[MediaRecord],
      frameBytes: Int = 32,
      stride: Int = 4
  ): Dataset[MediaFrame] =
    ds.flatMap { m =>
      val step = frameBytes * stride
      Iterator
        .from(0)
        .map(j => j * step)
        .takeWhile(_ < m.payload.length)
        .zipWithIndex
        .map { case (off, j) =>
          val end = math.min(off + frameBytes, m.payload.length)
          val bytes = java.util.Arrays.copyOfRange(m.payload, off, end)
          MediaFrame(m.media_id, j.toLong, end - off, new String(bytes, "UTF-8"))
        }
    }

  /** A payload after stub "resize": decimate to ≤ `targetBytes` by
    * stride sampling. Real builds swap the body for a scaler; schema
    * (binary in / binary out + updated metadata) is the contract.
    */
  def resize(ds: Dataset[MediaRecord], targetBytes: Int = 16): Dataset[MediaRecord] =
    ds.map { m =>
      val n = m.payload.length
      val step = math.max(1, (n + targetBytes - 1) / targetBytes)
      val out = Array.range(0, n, step).map(m.payload)
      MediaRecord(m.media_id, m.media_type, out, out.length.toLong)
    }

  /** Flat, oracle-friendly projection of the feature table. */
  def featureSummary(spark: SparkSession, dir: String): DataFrame = {
    val feats = extractFeatures(mediaTable(spark, dir))
    feats
      .select(
        col("media_id"),
        col("media_type"),
        col("feat_dim"),
        col("checksum"),
        element_at(col("features"), 1).cast("double").as("f0")
      )
      .orderBy("media_id")
  }
}
