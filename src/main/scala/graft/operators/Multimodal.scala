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
  * The decode step itself is a STUB — this container ships no image/audio
  * codecs — replaced by a deterministic byte-histogram "feature
  * extractor" so the Spark-side contract (binary column in, fixed-dim
  * FLOAT vector + checksum out, batched per partition) is real and
  * tested.
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

  /** STUB decode + featurize. A production build replaces the body of
    * the per-record function with a real codec call; everything around
    * it (typed Dataset in/out, per-partition batching, fixed feature
    * dim) is the production shape.
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
