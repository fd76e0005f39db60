package graft.queries

import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.operators.Multimodal

/** Multimodal operators exposed as named queries. The feature checksum
  * (q50) is engine-defined → rows-only with a spec; frame sampling and
  * resize (q62/q63) are deterministic byte decimations over ASCII
  * payloads, so DuckDB reproduces them with substring arithmetic and
  * they hash-compare exactly even though the Spark side runs the real
  * typed-Dataset binary plumbing. q114 closes the round-6 codec gap:
  * a REAL `javax.imageio` PNG encode→decode round trip whose exact
  * pixel sums the oracle restates analytically — a lost bit anywhere in
  * the codec path breaks the hash. q129 does the same for audio: a REAL
  * `javax.sound.sampled` WAV encode→decode round trip with an exact
  * integer sample-sum oracle.
  */
object Media {
  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q50_multimodal_features",
      (s, dir) => Multimodal.featureSummary(s, dir),
      None
    ),
    // video-shaped generator: payload → every 4th 32-byte frame
    QueryDef(
      "q62_frame_sample",
      (s, dir) =>
        Multimodal
          .sampleFrames(Multimodal.mediaTable(s, dir))
          .toDF()
          .orderBy("media_id", "frame_idx"),
      Some("""SELECT doc_id AS media_id, CAST(j AS BIGINT) AS frame_idx,
          CAST(least(32, length(text) - j*128) AS INTEGER) AS frame_len,
          substring(text, CAST(j*128 + 1 AS INTEGER), 32) AS frame_text
        FROM (SELECT doc_id, text,
                     unnest(range(0, (length(text) + 127) // 128)) AS j
              FROM documents)
        ORDER BY media_id, frame_idx""")
    ),
    // image-shaped map: payload decimated to ≤16 sample bytes
    QueryDef(
      "q63_resize",
      (s, dir) =>
        Multimodal
          .resize(Multimodal.mediaTable(s, dir))
          .toDF()
          .select(
            col("media_id"),
            col("declared_bytes").cast("long").as("resized_len"),
            decode(col("payload"), "UTF-8").as("resized_text")
          )
          .orderBy("media_id"),
      Some("""WITH d AS (
          SELECT doc_id, text, length(text) AS n,
                 greatest(1, (length(text) + 15) // 16) AS step
          FROM documents)
        SELECT doc_id AS media_id,
          CAST((n + step - 1) // step AS BIGINT) AS resized_len,
          array_to_string(
            list_transform(range(0, (n + step - 1) // step),
                           i -> substring(text, CAST(i*step + 1 AS INTEGER), 1)), '') AS resized_text
        FROM d ORDER BY media_id""")
    ),
    // real-codec image decode: per-document synthetic PNG (pixel (x,y)
    // of image id is a fixed modular form) encoded AND decoded with
    // javax.imageio; the query emits the decoded width/height and exact
    // per-channel pixel sums. The oracle computes the same sums from
    // the generating formula over a 16×16 spine filtered to each
    // image's true size — PNG is lossless, so codec-correct ⟺ hash
    // match. decode_ok rows are filtered (then dropped) so a corrupt
    // decode surfaces as a row-count mismatch, not a silent skew.
    QueryDef(
      "q114_image_decode",
      (s, dir) =>
        Multimodal
          .decodeImageFeatures(Multimodal.syntheticImages(s, dir))
          .toDF()
          .filter(col("decode_ok"))
          .select("media_id", "width", "height", "sum_r", "sum_g", "sum_b")
          .orderBy("media_id"),
      Some("""WITH px AS (SELECT a.x, b.y FROM (SELECT unnest(range(16)) AS x) a,
                   (SELECT unnest(range(16)) AS y) b)
        SELECT doc_id AS media_id,
          CAST(8 + doc_id % 9 AS INTEGER) AS width,
          CAST(8 + (doc_id // 9) % 9 AS INTEGER) AS height,
          CAST(sum((3*x + 5*y + doc_id) % 251) AS BIGINT) AS sum_r,
          CAST(sum((7*x + 11*y + 2*doc_id) % 251) AS BIGINT) AS sum_g,
          CAST(sum((13*x + 17*y + 3*doc_id) % 251) AS BIGINT) AS sum_b
        FROM documents, px
        WHERE x < 8 + doc_id % 9 AND y < 8 + (doc_id // 9) % 9
        GROUP BY doc_id ORDER BY media_id""")
    ),
    // real-codec image downscale: q114's PNGs decoded, nearest-neighbor
    // resampled 2× (output (x,y) = input (2x,2y), floor dims), PNG
    // RE-ENCODED, decoded again, reduced to exact channel sums — the
    // thumbnail pass of a multimodal ingest as a full
    // decode→transform→encode→decode round trip. The oracle restates
    // the sampled grid analytically (formula at (2x, 2y) over the
    // halved spine), so either codec pass or the resampler breaking
    // breaks the hash.
    QueryDef(
      "q172_image_downscale",
      (s, dir) =>
        Multimodal
          .decodeImageFeatures(
            Multimodal.downscaleImages(Multimodal.syntheticImages(s, dir))
          )
          .toDF()
          .filter(col("decode_ok"))
          .select("media_id", "width", "height", "sum_r", "sum_g", "sum_b")
          .orderBy("media_id"),
      Some("""WITH px AS (SELECT a.x, b.y FROM (SELECT unnest(range(8)) AS x) a,
                   (SELECT unnest(range(8)) AS y) b)
        SELECT doc_id AS media_id,
          CAST((8 + doc_id % 9) // 2 AS INTEGER) AS width,
          CAST((8 + (doc_id // 9) % 9) // 2 AS INTEGER) AS height,
          CAST(sum((3*(2*x) + 5*(2*y) + doc_id) % 251) AS BIGINT) AS sum_r,
          CAST(sum((7*(2*x) + 11*(2*y) + 2*doc_id) % 251) AS BIGINT) AS sum_g,
          CAST(sum((13*(2*x) + 17*(2*y) + 3*doc_id) % 251) AS BIGINT) AS sum_b
        FROM documents, px
        WHERE x < (8 + doc_id % 9) // 2 AND y < (8 + (doc_id // 9) % 9) // 2
        GROUP BY doc_id ORDER BY media_id""")
    ),
    // real-codec audio decode: per-document synthetic WAV (mono 16-bit
    // PCM, sample i of clip id is a fixed modular form) encoded AND
    // decoded with javax.sound.sampled; the query emits the decoded
    // sample rate, count, and exact integer sample sums. PCM-in-WAV is
    // lossless, so the oracle restates the generating formula over a
    // 128-sample spine filtered to each clip's true length —
    // codec-correct ⟺ hash match. decode_ok rows are filtered (then
    // dropped) so a corrupt decode surfaces as a row-count mismatch.
    QueryDef(
      "q129_audio_decode",
      (s, dir) =>
        Multimodal
          .decodeAudioFeatures(Multimodal.syntheticAudio(s, dir))
          .toDF()
          .filter(col("decode_ok"))
          .select("media_id", "sample_rate", "n_samples", "sum_s", "min_s", "max_s", "sum_abs")
          .orderBy("media_id"),
      Some("""WITH sp AS (SELECT unnest(range(128)) AS i)
        SELECT doc_id AS media_id,
          CAST(8000 AS INTEGER) AS sample_rate,
          CAST(64 + doc_id % 65 AS BIGINT) AS n_samples,
          CAST(sum((7*i + doc_id) % 2001 - 1000) AS BIGINT) AS sum_s,
          CAST(min((7*i + doc_id) % 2001 - 1000) AS INTEGER) AS min_s,
          CAST(max((7*i + doc_id) % 2001 - 1000) AS INTEGER) AS max_s,
          CAST(sum(abs((7*i + doc_id) % 2001 - 1000)) AS BIGINT) AS sum_abs
        FROM documents, sp
        WHERE i < 64 + doc_id % 65
        GROUP BY doc_id ORDER BY media_id""")
    ),
    // real-codec audio downsample: q129's clips decoded, boxcar-
    // decimated 2× (adjacent pairs floorDiv-averaged, trailing odd
    // sample dropped), RE-ENCODED as 4 kHz WAV with the same javax
    // writer, decoded AGAIN, and reduced to exact sample stats — a
    // full decode→transform→encode→decode round trip, so a defect
    // anywhere in either codec pass or the resampler breaks the hash.
    // The oracle restates the decimation analytically over the
    // generating formula (half-rate spine, floor((s₂ₖ+s₂ₖ₊₁)/2)).
    QueryDef(
      "q164_audio_downsample",
      (s, dir) =>
        Multimodal
          .decodeAudioFeatures(
            Multimodal.downsampleAudio(Multimodal.syntheticAudio(s, dir))
          )
          .toDF()
          .filter(col("decode_ok"))
          .select("media_id", "sample_rate", "n_samples", "sum_s", "min_s", "max_s", "sum_abs")
          .orderBy("media_id"),
      Some("""WITH sp AS (SELECT unnest(range(64)) AS k),
        dec AS (
          SELECT doc_id, k,
            CAST(floor((((7*(2*k) + doc_id) % 2001 - 1000)
                      + ((7*(2*k+1) + doc_id) % 2001 - 1000)) / 2.0) AS BIGINT) AS v
          FROM documents, sp
          WHERE k < (64 + doc_id % 65) // 2)
        SELECT doc_id AS media_id,
          CAST(4000 AS INTEGER) AS sample_rate,
          CAST((64 + doc_id % 65) // 2 AS BIGINT) AS n_samples,
          CAST(sum(v) AS BIGINT) AS sum_s,
          CAST(min(v) AS INTEGER) AS min_s,
          CAST(max(v) AS INTEGER) AS max_s,
          CAST(sum(abs(v)) AS BIGINT) AS sum_abs
        FROM dec GROUP BY doc_id ORDER BY media_id""")
    ),
    // real-codec video decode: per-document frame-packed container
    // (length-prefixed REAL PNG frames behind a magic header; pixel
    // (x, y) of frame f is a fixed modular form), decoded by walking
    // the container and handing every 2nd frame to javax.imageio while
    // SEEKING over skipped frames via their length prefix — decode cost
    // scales with frames kept, not frames stored. The oracle restates
    // the generating formula over a 12×12×{0,2} spine filtered to each
    // video's true (width, height, frame count) — PNG frames are
    // lossless, so container-walk-and-codec-correct ⟺ hash match.
    // decode_ok rows are filtered (then dropped) so a corrupt decode
    // surfaces as a row-count mismatch, not a silent skew.
    QueryDef(
      "q134_video_decode",
      (s, dir) =>
        Multimodal
          .decodeVideoFeatures(Multimodal.syntheticVideos(s, dir))
          .toDF()
          .filter(col("decode_ok"))
          .select("media_id", "n_frames", "n_sampled", "width", "height", "sum_r", "sum_g", "sum_b")
          .orderBy("media_id"),
      Some("""WITH px AS (SELECT a.x, b.y, c.f
                FROM (SELECT unnest(range(12)) AS x) a,
                     (SELECT unnest(range(12)) AS y) b,
                     (SELECT unnest([0, 2]) AS f) c)
        SELECT doc_id AS media_id,
          CAST(2 + doc_id % 3 AS INTEGER) AS n_frames,
          CAST((3 + doc_id % 3) // 2 AS INTEGER) AS n_sampled,
          CAST(8 + doc_id % 5 AS INTEGER) AS width,
          CAST(8 + (doc_id // 5) % 5 AS INTEGER) AS height,
          CAST(sum((3*x + 5*y + 19*f + doc_id) % 251) AS BIGINT) AS sum_r,
          CAST(sum((7*x + 11*y + 23*f + 2*doc_id) % 251) AS BIGINT) AS sum_g,
          CAST(sum((13*x + 17*y + 29*f + 3*doc_id) % 251) AS BIGINT) AS sum_b
        FROM documents, px
        WHERE x < 8 + doc_id % 5
          AND y < 8 + (doc_id // 5) % 5
          AND f < 2 + doc_id % 3
        GROUP BY doc_id ORDER BY media_id""")
    )
  )
}
