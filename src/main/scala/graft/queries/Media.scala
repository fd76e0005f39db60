package graft.queries

import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.operators.Multimodal

/** Multimodal operators exposed as named queries. The feature checksum
  * (q50) is engine-defined → rows-only with a spec; frame sampling and
  * resize (q62/q63) are deterministic byte decimations over ASCII
  * payloads, so DuckDB reproduces them with substring arithmetic and
  * they hash-compare exactly even though the Spark side runs the real
  * typed-Dataset binary plumbing.
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
    )
  )
}
