package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.operators.VectorAggregates

/** Custom-aggregate surface (SURVEY.md §2.3 E16): per-label embedding
  * centroids via a typed Aggregator registered as a udaf. Rows-only
  * (float centroid values are reduction-order-sensitive); exactness is
  * asserted against a brute-force computation in VectorAggregatesSpec.
  */
object Vectors {
  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q43_label_centroids",
      (s, dir) => {
        val mean = udaf(new VectorAggregates.ArrayMean(64))
        Tables(s, dir, "embeddings")
          .select(col("label"), expr("transform(embedding, x -> cast(x AS double))").as("v"))
          .groupBy("label")
          .agg(count(lit(1)).as("n"), mean(col("v")).as("centroid"))
          .select(
            col("label"),
            col("n"),
            size(col("centroid")).cast("long").as("dim"),
            element_at(col("centroid"), 1).as("c0"),
            element_at(col("centroid"), 2).as("c1"),
            sqrt(expr("aggregate(centroid, cast(0 AS double), (a, x) -> a + x*x)")).as("norm")
          )
          .orderBy("label")
      },
      None
    ),

    // ------------------------------------------------------------------
    // int8 symmetric quantization of the embedding column — the
    // ANN-serving prep step (4× memory cut before index build): each
    // vector is scaled by 127 / max|x| and rounded to [-127, 127]. The
    // query emits INTEGER per-vector reductions (first element, sum,
    // min, max, saturated count), so the oracle is exact: both engines
    // compute the identical float64 scale and apply the same
    // round-half-away-from-zero, hence identical int8 codes. The
    // quantization runs as the native codegen expression
    // `int8_quantize_stats` (functions/Int8Quantize — two fused passes,
    // no intermediate code array; Int8QuantizeSpec pins bit-equality to
    // the five-HOF formulation it replaces). Plan: pure map over the
    // vectors (one projection, no shuffle but the sorted output); at
    // 100 TB this runs as a scan-rewrite into a quantized copy of the
    // index shards.
    QueryDef(
      "q119_embedding_quantize",
      (s, dir) =>
        Tables(s, dir, "embeddings")
          .withColumn("st", expr("int8_quantize_stats(embedding)"))
          .select(
            col("vec_id"),
            col("label"),
            col("st.q0").as("q0"),
            col("st.q_sum").as("q_sum"),
            col("st.q_min").as("q_min"),
            col("st.q_max").as("q_max"),
            col("st.n_sat").as("n_sat")
          )
          .orderBy("vec_id"),
      Some("""WITH scaled AS (
          SELECT vec_id, label,
                 greatest(list_max(list_transform(embedding,
                            x -> abs(CAST(x AS DOUBLE)))), 1e-30) AS mx,
                 embedding
          FROM embeddings
        ), quant AS (
          SELECT vec_id, label,
                 list_transform(embedding,
                   x -> CAST(round(CAST(x AS DOUBLE) * 127 / mx) AS INTEGER)) AS q
          FROM scaled
        )
        SELECT vec_id, CAST(label AS INTEGER) AS label,
               q[1] AS q0,
               CAST(list_sum(q) AS INTEGER) AS q_sum,
               list_min(q) AS q_min,
               list_max(q) AS q_max,
               CAST(len(list_filter(q, x -> abs(x) = 127)) AS INTEGER) AS n_sat
        FROM quant ORDER BY vec_id""")
    )
  )
}
