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
    ),

    // ------------------------------------------------------------------
    // Embedding drift monitor — the check a serving deployment runs
    // when a re-crawled/re-embedded corpus version lands: has each
    // label segment's embedding distribution MOVED enough to schedule
    // a quantizer re-fit (the action q157's recall report triggers
    // after the fact; this one warns before)? Version 1 is the prior
    // snapshot (vec_id % 4 ≠ 3), version 2 the current full corpus.
    // Per label, drift is the cross-multiplied L1 distance between
    // mean code vectors — Σ_i |s1_i·n2 − s2_i·n1|, the q151 trick of
    // clearing denominators so the whole statistic stays INTEGER and
    // oracle-exact (s·n is exactly n1·n2·|mean diff|). int64 headroom:
    // |s_i| ≤ 127·n, so terms are ≤ 127·n1·n2 — exact while
    // 127·n1·n2 < 2^63 (≈ 2.7·10⁸ rows per label per version;
    // beyond that, scale both sums by a common 2^k shift first).
    // Plan: two ArraySumLong aggregates (each one partial-agg'd
    // exchange of label-count × 64 longs — never a per-dimension row
    // explosion), then a label-keyed join of two tiny tables.
    QueryDef(
      "q163_embedding_drift",
      (s, dir) => {
        val sumv = udaf(new VectorAggregates.ArraySumLong(64))
        val codes = Tables(s, dir, "embeddings")
          .withColumn(
            "mx",
            greatest(
              expr(
                "aggregate(embedding, cast(0 AS double), (a, x) -> greatest(a, abs(cast(x AS double))))"
              ),
              lit(1e-30)
            )
          )
          .withColumn(
            "qc",
            expr("transform(embedding, x -> cast(round(cast(x AS double) * 127 / mx) AS bigint))")
          )
          .select("vec_id", "label", "qc")
        val v1 = codes
          .filter(col("vec_id") % 4 =!= 3)
          .groupBy("label")
          .agg(sumv(col("qc")).as("a"))
        val v2 = codes.groupBy("label").agg(sumv(col("qc")).as("b"))
        v1.join(v2, Seq("label"))
          .select(
            col("label"),
            col("a.n").as("n1"),
            col("b.n").as("n2"),
            expr(
              "aggregate(zip_with(a.sums, b.sums, (x, y) -> abs(x * b.n - y * a.n)), 0L, (acc, z) -> acc + z)"
            ).as("drift_num")
          )
          .orderBy("label")
      },
      Some("""WITH base AS (
          SELECT vec_id, label,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
                 greatest(list_max(list_transform(embedding,
                            x -> abs(CAST(x AS DOUBLE)))), 1e-30) AS mx
          FROM embeddings),
        coded AS (
          SELECT vec_id, label,
                 list_transform(v, x -> CAST(round(x * 127 / mx) AS BIGINT)) AS qc
          FROM base),
        idx AS (SELECT unnest(range(0, 64)) AS i),
        s1 AS (SELECT label, i.i, CAST(sum(qc[i.i + 1]) AS BIGINT) AS s
               FROM coded, idx i WHERE vec_id % 4 <> 3 GROUP BY 1, 2),
        s2 AS (SELECT label, i.i, CAST(sum(qc[i.i + 1]) AS BIGINT) AS s
               FROM coded, idx i GROUP BY 1, 2),
        n1 AS (SELECT label, count(*) AS n FROM coded WHERE vec_id % 4 <> 3 GROUP BY 1),
        n2 AS (SELECT label, count(*) AS n FROM coded GROUP BY 1)
        SELECT s1.label, n1.n AS n1, n2.n AS n2,
               CAST(sum(abs(s1.s * n2.n - s2.s * n1.n)) AS BIGINT) AS drift_num
        FROM s1
        JOIN s2 ON s1.label = s2.label AND s1.i = s2.i
        JOIN n1 ON n1.label = s1.label
        JOIN n2 ON n2.label = s1.label
        GROUP BY s1.label, n1.n, n2.n
        ORDER BY s1.label""")
    )
  )
}
