package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.operators.{Pca, VectorAggregates}

/** Spectral statistics over the embedding corpus: exact integer
  * moments (q160) and the PCA built on them (q161). The division of
  * labor is the engine's standard index-build pattern — data-scaled
  * work is one partial-agg'd aggregate, model-scaled math runs on the
  * driver, and the model returns to the data as broadcast literals in
  * an exchange-free projection (see operators/Pca.scala).
  */
object Spectral {

  private val Dim = 64

  /** int8 codes per q119's exact formula — the shared quantization
    * whose integer exactness is what makes the moment matrix (and so
    * the whole PCA input) engine-independent.
    */
  private def coded(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables(s, dir, "embeddings")
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

  val defs: Seq[QueryDef] = Seq(
    // ------------------------------------------------------------------
    // Exact integer second-moment matrix of the int8-coded corpus —
    // the distributed half of PCA/whitening, emitted as the upper
    // triangle (i ≤ j) with element sums and count so a consumer can
    // form covariance n·S − m·mᵀ at any scaling it likes. ONE pass,
    // ONE exchange: the IntOuterProduct aggregate reduces every map
    // partition to a single 2080+64-cell buffer before the shuffle —
    // never dim² exploded rows (a 4096× row multiplication at 100 TB).
    // The triangle unpacks to rows in a post-aggregate projection of
    // the one result row. Integer arithmetic end to end ⇒ ORACLE-EXACT
    // (the oracle recomputes the same cells by brute-force unnest —
    // fine at gate scale, the plan this aggregate exists to avoid).
    QueryDef(
      "q160_code_moments",
      (s, dir) => {
        val op = udaf(new VectorAggregates.IntOuterProduct(Dim))
        coded(s, dir)
          .groupBy()
          .agg(op(col("qc")).as("m"))
          .select(col("m.upper").as("u"), col("m.sums").as("ms"), col("m.n").as("n"))
          .select(
            explode(
              expr(
                s"""flatten(transform(sequence(0, ${Dim - 1}), i ->
                   transform(sequence(i, ${Dim - 1}), j ->
                     struct(cast(i AS bigint) AS i, cast(j AS bigint) AS j,
                            u[cast(i * $Dim - i * (i - 1) div 2 + j - i AS int)] AS s,
                            ms[i] AS mi, ms[j] AS mj, n AS n))))"""
              )
            ).as("e")
          )
          .select("e.i", "e.j", "e.s", "e.mi", "e.mj", "e.n")
          .orderBy("i", "j")
      },
      Some(s"""WITH base AS (
          SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
                 greatest(list_max(list_transform(embedding,
                            x -> abs(CAST(x AS DOUBLE)))), 1e-30) AS mx
          FROM embeddings),
        coded AS (
          SELECT vec_id,
                 list_transform(v, x -> CAST(round(x * 127 / mx) AS BIGINT)) AS qc
          FROM base),
        idx AS (SELECT unnest(range(0, $Dim)) AS i),
        cells AS (
          SELECT i.i, j.i AS j, CAST(sum(qc[i.i + 1] * qc[j.i + 1]) AS BIGINT) AS s
          FROM coded, idx i, idx j WHERE j.i >= i.i GROUP BY 1, 2),
        sums AS (
          SELECT i.i, CAST(sum(qc[i.i + 1]) AS BIGINT) AS m
          FROM coded, idx i GROUP BY 1),
        nn AS (SELECT count(*) AS n FROM coded)
        SELECT c.i, c.j, c.s, si.m AS mi, sj.m AS mj, nn.n AS n
        FROM cells c
        JOIN sums si ON si.i = c.i
        JOIN sums sj ON sj.i = c.j
        CROSS JOIN nn
        ORDER BY c.i, c.j""")
    ),

    // ------------------------------------------------------------------
    // PCA projection — the dimensionality-reduction pass an embedding
    // pipeline runs before indexing (and the whitening ANN literature
    // pairs with PQ): covariance from q160's exact integer moments,
    // eigensolved by the deterministic driver-side Jacobi
    // (operators/Pca), corpus projected onto the top 4 components as
    // a BROADCAST-LITERAL projection — like the IVF centroid
    // assignment, applying the model is exchange-free; the only
    // aggregate is the one moment pass. Rows-only: eigenvector floats
    // are ours alone — PcaSpec pins orthonormality, the eigenproblem
    // residual, descending eigenvalues, a plain-Scala projection
    // recompute, and bit-stable determinism across runs.
    QueryDef(
      "q161_pca_project",
      (s, dir) => {
        val op = udaf(new VectorAggregates.IntOuterProduct(Dim))
        val cd = coded(s, dir)
        val m = cd
          .groupBy()
          .agg(op(col("qc")).as("m"))
          .select(col("m.upper"), col("m.sums"), col("m.n"))
          .head()
        val upper = m.getSeq[Long](0).toArray
        val sums = m.getSeq[Long](1).toArray
        val n = m.getLong(2)
        val cov = Pca.covarianceFromMoments(upper, sums, n, Dim)
        val (_, vecs) = Pca.jacobiEigen(cov)
        val mean = sums.map(_.toDouble / n)
        val projections = (0 until 4).map { k =>
          val vk = vecs(k)
          val arr = array(vk.toIndexedSeq.map(lit): _*)
          val center = vk.zip(mean).map { case (a, b) => a * b }.sum
          (aggregate(
            zip_with(col("qc"), arr, (x, c) => x * c),
            lit(0.0),
            (acc, y) => acc + y
          ) - lit(center)).as(s"p${k + 1}")
        }
        cd.select(col("vec_id") +: col("label") +: projections: _*)
          .orderBy("vec_id")
      },
      None
    )
  )
}
