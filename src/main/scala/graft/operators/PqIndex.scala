package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (Jégou, Douze, Schmid, "Product Quantization
  * for Nearest Neighbor Search", TPAMI 2011) — the other classic ANN
  * compression beside IVF cells (IvfIndex/KnnJoin) and int8 scalar
  * codes (q147): the 64-dim vector is split into `m` = 8 subvectors of
  * 8 dims, each quantized against its own seeded 16-centroid codebook,
  * so a vector stores as 8 small codes (8 bytes — 32× smaller than the
  * float64 array) and distance is evaluated WITHOUT decompression by
  * summing per-subspace distances to the coded centroids (asymmetric
  * distance computation: exact query side, quantized corpus side).
  *
  * Spark shape: codebooks are driver-side literals (m·k·(d/m) = 1024
  * doubles — MB-scale far beyond this size), so ENCODING is a pure
  * projection (the assignCells trick per subspace — no join, no
  * shuffle) and the ADC scan is a broadcast of the ≤10 query vectors
  * over the coded corpus with the distance as one fused expression.
  * Candidates (top `candK` by ADC) are exact-cosine re-ranked, the
  * same contract as q147's int8 scan. Codebook cells are
  * implementation-defined (seeded MLlib KMeans) → consumers are
  * rows-only; with fixed seeds the whole path is deterministic.
  */
object PqIndex {

  /** Fit one seeded codebook per subspace. Returns (subspace index,
    * centroids as (cell, centroid) pairs).
    *
    * Training cost control (the fits are the whole build cost; encoding
    * is a projection): codebooks train on a deterministic quarter
    * SAMPLE of the corpus (`vec_id % 4 == 0`) — standard PQ practice
    * (Jégou et al. train on a held-out subset); 16 centroids per 8-dim
    * subspace saturate long before the full corpus. The sampled
    * training set is localCheckpointed ONCE and shared, and the eight
    * independent fits run as CONCURRENT Spark jobs (they contend for
    * nothing but executor slots) — together ~8× less wall than
    * sequential full-corpus fits, with the same fixed-seed determinism.
    */
  def fitCodebooks(
      emb: DataFrame,
      m: Int = 8,
      k: Int = 16,
      maxIter: Int = 5,
      seed: Long = 42L
  ): Seq[(Int, Seq[(Int, Seq[Double])])] = {
    val sample = emb.filter(col("vec_id") % 4 === 0).select("v").localCheckpoint()
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration
    val fits = (0 until m).map { sub =>
      Future {
        val dSub = sample.select(expr(s"slice(v, ${sub * 8 + 1}, 8)").as("v"))
        // distinct seed per subspace: identical seeds on near-identical
        // marginals would correlate the codebooks
        sub -> IvfIndex.fitCentroids(dSub, k = k, maxIter = maxIter, seed = seed + sub)
      }
    }
    Await.result(Future.sequence(fits), Duration.Inf).toSeq
  }

  /** Nearest-centroid code for one subspace as a pure projection
    * (struct array_min over centroid literals — IvfIndex.assignCells'
    * shape on the sliced subvector). */
  private def codeExpr(sub: Int, centroids: Seq[(Int, Seq[Double])]): Column = {
    val scores = centroids.map { case (i, c) =>
      val cv = typedlit(c)
      struct(
        aggregate(
          zip_with(expr(s"slice(v, ${sub * 8 + 1}, 8)"), cv, (x, y) => (x - y) * (x - y)),
          lit(0.0),
          (a, x) => a + x
        ).as("d2"),
        lit(i).as("cell")
      )
    }
    array_min(array(scores: _*)).getField("cell")
  }

  /** Encode `emb` (vec_id, v, norm) → (vec_id, v, norm, codes) with
    * `codes(sub)` the subspace-`sub` centroid id. Pure projection. */
  def encode(emb: DataFrame, codebooks: Seq[(Int, Seq[(Int, Seq[Double])])]): DataFrame =
    emb.withColumn("codes", array(codebooks.map { case (sub, c) => codeExpr(sub, c) }: _*))

  /** ADC distance from an exact query vector `qv` to a coded corpus
    * row: sum over subspaces of ||q_sub − C_sub[code]||². Codebook
    * lookup is element_at on a per-subspace nested-array literal —
    * shallow expression tree (one literal object per subspace). */
  private def adcExpr(codebooks: Seq[(Int, Seq[(Int, Seq[Double])])]): Column =
    codebooks
      .map { case (sub, cents) =>
        val table = typedlit(cents.sortBy(_._1).map(_._2))
        aggregate(
          zip_with(
            expr(s"slice(qv, ${sub * 8 + 1}, 8)"),
            element_at(table, element_at(col("codes"), sub + 1) + 1),
            (x, y) => (x - y) * (x - y)
          ),
          lit(0.0),
          (a, x) => a + x
        )
      }
      .reduce(_ + _)

  /** Probe: ADC-scan the coded corpus with the (broadcast, ≤10) query
    * set, keep `candK` candidates per query, exact-cosine re-rank to
    * `topK`. */
  def adcTopK(
      coded: DataFrame,
      probes: DataFrame,
      codebooks: Seq[(Int, Seq[(Int, Seq[Double])])],
      candK: Int = 50,
      topK: Int = 5
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wAdc = Window.partitionBy("q_id").orderBy(col("adc").asc, col("vec_id"))
    val wCos = Window.partitionBy("q_id").orderBy(col("cos").desc, col("vec_id"))
    coded
      .crossJoin(broadcast(probes))
      .filter(col("q_id") =!= col("vec_id"))
      .withColumn("adc", adcExpr(codebooks))
      .withColumn("crk", row_number().over(wAdc))
      .filter(col("crk") <= candK)
      .withColumn("cos", expr("cosine_sim(qv, v)"))
      .withColumn("rank", row_number().over(wCos).cast("long"))
      .filter(col("rank") <= topK)
      .select("q_id", "rank", "vec_id", "cos")
      .orderBy("q_id", "rank")
  }
}
