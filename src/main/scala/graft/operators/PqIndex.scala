package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Product quantization (Jégou, Douze, Schmid, "Product Quantization
  * for Nearest Neighbor Search", TPAMI 2011) — the other classic ANN
  * compression beside IVF cells (IvfIndex/KnnJoin) and int8 scalar
  * codes (q147): the `dim`-dim vector is split into `m` subvectors of
  * `dim/m` dims, each quantized against its own seeded k-centroid
  * codebook, so a vector stores as m small codes (m bytes — for the
  * default 8×16 over 64 float64 dims, 32× smaller than the raw array)
  * and distance is evaluated WITHOUT decompression by summing
  * per-subspace distances to the coded centroids (asymmetric distance
  * computation: exact query side, quantized corpus side).
  *
  * Spark shape: codebooks are driver-side literals (m·k·(dim/m) = 1024
  * doubles — MB-scale far beyond this size), so ENCODING is a pure
  * projection (the assignCells trick per subspace — no join, no
  * shuffle) and the ADC scan is a broadcast of the ≤10 query vectors
  * over the coded corpus with the distance as one fused expression.
  * Candidates (top `candK` by ADC) come from a bounded
  * `top_k_structs` heap per query — map-side partial reduction, no
  * corpus-scaled exchange or sort — and are exact-cosine re-ranked,
  * the same contract as q147's int8 scan. Codebook cells are
  * implementation-defined (seeded MLlib KMeans) → consumers are
  * rows-only; with fixed seeds the whole path is deterministic.
  *
  * Persistence ([[save]]/[[append]]/[[loadCodebooks]]): codebooks are
  * the fitted model — written once as a tiny parquet table beside the
  * coded corpus, so later ingest batches encode through the SAME
  * codebooks as a pure projection and `append` into the coded layout
  * (IvfIndex.append's fit-once / assign-anywhere contract): a vector
  * gets bit-identical codes whether it arrived in the initial build or
  * any later batch, which is what makes incremental maintenance
  * lossless vs a rebuild (PqPersistSpec pins it).
  */
object PqIndex {

  /** Fit one seeded codebook per subspace. Returns (subspace index,
    * centroids as (cell, centroid) pairs), subspaces ascending.
    *
    * `dim` must split evenly into `m` subvectors; the subvector width
    * is derived (dim/m), so a non-default geometry trains over the
    * whole vector or fails loudly — never silently codes a prefix.
    *
    * Training cost control (the fits are the whole build cost; encoding
    * is a projection): codebooks train on a deterministic quarter
    * SAMPLE of the corpus (`vec_id % 4 == 0`) — standard PQ practice
    * (Jégou et al. train on a held-out subset); 16 centroids per 8-dim
    * subspace saturate long before the full corpus. The sampled
    * training set is localCheckpointed ONCE and shared, and the m
    * independent fits run as CONCURRENT Spark jobs (they contend for
    * nothing but executor slots) — together ~m× less wall than
    * sequential full-corpus fits, with the same fixed-seed determinism.
    *
    * The concurrent fits are TIME-BOXED: all m run under one Spark job
    * group and the await is bounded by `timeout`; on expiry the job
    * group is cancelled (interrupting the running fits) and the build
    * fails loudly — a hung fit can never wedge the driver on an
    * unbounded await (PqPersistSpec pins the bounded failure).
    */
  def fitCodebooks(
      emb: DataFrame,
      m: Int = 8,
      k: Int = 16,
      dim: Int = 64,
      maxIter: Int = 5,
      seed: Long = 42L,
      timeout: scala.concurrent.duration.Duration =
        scala.concurrent.duration.Duration(10, "min")
  ): Seq[(Int, Seq[(Int, Seq[Double])])] = {
    require(m > 0 && dim % m == 0, s"dim=$dim must split evenly into m=$m subvectors")
    val w = dim / m
    val spark = emb.sparkSession
    val sample = emb.filter(col("vec_id") % 4 === 0).select("v").localCheckpoint()
    import scala.concurrent.{Await, Future, TimeoutException}
    import scala.concurrent.ExecutionContext.Implicits.global
    val group = s"pq_fit_${java.util.UUID.randomUUID()}"
    val fits = (0 until m).map { sub =>
      Future {
        // job group is thread-local — set inside the future's thread so
        // a timeout can cancel all m fits as one unit
        spark.sparkContext.setJobGroup(group, s"pq codebook fit sub=$sub", interruptOnCancel = true)
        try {
          val dSub = sample.select(expr(s"slice(v, ${sub * w + 1}, $w)").as("v"))
          // distinct seed per subspace: identical seeds on near-identical
          // marginals would correlate the codebooks
          sub -> IvfIndex.fitCentroids(dSub, k = k, maxIter = maxIter, seed = seed + sub)
        } finally spark.sparkContext.clearJobGroup()
      }
    }
    try Await.result(Future.sequence(fits), timeout).toSeq
    catch {
      case _: TimeoutException =>
        spark.sparkContext.cancelJobGroup(group)
        throw new IllegalStateException(
          s"PQ codebook training exceeded $timeout — job group $group cancelled"
        )
    }
  }

  /** Subvector width implied by a fitted codebook set. */
  private def widthOf(codebooks: Seq[(Int, Seq[(Int, Seq[Double])])]): Int =
    codebooks.head._2.head._2.length

  /** Nearest-centroid code for one subspace as a pure projection
    * (struct array_min over centroid literals — IvfIndex.assignCells'
    * shape on the sliced subvector). */
  private def codeExpr(sub: Int, w: Int, centroids: Seq[(Int, Seq[Double])]): Column = {
    val scores = centroids.map { case (i, c) =>
      val cv = typedlit(c)
      struct(
        aggregate(
          zip_with(expr(s"slice(v, ${sub * w + 1}, $w)"), cv, (x, y) => (x - y) * (x - y)),
          lit(0.0),
          (a, x) => a + x
        ).as("d2"),
        lit(i).as("cell")
      )
    }
    array_min(array(scores: _*)).getField("cell")
  }

  /** Encode `emb` (vec_id, v, …) → same columns + `codes`, with
    * `codes(sub)` the subspace-`sub` centroid id. Pure projection; the
    * subvector width comes from the codebooks themselves, so encode
    * always covers exactly the trained geometry. */
  def encode(emb: DataFrame, codebooks: Seq[(Int, Seq[(Int, Seq[Double])])]): DataFrame = {
    val w = widthOf(codebooks)
    emb.withColumn("codes", array(codebooks.map { case (sub, c) => codeExpr(sub, w, c) }: _*))
  }

  /** ADC distance from an exact query vector `qv` to a coded corpus
    * row: sum over subspaces of ||q_sub − C_sub[code]||². Codebook
    * lookup is element_at on a per-subspace nested-array literal —
    * shallow expression tree (one literal object per subspace). */
  private[operators] def adcExpr(codebooks: Seq[(Int, Seq[(Int, Seq[Double])])]): Column = {
    val w = widthOf(codebooks)
    codebooks
      .map { case (sub, cents) =>
        val table = typedlit(cents.sortBy(_._1).map(_._2))
        aggregate(
          zip_with(
            expr(s"slice(qv, ${sub * w + 1}, $w)"),
            element_at(table, element_at(col("codes"), sub + 1) + 1),
            (x, y) => (x - y) * (x - y)
          ),
          lit(0.0),
          (a, x) => a + x
        )
      }
      .reduce(_ + _)
  }

  /** Probe: ADC-scan the coded corpus with the (broadcast, ≤10) query
    * set, keep `candK` candidates per query via a bounded heap
    * aggregate (map-side partial reduction — the shuffle carries
    * ≤candK-entry heaps, never the scanned corpus), exact-cosine
    * re-rank the survivors to `topK`. The heap payload carries the
    * candidate vector, so re-ranking needs no second corpus scan.
    */
  def adcTopK(
      coded: DataFrame,
      probes: DataFrame,
      codebooks: Seq[(Int, Seq[(Int, Seq[Double])])],
      candK: Int = 50,
      topK: Int = 5
  ): DataFrame =
    coded
      .crossJoin(broadcast(probes))
      .filter(col("q_id") =!= col("vec_id"))
      .withColumn("adc", adcExpr(codebooks))
      .groupBy("q_id")
      .agg(expr(s"top_k_structs(struct(adc, vec_id, qv, v), $candK)").as("cand"))
      .select(col("q_id"), explode(col("cand")).as("c"))
      .withColumn("cos", expr("cosine_sim(c.qv, c.v)"))
      // zero-norm (corrupt) rows: cosine_sim yields NULL by contract —
      // excluded HERE, explicitly, because NULL sorts FIRST in the
      // heap's ascending struct order (the replaced DESC window pushed
      // them last); an undefined score must never enter a neighbor list
      .filter(col("cos").isNotNull)
      .groupBy("q_id")
      .agg(expr(s"top_k_structs(struct(-cos AS nc, c.vec_id AS vec_id, cos), $topK)").as("top"))
      .select(col("q_id"), posexplode(col("top")))
      .select(
        col("q_id"),
        (col("pos") + 1).cast("long").as("rank"),
        col("col.vec_id"),
        col("col.cos")
      )
      .orderBy("q_id", "rank")

  // ------------------------------------------------------------------
  // Persistence: build-once / append-many, IvfIndex's maintenance
  // contract for the coded representation.
  // ------------------------------------------------------------------

  /** Persist just the fitted codebooks as a tiny parquet table
    * (sub, cell, cv) under `<dir>/codebooks` — the model artifact every
    * later encode (append batches, IvfAdc probes) reads back. */
  def saveCodebooks(
      s: SparkSession,
      codebooks: Seq[(Int, Seq[(Int, Seq[Double])])],
      indexDir: String
  ): Unit = {
    import s.implicits._
    codebooks
      .flatMap { case (sub, cents) => cents.map { case (cell, cv) => (sub, cell, cv) } }
      .toDF("sub", "cell", "cv")
      .write
      .mode("overwrite")
      .parquet(s"$indexDir/codebooks")
  }

  /** Persist a fitted PQ index: the codebooks under `<dir>/codebooks`
    * and the coded corpus (vec_id, v, norm, codes) under `<dir>/data`. */
  def save(
      emb: DataFrame,
      codebooks: Seq[(Int, Seq[(Int, Seq[Double])])],
      indexDir: String
  ): Unit = {
    saveCodebooks(emb.sparkSession, codebooks, indexDir)
    encode(emb, codebooks)
      .select("vec_id", "v", "norm", "codes")
      .write
      .mode("overwrite")
      .parquet(s"$indexDir/data")
  }

  /** Read persisted codebooks back into the driver-literal form every
    * encode/probe consumes (m·k·(dim/m) doubles — always tiny). */
  def loadCodebooks(s: SparkSession, indexDir: String): Seq[(Int, Seq[(Int, Seq[Double])])] =
    s.read
      .parquet(s"$indexDir/codebooks")
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2)))
      .groupBy(_._1)
      .toSeq
      .sortBy(_._1)
      .map { case (sub, rows) => sub -> rows.map(t => (t._2, t._3)).sortBy(_._1).toSeq }

  /** Append a new embedding batch to a persisted PQ index: encode with
    * the SAVED codebooks (pure projection — PqPersistSpec asserts the
    * plan is exchange-free) and `append` into the coded layout. No
    * refit: codes of existing rows never change under an append, so
    * probes serve the grown corpus with no other coordination. */
  def append(newEmb: DataFrame, indexDir: String): Unit =
    encode(newEmb, loadCodebooks(newEmb.sparkSession, indexDir))
      .select("vec_id", "v", "norm", "codes")
      .write
      .mode("append")
      .parquet(s"$indexDir/data")
}
