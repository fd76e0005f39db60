package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVFADC — the inverted-file + product-quantization composition of
  * Jégou/Douze/Schmid (TPAMI 2011, §V): the canonical serving plan for
  * billion-vector ANN, here as the composition of the two persisted
  * index operators this engine already has. The coarse quantizer
  * (IvfIndex's seeded KMeans cells) bounds WHERE a probe looks; the PQ
  * codes (PqIndex's per-subspace codebooks) bound WHAT the probe reads
  * per row — together a probe touches ~nprobe/k of the directories and
  * only the m-byte codes within them, never the raw vectors, until the
  * final re-rank fetches full vectors for candK candidates only.
  *
  * Codes quantize per-cell RESIDUALS (v − centroid[cell]) by default,
  * the paper's §V formulation: residuals concentrate near the origin
  * (the coarse quantizer has already explained the cell-level
  * structure), so the same m×k code budget resolves them finer than
  * raw vectors. Measured on the synthetic corpus (isotropic — the
  * WORST case for residuals, since near-uniform cells leave them
  * ≈ raw): recall vs exact at nprobe=10 is 0.86/0.92/0.98 residual vs
  * 0.74/0.88/0.96 raw at candK 64/128/256 — roughly one candK halving
  * at equal recall even here; on clustered real corpora (where the
  * coarse quantizer explains most of the variance) the gap is the
  * reason every production IVFADC codes residuals. The cost, stated
  * plainly: the codebooks
  * become COUPLED to the coarse quantizer (they quantize residual
  * space), so re-fitting cells invalidates all codes; that is the
  * standard production trade, and `residual = false` keeps the
  * decoupled raw-vector variant available. Both the residual transform
  * and its query-side mirror are pure projections against the
  * centroid-table literal — nothing about the exchange-free
  * build/append/probe shapes changes. The flag persists in a 1-row
  * `meta` table beside the models, so probes and appends self-configure.
  *
  * Storage layout under `<indexDir>`: `data/` partitioned by cell with
  * BOTH representations per row (codes for the scan pass, raw v for
  * the re-rank pass — parquet is columnar, so each pass reads only its
  * own column); `centroids/` (k rows), `codebooks/` (m·k rows), and
  * `meta/` (1 row), the tiny model tables a probe folds into literals.
  *
  * Probe plan, audited end to end (IvfAdcSpec asserts both):
  * dynamic partition pruning from the broadcast probed-cell join skips
  * cold directories at the scan; every hash exchange in the plan sits
  * ABOVE a bounded heap aggregate (top_k_structs partials), so nothing
  * corpus-scaled is ever shuffled — the exchanges carry ≤candK-entry
  * heaps and the final ≤topK rows.
  */
object IvfAdc {

  /** v − centroid[cell] as a pure projection: the centroid table is a
    * nested-array literal, the lookup one element_at. */
  private def residualOf(vCol: String, cents: Seq[(Int, Seq[Double])]): Column = {
    val table = typedlit(cents.sortBy(_._1).map(_._2))
    zip_with(col(vCol), element_at(table, col("cell") + 1), (x, c) => x - c)
  }

  /** R·v as a literal-matrix projection (q180's OPQ-style rotation,
    * Ge et al. CVPR 2013 §4, now a SERVING-path transform): the
    * orthonormal matrix folds into the plan as a nested-array literal,
    * so rotating is exchange-free like every other encode step. */
  private def rotateOf(vCol: String, rot: Seq[Seq[Double]]): Column = {
    val matLit = array(rot.toIndexedSeq.map(r => array(r.toIndexedSeq.map(lit): _*)): _*)
    transform(
      matLit,
      row => aggregate(zip_with(row, col(vCol), (a, b) => a * b), lit(0.0), (acc, x) => acc + x)
    )
  }

  /** Rotate a (…, v, norm) corpus into the index's coding basis. The
    * rotation is orthonormal, so the norm is unchanged in exact math —
    * recomputed here anyway so stored norms match stored vectors
    * bit-for-bit. Eagerly checkpointed when used at build time: the
    * downstream centroid + m codebook fits each submit their own jobs
    * and would re-evaluate the 64×64 projection every time.
    */
  private[graft] def applyRotation(
      df: DataFrame,
      rot: Option[Seq[Seq[Double]]],
      checkpoint: Boolean
  ): DataFrame =
    rot match {
      case None => df
      case Some(r) =>
        val rotated = df
          .withColumn("v", rotateOf("v", r))
          .withColumn("norm", sqrt(expr("aggregate(v, cast(0 AS double), (a, x) -> a + x*x)")))
        if (checkpoint) rotated.localCheckpoint() else rotated
    }

  /** Fit PQ codebooks over the per-cell residuals of `emb` under
    * already-fitted centroids — the residual-variant model fit, shared
    * by [[build]] and the spec's rebuild arm. */
  private[operators] def fitResidualCodebooks(
      emb: DataFrame,
      cents: Seq[(Int, Seq[Double])],
      m: Int = 8,
      k: Int = 16,
      dim: Int = 64,
      maxIter: Int = 5,
      seed: Long = 42L
  ): Seq[(Int, Seq[(Int, Seq[Double])])] =
    PqIndex.fitCodebooks(
      IvfIndex
        .assignCells(emb, cents)
        .select(col("vec_id"), residualOf("v", cents).as("v")),
      m = m,
      k = k,
      dim = dim,
      maxIter = maxIter,
      seed = seed
    )

  /** Assign + encode `corpus` under the given models and write the
    * coded rows into the layout (raw v kept beside the codes). */
  private def writeData(
      corpus: DataFrame,
      cents: Seq[(Int, Seq[Double])],
      cb: Seq[(Int, Seq[(Int, Seq[Double])])],
      indexDir: String,
      residual: Boolean,
      mode: String
  ): Unit = {
    val assigned = IvfIndex.assignCells(corpus, cents)
    val toCode =
      if (residual)
        assigned.select(
          col("vec_id"),
          col("v").as("vraw"),
          col("norm"),
          col("cell"),
          residualOf("v", cents).as("v")
        )
      else
        assigned.select(col("vec_id"), col("v").as("vraw"), col("norm"), col("cell"), col("v"))
    PqIndex
      .encode(toCode, cb)
      .select(col("vec_id"), col("vraw").as("v"), col("norm"), col("codes"), col("cell"))
      // local (exchange-free) sort so each written file carries tight
      // vec_id row-group stats — what makes the probe's pushed-down
      // candidate-id filter actually skip stripes in the re-rank scan
      .sortWithinPartitions("cell", "vec_id")
      .write
      .mode(mode)
      .partitionBy("cell")
      .parquet(s"$indexDir/data")
  }

  /** Persist models + meta + the full coded layout — [[build]] minus
    * the fits, so the spec's rebuild arm can lay out a union corpus
    * under base-fitted models. */
  private[operators] def writeIndex(
      corpus: DataFrame,
      cents: Seq[(Int, Seq[Double])],
      cb: Seq[(Int, Seq[(Int, Seq[Double])])],
      indexDir: String,
      residual: Boolean,
      rotation: Option[Seq[Seq[Double]]] = None
  ): Unit = {
    val s = corpus.sparkSession
    import s.implicits._
    cents.toDF("cell", "cv").write.mode("overwrite").parquet(s"$indexDir/centroids")
    PqIndex.saveCodebooks(s, cb, indexDir)
    // meta persists the residual flag AND the coding-basis rotation —
    // the q180 A/B verdict feeds the serving path through this row:
    // probes and appends self-configure, so a rotated index is probed
    // exactly like a plain one
    Seq((residual, rotation.map(_.map(_.toSeq)).orNull))
      .toDF("residual", "rotation")
      .write
      .mode("overwrite")
      .parquet(s"$indexDir/meta")
    writeData(corpus, cents, cb, indexDir, residual, mode = "overwrite")
  }

  /** Fit both quantizers on `emb` (vec_id, v, norm) and persist the
    * composed index. One corpus pass writes the layout; the fits run
    * on the same seeded/sampled cost-control paths as q46/q152.
    * `rotation` (an orthonormal matrix, e.g. q180's eigenvalue-
    * allocated PCA basis) moves the whole index — cells, residuals,
    * codes, stored vectors — into the rotated basis; cosines are
    * rotation-invariant, so probe results remain directly comparable
    * to a plain index over the same corpus.
    */
  def build(
      emb: DataFrame,
      indexDir: String,
      kCells: Int = 16,
      m: Int = 8,
      k: Int = 16,
      dim: Int = 64,
      maxIter: Int = 5,
      seed: Long = 42L,
      residual: Boolean = true,
      rotation: Option[Seq[Seq[Double]]] = None
  ): Unit = {
    val rotated = applyRotation(emb, rotation, checkpoint = true)
    val cents = IvfIndex.fitCentroids(rotated, k = kCells, maxIter = maxIter, seed = seed)
    val cb =
      if (residual)
        fitResidualCodebooks(rotated, cents, m = m, k = k, dim = dim, maxIter = maxIter, seed = seed)
      else PqIndex.fitCodebooks(rotated, m = m, k = k, dim = dim, maxIter = maxIter, seed = seed)
    writeIndex(rotated, cents, cb, indexDir, residual, rotation)
  }

  private def loadCentroids(s: SparkSession, indexDir: String): Seq[(Int, Seq[Double])] =
    s.read
      .parquet(s"$indexDir/centroids")
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1)))
      .sortBy(_._1)
      .toSeq

  /** (residual flag, optional coding-basis rotation). Indexes written
    * before the rotation column existed read as unrotated. */
  private def loadMeta(s: SparkSession, indexDir: String): (Boolean, Option[Seq[Seq[Double]]]) = {
    val df = s.read.parquet(s"$indexDir/meta")
    val row = df.collect().head
    val residual = row.getAs[Boolean]("residual")
    val rot =
      if (!df.columns.contains("rotation") || row.isNullAt(row.fieldIndex("rotation"))) None
      else Some(row.getSeq[scala.collection.Seq[Double]](row.fieldIndex("rotation")).map(_.toSeq).toSeq)
    (residual, rot)
  }

  /** Append a new embedding batch to a persisted IVFADC index: the
    * models (and the residual flag) are read back, the batch flows
    * through the SAME projections as the initial build, and the coded
    * rows `append` into the cell layout — so a vector's (cell, codes)
    * are bit-identical whether it arrived at build or append time, and
    * probes serve the grown corpus with no other change (IvfAdcSpec
    * pins probe-after-append == rebuild-on-union). Cost ∝ batch size:
    * no refit, no shuffle (the assignment+encode plan is
    * exchange-free, spec-asserted).
    */
  def append(newEmb: DataFrame, indexDir: String): Unit = {
    val s = newEmb.sparkSession
    val (residual, rotation) = loadMeta(s, indexDir)
    writeData(
      applyRotation(newEmb, rotation, checkpoint = false),
      loadCentroids(s, indexDir),
      PqIndex.loadCodebooks(s, indexDir),
      indexDir,
      residual = residual,
      mode = "append"
    )
  }

  /** Deletes and compaction come straight from IvfIndex — the
    * tombstone table and the staged cell-layout rewrite are
    * representation-agnostic (compact preserves every layout column,
    * codes included), so the composed index reuses them verbatim:
    * `IvfIndex.delete(ids, dir)` / `IvfIndex.compact(s, dir)`. The
    * probe below anti-joins the tombstones out of the ADC scan the
    * same way IvfIndex.probe does.
    */

  /** Probe: rank persisted centroids per query (bounded window — its
    * input is queries×kCells rows by construction), ADC-scan the codes
    * of the nprobe probed cells to candK candidates per query (bounded
    * heap), fetch full vectors for those candidates from a second
    * DPP-pruned scan that reads only the `v` column, and exact-cosine
    * re-rank to topK. Under a residual index the query side mirrors
    * the coding transform per probed cell (qv − centroid[cell], one
    * more projection) before the ADC distance — the re-rank still uses
    * the original qv.
    */
  def probe(
      s: SparkSession,
      indexDir: String,
      queries: DataFrame,
      nprobe: Int = 10,
      candK: Int = 64,
      topK: Int = 5
  ): DataFrame = {
    val cb = PqIndex.loadCodebooks(s, indexDir)
    val cents = loadCentroids(s, indexDir)
    val (residual, rotation) = loadMeta(s, indexDir)
    val centroids = s.read.parquet(s"$indexDir/centroids")
    val wCell = Window.partitionBy("q_id").orderBy(col("d2").asc, col("cell").asc)
    // a rotated index rotates the QUERY once here — centroid ranking,
    // residual mirror, ADC, and re-rank all run in the coding basis
    // (cosines are rotation-invariant, so topK semantics are unchanged)
    val qIn = rotation match {
      case Some(r) => queries.withColumn("qv", rotateOf("qv", r))
      case None    => queries
    }
    val probed = qIn
      .crossJoin(broadcast(centroids))
      .withColumn(
        "d2",
        expr(
          "aggregate(zip_with(qv, cv, (x, y) -> (x - y) * (x - y)), cast(0 AS double), (a, x) -> a + x)"
        )
      )
      .withColumn("rk", row_number().over(wCell))
      .filter(col("rk") <= nprobe)
      .select(col("q_id"), col("qv"), col("cell"))

    // tombstoned ids (if any) are hidden from the ADC scan exactly as
    // in IvfIndex.probe — deletes cost one tiny append, never a rewrite
    val tombsPath = new org.apache.hadoop.fs.Path(s"$indexDir/tombstones")
    val fs = tombsPath.getFileSystem(s.sparkContext.hadoopConfiguration)
    def minusTombstones(df: DataFrame): DataFrame =
      if (fs.exists(tombsPath))
        df.join(broadcast(s.read.parquet(s"$indexDir/tombstones")), Seq("vec_id"), "left_anti")
      else df

    // ADC pass: reads (vec_id, codes) of the probed directories only —
    // column pruning keeps the raw vectors out of this scan entirely.
    // The candidate set MATERIALIZES here (an eager action during plan
    // construction, the BFS-closure precedent): it is bounded by
    // construction at candK × |queries| rows, and collecting it turns
    // the re-rank fetch into a scan-level predicate instead of a
    // join-time filter.
    val coded =
      minusTombstones(s.read.parquet(s"$indexDir/data").select("vec_id", "codes", "cell"))
    val scanBase = coded
      .join(broadcast(probed), Seq("cell"))
      .filter(col("q_id") =!= col("vec_id"))
    val scan = if (residual) scanBase.withColumn("qv", residualOf("qv", cents)) else scanBase
    val candRows = scan
      .withColumn("adc", PqIndex.adcExpr(cb))
      .groupBy("q_id")
      .agg(expr(s"top_k_structs(struct(adc, vec_id), $candK)").as("cand"))
      .select(col("q_id"), explode(expr("transform(cand, c -> c.vec_id)")).as("vec_id"))
      .collect()
    val sess = s
    import sess.implicits._
    val cand = candRows.map(r => (r.getLong(0), r.getLong(1))).toSeq.toDF("q_id", "vec_id")
    val candIds = candRows.map(_.getLong(1)).distinct.sorted.toSeq

    // re-rank pass: a second scan of the SAME pruned directories, now
    // reading v — with the candidate ids PUSHED INTO the scan
    // (`PushedFilters` on vec_id, spec-asserted), so parquet row-group
    // stats can skip non-candidate stripes instead of the join
    // discarding rows after the read. Stated plainly for the 100 TB
    // posture: with ids scattered across cells, stats-based skipping is
    // partial (Spark folds a large IN into a min/max range past
    // spark.sql.parquet.pushdown.inFilterThreshold); a deployment
    // whose re-rank fetch dominates sorts the layout by vec_id within
    // cells — or serves point lookups from a keyed store — and this
    // probe keeps the same shape either way.
    val vecs = s.read
      .parquet(s"$indexDir/data")
      .select("vec_id", "v", "cell")
      .filter(col("vec_id").isin(candIds: _*))
    vecs
      .join(broadcast(probed), Seq("cell"))
      .join(broadcast(cand), Seq("q_id", "vec_id"))
      .withColumn("cos", expr("cosine_sim(qv, v)"))
      // zero-norm (corrupt) rows: cosine_sim yields NULL by contract —
      // excluded HERE, explicitly, because NULL sorts FIRST in the
      // heap's ascending struct order (the replaced DESC window pushed
      // them last); an undefined score must never enter a neighbor list
      .filter(col("cos").isNotNull)
      .groupBy("q_id")
      .agg(expr(s"top_k_structs(struct(-cos AS nc, vec_id, cos), $topK)").as("top"))
      .select(col("q_id"), posexplode(col("top")))
      .select(
        col("q_id"),
        (col("pos") + 1).cast("long").as("rank"),
        col("col.vec_id"),
        col("col.cos")
      )
      .orderBy("q_id", "rank")
  }

  /** Integer recall@`topK` (0-100) of this index against the exact
    * cosine scan over `anchors` (q_id, qv) — q157's health metric as a
    * reusable number. `corpus` is the source of truth (vec_id, v);
    * cost is one probe plus one anchors×corpus exact pass, bounded by
    * the anchor count. */
  def recallPct(
      s: SparkSession,
      indexDir: String,
      corpus: DataFrame,
      anchors: DataFrame,
      nprobe: Int = 10,
      candK: Int = 256,
      topK: Int = 5
  ): Long = {
    val approx = probe(s, indexDir, anchors, nprobe, candK, topK)
      .select(col("q_id"), col("vec_id"), lit(1).as("hit"))
    val exact = corpus
      .crossJoin(broadcast(anchors))
      .filter(col("q_id") =!= col("vec_id"))
      .withColumn("cos", expr("cosine_sim(qv, v)"))
      .filter(col("cos").isNotNull) // zero-norm rows carry no defined angle
      .groupBy("q_id")
      .agg(expr(s"top_k_structs(struct(-cos AS nc, vec_id), $topK)").as("top"))
      .select(col("q_id"), explode(expr("transform(top, t -> t.vec_id)")).as("vec_id"))
    val r = exact
      .join(approx, Seq("q_id", "vec_id"), "left")
      .agg(count(lit(1)).as("n"), sum(coalesce(col("hit"), lit(0))).cast("long").as("h"))
      .head()
    if (r.getLong(0) == 0L) 100L else r.getLong(1) * 100L / r.getLong(0)
  }

  /** INDEX AUTOPILOT — the q239 maintenance discipline applied to the
    * vector index: measure recall@`topK` against the exact scan; if it
    * holds `floorPct`, do NOTHING (zero jobs when healthy — probes
    * stay bit-stable because no file is touched); if it sagged (corpus
    * drift, append/delete cycles unbalancing cells fitted on an old
    * distribution), RE-FIT both quantizers on the CURRENT corpus into
    * a staged sibling and atomically swap it in. Returns the audited
    * actions, empty when healthy.
    *
    * Single-maintainer contract, like every staged-swap maintainer
    * here. Crash recovery: an interrupted swap leaves the old index
    * dir intact or the completed staging to resume — re-running
    * maintain() converges (the refit is deterministic: seeded fits on
    * the same corpus).
    */
  def maintain(
      s: SparkSession,
      indexDir: String,
      corpus: DataFrame,
      anchors: DataFrame,
      floorPct: Long,
      nprobe: Int = 10,
      candK: Int = 256,
      topK: Int = 5,
      kCells: Int = 16,
      knownRecall: Option[Long] = None
  ): Seq[(String, String)] = {
    val staged = new org.apache.hadoop.fs.Path(s"${indexDir}_refit_staging")
    val live = new org.apache.hadoop.fs.Path(indexDir)
    val fs = live.getFileSystem(s.sparkContext.hadoopConfiguration)
    // resume an interrupted swap (live gone, staging complete)
    if (!fs.exists(live) && fs.exists(staged)) {
      if (!fs.rename(staged, live))
        throw new java.io.IOException(s"ivfadc maintain: failed to resume swap from $staged")
      return Seq("resume_swap" -> s"completed an interrupted refit swap from $staged")
    }
    // an autopilot driven by a monitoring loop already HOLDS the recall
    // it is reacting to; re-measuring inside costs a full probe + exact
    // anchors×corpus pass for a number that is deterministic given
    // (index state, corpus, anchors). `knownRecall` lets the caller
    // pass it through — semantics identical either way.
    val before = knownRecall.getOrElse(recallPct(s, indexDir, corpus, anchors, nprobe, candK, topK))
    if (before >= floorPct) return Seq.empty // healthy: zero jobs, zero writes
    fs.delete(staged, /* recursive = */ true): Unit
    build(corpus, staged.toString, kCells = kCells)
    // swap: the refit replaces the WHOLE layout (models + data +
    // tombstones — the corpus is the source of truth, so tombstoned
    // ids simply aren't in it)
    if (!fs.delete(live, /* recursive = */ true))
      throw new java.io.IOException(s"ivfadc maintain: failed to retire $live")
    if (!fs.rename(staged, live))
      throw new java.io.IOException(s"ivfadc maintain: failed to publish $staged")
    val after = recallPct(s, indexDir, corpus, anchors, nprobe, candK, topK)
    Seq(
      "refit" -> s"recall@$topK $before% < floor $floorPct%: refit kCells=$kCells on current corpus",
      "recall_after" -> s"$after%"
    )
  }
}
