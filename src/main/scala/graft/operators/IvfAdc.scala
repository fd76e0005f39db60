package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
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
  * Storage layout under `<indexDir>`: `data/` partitioned by cell with
  * BOTH representations per row (codes for the scan pass, v for the
  * re-rank pass — parquet is columnar, so each pass reads only its own
  * column); `centroids/` (k rows) and `codebooks/` (m·k rows), the two
  * tiny model tables a probe folds into literals.
  *
  * Probe plan, audited end to end (IvfAdcSpec asserts both):
  * dynamic partition pruning from the broadcast probed-cell join skips
  * cold directories at the scan; every hash exchange in the plan sits
  * ABOVE a bounded heap aggregate (top_k_structs partials), so nothing
  * corpus-scaled is ever shuffled — the exchanges carry ≤candK-entry
  * heaps and the final ≤topK rows.
  *
  * Divergence from the paper, stated plainly: codes quantize RAW
  * vectors, not per-cell residuals (v − centroid). Residual coding
  * buys recall at equal code length but couples the codebooks to the
  * coarse quantizer (every cell re-fit invalidates all codes);
  * raw-vector codes keep the two models independent — IvfIndex.append
  * and PqIndex.append compose unchanged — and the spec pins the
  * resulting recall floor vs the exact q40 scan instead.
  */
object IvfAdc {

  /** Fit both quantizers on `emb` (vec_id, v, norm) and persist the
    * composed index. One corpus pass writes the layout; the fits run
    * on the same seeded/sampled cost-control paths as q46/q152. */
  def build(
      emb: DataFrame,
      indexDir: String,
      kCells: Int = 16,
      m: Int = 8,
      k: Int = 16,
      dim: Int = 64,
      maxIter: Int = 5,
      seed: Long = 42L
  ): Unit = {
    val s = emb.sparkSession
    val cents = IvfIndex.fitCentroids(emb, k = kCells, maxIter = maxIter, seed = seed)
    val cb = PqIndex.fitCodebooks(emb, m = m, k = k, dim = dim, maxIter = maxIter, seed = seed)
    PqIndex
      .encode(IvfIndex.assignCells(emb, cents), cb)
      .select("vec_id", "v", "norm", "codes", "cell")
      .write
      .mode("overwrite")
      .partitionBy("cell")
      .parquet(s"$indexDir/data")
    import s.implicits._
    cents.toDF("cell", "cv").write.mode("overwrite").parquet(s"$indexDir/centroids")
    PqIndex.saveCodebooks(s, cb, indexDir)
  }

  /** Append a new embedding batch to a persisted IVFADC index: both
    * models are read back (centroids → cell assignment, codebooks →
    * codes), the batch flows through the SAME two pure projections as
    * the initial build, and the coded rows `append` into the cell
    * layout — so a vector's (cell, codes) are bit-identical whether it
    * arrived at build or append time, and probes serve the grown
    * corpus with no other change (IvfAdcSpec pins probe-after-append
    * == rebuild-on-union). Cost ∝ batch size: no refit, no shuffle
    * (the assignment+encode plan is exchange-free, spec-asserted).
    */
  def append(newEmb: DataFrame, indexDir: String): Unit = {
    val s = newEmb.sparkSession
    val cents = s.read
      .parquet(s"$indexDir/centroids")
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1)))
      .sortBy(_._1)
      .toSeq
    val cb = PqIndex.loadCodebooks(s, indexDir)
    PqIndex
      .encode(IvfIndex.assignCells(newEmb, cents), cb)
      .select("vec_id", "v", "norm", "codes", "cell")
      .write
      .mode("append")
      .partitionBy("cell")
      .parquet(s"$indexDir/data")
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
    * re-rank to topK.
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
    val centroids = s.read.parquet(s"$indexDir/centroids")
    val wCell = Window.partitionBy("q_id").orderBy(col("d2").asc, col("cell").asc)
    val probed = queries
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
    // column pruning keeps the raw vectors out of this scan entirely
    val coded =
      minusTombstones(s.read.parquet(s"$indexDir/data").select("vec_id", "codes", "cell"))
    val cand = coded
      .join(broadcast(probed), Seq("cell"))
      .filter(col("q_id") =!= col("vec_id"))
      .withColumn("adc", PqIndex.adcExpr(cb))
      .groupBy("q_id")
      .agg(expr(s"top_k_structs(struct(adc, vec_id), $candK)").as("cand"))
      .select(col("q_id"), explode(expr("transform(cand, c -> c.vec_id)")).as("vec_id"))

    // re-rank pass: a second scan of the SAME pruned directories, now
    // reading v, broadcast-semi-joined down to the candidate ids
    val vecs = s.read.parquet(s"$indexDir/data").select("vec_id", "v", "cell")
    vecs
      .join(broadcast(probed), Seq("cell"))
      .join(broadcast(cand), Seq("q_id", "vec_id"))
      .withColumn("cos", expr("cosine_sim(qv, v)"))
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
}
