package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Persistent IVF index for ANN serving: build the coarse quantizer
  * ONCE, lay the corpus out partitioned by cell, and let every probe
  * read only its nprobe cells — the build-once / probe-many shape of a
  * production vector-serving path, where re-clustering 100 TB of
  * embeddings per query batch is not an option.
  *
  * The layout IS the index: `partitionBy(cell)` writes one directory
  * per cell, and [[probe]] joins the scan against the (tiny,
  * broadcast) probed-cell set — Spark's dynamic partition pruning
  * turns that join into a directory-level skip, so a probe physically
  * reads ~nprobe/k of the corpus without any driver-side file
  * bookkeeping (IvfIndexSpec asserts the dynamic pruning filter is in
  * the scan). Centroids persist beside the data: a probe needs no
  * model object, only the two parquet reads.
  *
  * Cell assignments are implementation-defined (seeded MLlib KMeans),
  * so consumers are rows-only; with the same seed/k/iterations the
  * whole path is deterministic and — because parquet round-trips
  * doubles exactly — probe results are bit-identical to the in-memory
  * IVF query (q46), which the spec pins.
  */
object IvfIndex {

  /** Fit the seeded coarse quantizer over `emb` (vec_id, v, norm) and
    * persist the index: corpus partitioned by cell under
    * `<indexDir>/data`, centroid table under `<indexDir>/centroids`.
    */
  /** `attrs`: metadata columns of `emb` stored INSIDE the index rows
    * beside the vectors — what [[probeFiltered]] filters on. Storing
    * the attribute (rather than joining an id set at query time) is
    * the scale move: the predicate pushes into the parquet scan of the
    * probed cells and no id list is ever materialized or shipped. */
  def build(
      emb: DataFrame,
      indexDir: String,
      k: Int = 16,
      maxIter: Int = 5,
      seed: Long = 42L,
      attrs: Seq[String] = Nil
  ): Unit = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector

    val s = emb.sparkSession
    val feat = emb.select(
      (Seq(col("vec_id"), col("v"), col("norm"), array_to_vector(col("v")).as("features")) ++
        attrs.map(col)): _*
    )
    // a coarse quantizer needs rough cells, not convergence (q46's
    // rationale): each Lloyd iteration is a full corpus pass at scale
    val model = new KMeans()
      .setK(k)
      .setSeed(seed)
      .setMaxIter(maxIter)
      .setFeaturesCol("features")
      .fit(feat)
    model
      .transform(feat)
      .select(
        (Seq(col("vec_id"), col("v"), col("norm"), col("prediction").as("cell")) ++
          attrs.map(col)): _*
      )
      .write
      .mode("overwrite")
      .partitionBy("cell")
      .parquet(s"$indexDir/data")

    import s.implicits._
    model.clusterCenters.zipWithIndex.toSeq
      .map { case (c, i) => (i, c.toArray.toSeq) }
      .toDF("cell", "cv")
      .write
      .mode("overwrite")
      .parquet(s"$indexDir/centroids")
  }

  // ------------------------------------------------------------------
  // Incremental maintenance: fit-once / assign-anywhere. Real serving
  // corpora grow; re-clustering 100 TB per ingest batch is not an
  // option, so a new batch is assigned to the EXISTING cells and
  // appended into the partitioned layout — cost ∝ batch size, not
  // corpus size, and the quantizer never moves under the probes.
  // ------------------------------------------------------------------

  /** Fit only the coarse quantizer (no layout write); returns
    * (cell, centroid) pairs. Kept separate from [[build]] so an index
    * can be laid out — and later appended to — with one shared
    * assignment code path ([[assignCells]]), guaranteeing a vector
    * gets the same cell whether it arrived in the initial layout or in
    * a later batch.
    */
  def fitCentroids(
      fitEmb: DataFrame,
      k: Int = 16,
      maxIter: Int = 5,
      seed: Long = 42L
  ): Seq[(Int, Seq[Double])] = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val model = new KMeans()
      .setK(k)
      .setSeed(seed)
      .setMaxIter(maxIter)
      .setFeaturesCol("features")
      .fit(fitEmb.select(array_to_vector(col("v")).as("features")))
    model.clusterCenters.zipWithIndex.map { case (c, i) => (i, c.toArray.toSeq) }.toSeq
  }

  /** Nearest-centroid assignment as a PURE PROJECTION: each centroid is
    * a top-level array literal (KnnJoin's trick), the argmin is a
    * struct array_min ordered by (d2, cell) — no join, no shuffle, no
    * model object. This is the map-side-only shape incremental ingest
    * needs: a batch streams through, picks its directory, and is
    * written, with per-row cost k·dims multiply-adds.
    */
  def assignCells(emb: DataFrame, centroids: Seq[(Int, Seq[Double])]): DataFrame = {
    val cellScores = centroids.map { case (i, c) =>
      val cv = typedlit(c)
      struct(
        aggregate(zip_with(col("v"), cv, (x, y) => (x - y) * (x - y)), lit(0.0), (a, x) => a + x)
          .as("d2"),
        lit(i).as("cell")
      )
    }
    emb.withColumn("cell", array_min(array(cellScores: _*)).getField("cell"))
  }

  /** Lay out `corpus` under an index dir using already-fitted
    * centroids (assignment via [[assignCells]]). */
  def writeLayout(
      corpus: DataFrame,
      centroids: Seq[(Int, Seq[Double])],
      indexDir: String
  ): Unit = {
    val s = corpus.sparkSession
    assignCells(corpus, centroids)
      .select(col("vec_id"), col("v"), col("norm"), col("cell"))
      .write
      .mode("overwrite")
      .partitionBy("cell")
      .parquet(s"$indexDir/data")
    import s.implicits._
    centroids.toDF("cell", "cv").write.mode("overwrite").parquet(s"$indexDir/centroids")
  }

  /** Append a new embedding batch to an existing index: read the
    * persisted centroids (tiny — k rows; collected driver-side to fold
    * into the assignment projection as literals), assign, and `append`
    * into the partitioned layout — new files land inside the existing
    * cell directories, so probes (and their dynamic partition pruning)
    * see the grown corpus with no other change. No KMeans refit, no
    * shuffle: IvfAppendSpec asserts the assignment plan is
    * exchange-free.
    */
  def append(newEmb: DataFrame, indexDir: String): Unit = {
    val s = newEmb.sparkSession
    val centroids = s.read
      .parquet(s"$indexDir/centroids")
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1)))
      .sortBy(_._1)
      .toSeq
    assignCells(newEmb, centroids)
      .select(col("vec_id"), col("v"), col("norm"), col("cell"))
      .write
      .mode("append")
      .partitionBy("cell")
      .parquet(s"$indexDir/data")
  }

  /** Record vectors as deleted WITHOUT touching the cell layout: ids
    * append into a tombstone table beside the data, and [[probe]]
    * anti-joins them out at query time. This is the only delete shape
    * that works at serving scale — rewriting cell files per delete
    * request is a compaction-sized job, not a request-sized one. The
    * tombstone side stays tiny relative to the corpus (it is reset by
    * every [[compact]]), so the anti-join broadcasts; a deployment that
    * lets tombstones grow past broadcast size is overdue for
    * compaction, not a bigger join.
    */
  def delete(ids: DataFrame, indexDir: String): Unit =
    ids
      .select(col("vec_id"))
      .write
      .mode("append")
      .parquet(s"$indexDir/tombstones")

  /** Fold accumulated tombstones into the layout: rewrite the cell
    * directories without the deleted rows and clear the tombstone
    * table. Probe results are unchanged by construction (the anti-join
    * already hid those rows) — IvfDeleteSpec pins probe-before ==
    * probe-after bit-identically; only the physical files shrink. The
    * cell assignment of surviving rows is kept, not recomputed, so
    * compaction never moves a vector between directories.
    *
    * The staged-rewrite swap goes through the Hadoop `FileSystem` API
    * (resolved from the index path), so the maintenance path works
    * wherever the layout lives — local disk, HDFS, or an object store
    * — and every step's result is CHECKED: a failed delete or rename
    * throws immediately, leaving the staged directory intact for
    * retry, instead of silently destroying the live index (the
    * java.io.File version ignored renameTo's boolean). Caveat, stated
    * plainly: `rename` is atomic on HDFS/POSIX but copy-based on some
    * object stores — deployments there should point probes at a
    * manifest (or run compact under a table format) rather than rely
    * on the directory swap being instantaneous.
    */
  def compact(s: SparkSession, indexDir: String): Unit = {
    import org.apache.hadoop.fs.Path
    // keep EVERY layout column: the plain IVF layout carries
    // (vec_id, v, norm, cell), the IVFADC layout adds codes — one
    // compaction path serves both (and any future layout with a
    // vec_id key and a cell partition column)
    val survivors = s.read
      .parquet(s"$indexDir/data")
      .join(s.read.parquet(s"$indexDir/tombstones"), Seq("vec_id"), "left_anti")
    // stage the rewrite next to the live layout, then swap: a rewrite
    // in place would read and overwrite the same directories
    val staged = new Path(s"$indexDir/data_compacted")
    survivors.write.mode("overwrite").partitionBy("cell").parquet(staged.toString)
    val fs = staged.getFileSystem(s.sparkContext.hadoopConfiguration)
    val live = new Path(s"$indexDir/data")
    val tombs = new Path(s"$indexDir/tombstones")
    if (!fs.delete(live, /* recursive = */ true))
      throw new java.io.IOException(s"compact: failed to remove old layout $live")
    if (!fs.rename(staged, live))
      throw new java.io.IOException(
        s"compact: failed to swap $staged into place — staged rewrite preserved at $staged"
      )
    if (fs.exists(tombs) && !fs.delete(tombs, /* recursive = */ true))
      throw new java.io.IOException(s"compact: failed to clear tombstone table $tombs")
  }

  /** Probe the persisted index: each query row (q_id, qv, qn) ranks
    * the stored centroids by euclidean distance, keeps its `nprobe`
    * nearest cells, and exact-cosine re-ranks only those cells'
    * vectors to its top `topK`. The probed-cell set is broadcast, so
    * the equi-join on the PARTITION column carries a dynamic-pruning
    * subquery into the data scan — cells outside the probe set are
    * skipped at directory level. If a tombstone table exists (see
    * [[delete]]), its ids are broadcast-anti-joined out of the
    * candidate stream before re-ranking.
    *
    * Top-k shapes by what they scan: cell selection stays a rank
    * window (its input is queries×k centroids — bounded by
    * construction, never data-scaled); the re-rank over the pruned
    * corpus is a `top_k_structs` bounded heap (map-side partial
    * reduction — the exchange carries ≤topK-entry heaps, not the
    * probed cells' rows).
    */
  def probe(
      s: SparkSession,
      indexDir: String,
      queries: DataFrame,
      nprobe: Int = 2,
      topK: Int = 5
  ): DataFrame = probeFiltered(s, indexDir, queries, filterExpr = None, nprobe, topK)

  /** FILTERED vector search — top-k under a metadata predicate over
    * the attributes stored at [[build]] time (`attrs`): the predicate
    * filters the candidate stream BEFORE the bounded heap (post-
    * filtering a top-k would under-fill whenever fewer than k of the
    * unfiltered neighbors match), and because the attribute lives IN
    * the index rows it is PUSHED DOWN into the parquet scan of the
    * probed cells — row groups whose attribute range excludes the
    * predicate never decompress, and no allowed-id set is built or
    * shipped. Recall caveat: selective predicates amplify the probe-
    * miss risk every IVF search carries (a matching neighbor may live
    * in an unprobed cell) — raise `nprobe` with selectivity;
    * FilteredAnnSpec measures the recall against the exact filtered
    * scan. */
  def probeFiltered(
      s: SparkSession,
      indexDir: String,
      queries: DataFrame,
      filterExpr: Option[String],
      nprobe: Int = 2,
      topK: Int = 5
  ): DataFrame = {
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

    val raw = s.read.parquet(s"$indexDir/data")
    val tombsPath = new org.apache.hadoop.fs.Path(s"$indexDir/tombstones")
    val fs = tombsPath.getFileSystem(s.sparkContext.hadoopConfiguration)
    val live =
      if (fs.exists(tombsPath))
        raw.join(broadcast(s.read.parquet(s"$indexDir/tombstones")), Seq("vec_id"), "left_anti")
      else raw
    // metadata predicate first: lands on the scan as a pushed filter
    val data = filterExpr.fold(live)(f => live.filter(expr(f)))
    data
      .join(broadcast(probed), Seq("cell"))
      .filter(col("q_id") =!= col("vec_id"))
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
}
