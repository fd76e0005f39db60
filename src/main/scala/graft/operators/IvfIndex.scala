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
  def build(
      emb: DataFrame,
      indexDir: String,
      k: Int = 16,
      maxIter: Int = 5,
      seed: Long = 42L
  ): Unit = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector

    val s = emb.sparkSession
    val feat = emb.select(
      col("vec_id"),
      col("v"),
      col("norm"),
      array_to_vector(col("v")).as("features")
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
      .select(col("vec_id"), col("v"), col("norm"), col("prediction").as("cell"))
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

  /** Probe the persisted index: each query row (q_id, qv, qn) ranks
    * the stored centroids by euclidean distance, keeps its `nprobe`
    * nearest cells, and exact-cosine re-ranks only those cells'
    * vectors to its top `topK`. The probed-cell set is broadcast, so
    * the equi-join on the PARTITION column carries a dynamic-pruning
    * subquery into the data scan — cells outside the probe set are
    * skipped at directory level.
    */
  def probe(
      s: SparkSession,
      indexDir: String,
      queries: DataFrame,
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
      .select(col("q_id"), col("qv"), col("qn"), col("cell"))

    val data = s.read.parquet(s"$indexDir/data")
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("vec_id"))
    data
      .join(broadcast(probed), Seq("cell"))
      .filter(col("q_id") =!= col("vec_id"))
      .withColumn("cos", expr("cosine_sim(qv, v)"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
      .select("q_id", "rank", "vec_id", "cos")
      .orderBy("q_id", "rank")
  }
}
