package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus×corpus top-k ANN join (kNN self-join) over IVF cells.
  *
  * The production retrieval/dedup workload is "for EVERY vector, its
  * top-k nearest neighbors" — not a handful of fixed probe vectors
  * (q40/q41/q46 serve that shape). All-pairs is quadratic in the corpus
  * and never acceptable; this operator blocks the self-join with the
  * same IVF coarse quantizer q46 uses for single-query search:
  *
  *   1. a seeded KMeans partitions the corpus into `kCells` cells;
  *   2. every vector, acting as a query, probes its `nprobe` nearest
  *      cells — scored against the centroid table folded into the plan
  *      as a LITERAL (centroids are model output, small by
  *      construction), so probing is a pure projection: no shuffle, no
  *      broadcast join, map-side only;
  *   3. candidates are the (query, member-of-probed-cell) pairs — a
  *      narrow id-level equi-join on `cell`, never carrying vectors;
  *   4. vectors re-attach to the surviving pairs and the exact cosine
  *      re-ranks; a per-query top-k window emits the result.
  *
  * Cell-cap skew guard: real corpora have dense regions (boilerplate,
  * templates) that collapse into one cell; a quadratic within that cell
  * melts an executor. `cellCap` bounds the INDEXED side of each cell to
  * the first `cellCap` members (deterministic: smallest vec_id — at
  * scale, substitute a quality rank), so per-cell join work is at most
  * |cell| × cellCap instead of |cell|². Capped-out vectors still issue
  * queries — they lose only their ability to be *returned*, and only in
  * cells already over the cap, where by construction near-duplicate
  * coverage is dense. The guard is asserted by KnnJoinSpec on a skewed
  * fixture.
  *
  * 100 TB posture: KMeans scales `kCells` with the corpus (√n cells
  * keeps expected cell size √n; the centroid literal stays MB-scale up
  * to ~2^16 cells — beyond that, switch the probe step to a broadcast
  * join). The candidate stream is narrow (two longs), partial-agg
  * deduped map-side by the `distinct`; the vector re-attach here is a
  * broadcast lookup (the corpus is small at test SF) — at scale both
  * joins become shuffle equi-joins on vec_id, co-partitioned with the
  * pair stream. Work per cell is capped, so a skewed corpus degrades
  * recall in its dense pockets instead of melting the join.
  */
object KnnJoin {

  /** @param emb      (vec_id: long, v: array<double>, norm: double)
    * @param k        neighbors per query vector
    * @param kCells   IVF cells (KMeans k)
    * @param nprobe   nearest cells each query probes
    * @param cellCap  max indexed vectors per cell (skew guard)
    */
  def knnSelfJoin(emb: DataFrame, k: Int, kCells: Int, nprobe: Int, cellCap: Int): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector

    val feat = emb.select(col("vec_id"), col("v"), col("norm"), array_to_vector(col("v")).as("features"))
    // coarse cells, not convergence: 5 Lloyd iterations (q46's setting)
    val model = new KMeans()
      .setK(kCells)
      .setSeed(42)
      .setMaxIter(5)
      .setFeaturesCol("features")
      .fit(feat)
    val assigned = model
      .transform(feat)
      .select(col("vec_id"), col("v"), col("norm"), col("prediction").as("cell"))

    // ---- probe: nprobe nearest cells per vector, as a pure projection.
    // Centroids enter the plan as top-level array LITERALS (the same
    // trick as Similarity.lshKeys: one literal per centroid keeps the
    // expression tree shallow enough for Janino). struct(d2, cell)
    // sorts by distance then cell id under the default struct ordering.
    val cellScores = model.clusterCenters.zipWithIndex.map { case (c, i) =>
      val cv = typedlit(c.toArray.toSeq)
      struct(
        aggregate(zip_with(col("v"), cv, (x, y) => (x - y) * (x - y)), lit(0.0), (a, x) => a + x)
          .as("d2"),
        lit(i).as("cell")
      )
    }
    val probes = assigned
      .withColumn("probed", slice(array_sort(array(cellScores: _*)), 1, nprobe))
      .select(col("vec_id").as("q_id"), explode(col("probed.cell")).as("cell"))

    // ---- skew guard: cap the indexed side of each cell.
    val wCell = Window.partitionBy("cell").orderBy("vec_id")
    val indexed = assigned
      .select(col("cell"), col("vec_id"))
      .withColumn("rk", row_number().over(wCell))
      .filter(col("rk") <= cellCap)
      .select("cell", "vec_id")

    // ---- narrow candidate pairs over probed cells; a pair can arise
    // from several shared probed cells → distinct before re-ranking.
    val cand = probes
      .join(indexed, Seq("cell"))
      .filter(col("q_id") =!= col("vec_id"))
      .select("q_id", "vec_id")
      .distinct()

    // ---- exact cosine re-rank within candidates. Vector re-attach is
    // a broadcast lookup at test SF; at scale: shuffle joins on vec_id.
    val vecs = emb.select(col("vec_id"), col("v"), col("norm"))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("vec_id"))
    cand
      .join(broadcast(vecs.select(col("vec_id").as("q_id"), col("v").as("qv"), col("norm").as("qn"))), Seq("q_id"))
      .join(broadcast(vecs), Seq("vec_id"))
      .withColumn("cos", expr("cosine_sim(qv, v)"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("vec_id"), col("cos"))
      .orderBy("q_id", "rank")
  }
}
