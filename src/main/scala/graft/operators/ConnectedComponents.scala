package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected pair graph — the clustering
  * step of a dedup pipeline: near-dup pair detection (n-gram Jaccard /
  * MinHash / SimHash) emits edges, this groups them into duplicate
  * clusters so a canonical representative can be kept per cluster.
  *
  * Algorithm: iterative min-label propagation. Each node starts
  * labelled with its own id; every round each node takes the minimum of
  * its label and its neighbors' labels; at fixpoint the label is the
  * smallest node id in the component (a deterministic, meaningful
  * cluster id — the canonical doc). Rounds needed = component diameter.
  *
  * 100 TB posture: near-dup graphs are overwhelmingly tiny cliques and
  * short chains (bounded diameter), so propagation converges in a
  * handful of rounds; each round is one shuffle-join on node id — no
  * driver-side graph, no all-pairs. Every round is `localCheckpoint`ed:
  * the plan would otherwise grow linearly and re-analyze the entire
  * lineage per action. The convergence probe piggybacks on the same
  * materialized result (an aggregate over the checkpointed labels, not
  * a second lineage walk). For adversarially long paths (diameter ≫
  * rounds) the classic fix is alternating large-star/small-star
  * (Kiveris et al., "Connected Components in MapReduce and Beyond"),
  * which converges in O(log²) rounds; `maxIter` bounds the cost here
  * and the caller can raise it.
  */
object ConnectedComponents {

  /** @param pairs DataFrame with two node-id columns (one row per
    *              undirected edge; direction and duplicates don't matter)
    * @return (id, cluster_id) — cluster_id = min node id reachable
    */
  def label(pairs: DataFrame, src: String, dst: String, maxIter: Int = 20): DataFrame = {
    val e = pairs.select(col(src).cast("long").as("a"), col(dst).cast("long").as("b"))
    // symmetrize once; edges are re-joined every round, so materialize
    val sym = e.union(e.select(col("b").as("a"), col("a").as("b")))
      .distinct()
      .localCheckpoint()
    var labels = sym
      .select(col("a").as("id"))
      .distinct()
      .select(col("id"), col("id").as("label"))
      .localCheckpoint()
    var iter = 0
    var changedNodes = 1L
    while (iter < maxIter && changedNodes > 0) {
      val nbrMin = sym
        .join(labels, sym("b") === labels("id"))
        .groupBy(sym("a").as("nid"))
        .agg(min("label").as("nbr_label"))
      val next = labels
        .join(nbrMin, labels("id") === nbrMin("nid"), "left")
        .select(
          col("id"),
          col("label").as("old_label"),
          least(col("label"), coalesce(col("nbr_label"), col("label"))).as("label")
        )
        .localCheckpoint()
      changedNodes =
        next.filter(col("label") =!= col("old_label")).limit(1).count()
      labels = next.select("id", "label")
      iter += 1
    }
    labels
  }
}
