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
    * @throws IllegalStateException if propagation has not converged
    *         within `maxIter` rounds — returning mid-propagation labels
    *         would be silently WRONG (nodes far from the component
    *         minimum keep a stale cluster_id); raise `maxIter` or use a
    *         large-star/small-star variant for such graphs
    */
  def label(pairs: DataFrame, src: String, dst: String, maxIter: Int = 50): DataFrame = {
    val sc = pairs.sparkSession.sparkContext

    // localCheckpoint + record which RDD blocks it pinned, so each
    // round can free the previous round's labels instead of leaving
    // maxIter persisted copies behind for the session's lifetime
    def checkpointTracked(df: DataFrame): (DataFrame, Set[Int]) = {
      val before = sc.getPersistentRDDs.keySet
      val out = df.localCheckpoint()
      (out, (sc.getPersistentRDDs.keySet -- before).toSet)
    }

    // Checkpoint the RAW pair stream first: the union below references
    // `e` twice (forward + reversed), and without a materialization the
    // whole upstream pair-generation pipeline (e.g. the shingle index +
    // self-join behind q67) appears as two plan branches — correctness
    // is unaffected but the guarantee that it executes once would rest
    // on AQE exchange reuse firing. A checkpointed pair table makes the
    // run-once guarantee structural; the pair stream is narrow (two
    // longs), so the materialization is cheap at any scale.
    val (e, eIds) = checkpointTracked(
      pairs.select(col(src).cast("long").as("a"), col(dst).cast("long").as("b"))
    )
    // symmetrize once; edges are re-joined every round, so materialize
    val (sym, symIds) = checkpointTracked(
      e.union(e.select(col("b").as("a"), col("a").as("b"))).distinct()
    )
    // the symmetrized table is the only consumer of the raw pairs
    eIds.foreach(id => sc.getPersistentRDDs.get(id).foreach(_.unpersist(false)))
    var (labels, labelIds) = checkpointTracked(
      sym
        .select(col("a").as("id"))
        .distinct()
        .select(col("id"), col("id").as("label"))
    )
    var iter = 0
    var changedNodes = 1L
    while (iter < maxIter && changedNodes > 0) {
      val nbrMin = sym
        .join(labels, sym("b") === labels("id"))
        .groupBy(sym("a").as("nid"))
        .agg(min("label").as("nbr_label"))
      val (next, nextIds) = checkpointTracked(
        labels
          .join(nbrMin, labels("id") === nbrMin("nid"), "left")
          .select(
            col("id"),
            col("label").as("old_label"),
            least(col("label"), coalesce(col("nbr_label"), col("label"))).as("label")
          )
      )
      changedNodes =
        next.filter(col("label") =!= col("old_label")).limit(1).count()
      // previous round's blocks are unreferenced once `labels` is
      // reassigned — free them now rather than at session end
      labelIds.foreach(id => sc.getPersistentRDDs.get(id).foreach(_.unpersist(false)))
      labels = next.select("id", "label")
      labelIds = nextIds
      iter += 1
    }
    if (changedNodes > 0) {
      labelIds.foreach(id => sc.getPersistentRDDs.get(id).foreach(_.unpersist(false)))
      symIds.foreach(id => sc.getPersistentRDDs.get(id).foreach(_.unpersist(false)))
      throw new IllegalStateException(
        s"connected components did not converge in $maxIter rounds — " +
          "component diameter exceeds the iteration budget; raise maxIter " +
          "or switch to a large-star/small-star formulation"
      )
    }
    symIds.foreach(id => sc.getPersistentRDDs.get(id).foreach(_.unpersist(false)))
    labels
  }
}
