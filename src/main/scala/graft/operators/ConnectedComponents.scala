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
  * rounds) use [[labelStar]] — the alternating large-star/small-star
  * formulation (Kiveris et al., "Connected Components in MapReduce and
  * Beyond"), which converges in O(log²) rounds regardless of diameter;
  * `maxIter` bounds the cost here and the caller can raise it.
  */
object ConnectedComponents {

  /** @param pairs DataFrame with two node-id columns (one row per
    *              undirected edge; direction and duplicates don't matter)
    * @return (id, cluster_id) — cluster_id = min node id reachable
    * @throws IllegalStateException if propagation has not converged
    *         within `maxIter` rounds — returning mid-propagation labels
    *         would be silently WRONG (nodes far from the component
    *         minimum keep a stale cluster_id); raise `maxIter` or use
    *         [[labelStar]] for such graphs
    */
  def label(pairs: DataFrame, src: String, dst: String, maxIter: Int = 50): DataFrame = {
    val sc = pairs.sparkSession.sparkContext

    // localCheckpoint + record which RDD blocks it pinned, so each
    // round can free the previous round's labels instead of leaving
    // maxIter persisted copies behind for the session's lifetime
    // (ids read from the checkpointed plan — see CheckpointTracking)
    import CheckpointTracking.checkpointTracked

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
    // symmetrize once; edges are re-joined every round, so materialize.
    // Plain checkpoint, NOT checkpointHashPartitioned: the label table
    // (one row per node) broadcasts at runtime via AQE, which beats a
    // pinned one-side-shuffle sort-merge join until node count outgrows
    // the broadcast threshold — same trade-off as PageRank's edge
    // table (see the comment there). Near-dup label tables are node-
    // sized and stay broadcast-able far longer than the edge table
    // grows; checkpointHashPartitioned(…, Seq("b"), Seq("b")) is the
    // one-line switch if they don't.
    val (sym, symIds) = checkpointTracked(
      e.union(e.select(col("b").as("a"), col("a").as("b"))).distinct()
    )
    // the symmetrized table is the only consumer of the raw pairs
    CheckpointTracking.free(e, eIds)
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
      CheckpointTracking.free(next, labelIds)
      labels = next.select("id", "label")
      labelIds = nextIds
      iter += 1
    }
    if (changedNodes > 0) {
      CheckpointTracking.free(labels, labelIds ++ symIds)
      throw new IllegalStateException(
        s"connected components did not converge in $maxIter rounds — " +
          "component diameter exceeds the iteration budget; raise maxIter " +
          "or switch to a large-star/small-star formulation"
      )
    }
    CheckpointTracking.free(labels, symIds)
    labels
  }

  /** Connected components via alternating large-star / small-star
    * (Kiveris et al., "Connected Components in MapReduce and Beyond",
    * SoCC'14) — the adversarial-diameter path that `label`'s scaladoc
    * points to. Min-label propagation needs diameter-many rounds; the
    * star operations contract every component into a star rooted at
    * its minimum node in O(log²) rounds regardless of diameter, at the
    * cost of two grouped exchanges per round instead of one join.
    *
    * large-star: every node u computes m = min(Γ(u) ∪ {u}) over the
    * symmetrized neighborhood and rewires its LARGER neighbors to m.
    * small-star: on the downward-directed edge set (hi → lo), every
    * node rewires its smaller neighbors (and itself) to their minimum.
    * Both preserve connectivity; at fixpoint every component is a star
    * whose center is the component minimum.
    *
    * Convergence detection: the edge set is compared across rounds by
    * (count, XOR of per-edge xxhash64) — an O(1)-state aggregate over
    * the same materialized round output (no second lineage walk; XOR,
    * not SUM, because ANSI mode makes a hash sum overflow). The edge
    * set is distinct, so XOR cancellation needs two different sets
    * with equal count and equal hash-fold — vanishingly unlikely — and
    * `maxIter` still bounds the loop.
    *
    * Same 100 TB posture as `label`: every round is a bounded set of
    * shuffles on node id, localCheckpointed with per-round block
    * cleanup; no driver-side graph state beyond the two convergence
    * scalars.
    */
  def labelStar(pairs: DataFrame, src: String, dst: String, maxIter: Int = 50): DataFrame = {
    val sc = pairs.sparkSession.sparkContext
    import CheckpointTracking.checkpointTracked

    // canonical undirected edges, self-loops dropped
    val (e0, e0Ids) = checkpointTracked(
      pairs
        .select(col(src).cast("long").as("a"), col(dst).cast("long").as("b"))
        .filter(col("a") =!= col("b"))
        .select(greatest(col("a"), col("b")).as("hi"), least(col("a"), col("b")).as("lo"))
        .distinct()
    )
    // the node universe is fixed by the INPUT edges (later rounds drop
    // star-internal edges, so it must be captured up front)
    val (nodes, nodeIds) = checkpointTracked(
      e0.select(col("hi").as("id")).union(e0.select(col("lo").as("id"))).distinct()
    )

    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.select(col("hi").as("u"), col("lo").as("v"))
        .union(e.select(col("lo").as("u"), col("hi").as("v")))
      val mins = sym
        .groupBy("u")
        .agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("mn"), col("u")).as("m"))
      sym
        .join(mins, "u")
        .filter(col("v") > col("u"))
        .select(col("v").as("hi"), col("m").as("lo"))
        .filter(col("hi") =!= col("lo"))
        .distinct()
    }

    def smallStar(e: DataFrame): DataFrame = {
      val mins = e.groupBy(col("hi").as("u")).agg(min(col("lo")).as("m"))
      val rewired = e
        .join(mins, e("hi") === mins("u"))
        .filter(col("lo") =!= col("m"))
        .select(col("lo").as("x"), col("m"))
      val self = mins.select(col("u").as("x"), col("m"))
      rewired
        .union(self)
        .select(greatest(col("x"), col("m")).as("hi"), least(col("x"), col("m")).as("lo"))
        .filter(col("hi") =!= col("lo"))
        .distinct()
    }

    def checksum(e: DataFrame): (Long, Long) = {
      val r = e.agg(
        count(lit(1)).as("n"),
        coalesce(expr("bit_xor(xxhash64(hi, lo))"), lit(0L)).as("h")
      ).head()
      (r.getLong(0), r.getLong(1))
    }

    var (edges, edgeIds) = (e0, Set.empty[Int])
    var prev = checksum(edges)
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      val (next, nextIds) = checkpointTracked(smallStar(largeStar(edges)))
      val cur = checksum(next)
      converged = cur == prev
      prev = cur
      CheckpointTracking.free(next, edgeIds)
      edges = next
      edgeIds = nextIds
      iter += 1
    }
    if (!converged) {
      CheckpointTracking.free(edges, edgeIds ++ e0Ids ++ nodeIds)
      throw new IllegalStateException(
        s"large-star/small-star did not converge in $maxIter rounds"
      )
    }
    // at fixpoint every edge points a non-root directly at its
    // component minimum; roots and isolated-in-input nodes label
    // themselves
    val out = nodes
      .join(edges.select(col("hi").as("id"), col("lo").as("label")), Seq("id"), "left")
      .select(col("id"), coalesce(col("label"), col("id")).as("label"))
    CheckpointTracking.free(out, e0Ids)
    out
  }
}
