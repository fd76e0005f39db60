package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Synchronous label propagation for community detection (Raghavan,
  * Albert & Kumara 2007), determinized: every node starts as its own
  * label and each iteration adopts the MODE of its in-neighbors'
  * labels, ties broken toward the smallest label. The classic
  * algorithm breaks ties randomly and updates asynchronously — fine
  * for one machine, irreproducible on a cluster; synchronous sweeps
  * with a total tie order make the result a pure function of the
  * graph, which is what lets q171 carry a DuckDB oracle (the same
  * sweeps unrolled as CTEs).
  *
  * Distinct from connected components (ConnectedComponents.label):
  * CC merges everything reachable; bounded-iteration mode propagation
  * finds DENSE regions — the community structure a crawl-graph
  * curation pass weights domains by.
  *
  * Scale shape per sweep: one (dst, label) count groupBy (map-side
  * combined) and one per-node argmax via a 1-entry bounded heap
  * (top_k_structs) — both exchanges carry label-count rows, never
  * degree-squared anything. Nodes with no in-edges keep their label.
  */
object LabelPropagation {

  /** Sweeps between checkpoints. Checkpointing EVERY sweep (the naive
    * lineage discipline) eagerly materializes each sweep as its own
    * job and forfeits whole-stage fusion across sweeps — measured 2×
    * on q171 (BENCH r10→r11: 5.1 → 10.3 s at iters=3). Lineage only
    * needs to stay BOUNDED, not unit-depth: a cadence of K keeps the
    * unrolled plan ≤ K sweeps (Catalyst plans that comfortably — the
    * fully-lazy pre-round-10 variant fused 3) while still cutting the
    * doubling recursion before it compounds at high iteration counts.
    */
  private val CheckpointEvery = 3

  def propagate(edges: DataFrame, iters: Int): DataFrame = {
    require(iters >= 0, "negative iteration count")
    val e = edges.select(col("src"), col("dst"))
    val nodes = e
      .select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
    // PageRank's checkpoint discipline (PageRank.ranks), at a cadence
    // of [[CheckpointEvery]] sweeps: between checkpoints the label
    // table stays a lazy plan over the last checkpoint (its blocks are
    // pinned until the NEXT checkpoint materializes, then freed), so
    // lineage is bounded at K sweeps and K sweeps fuse into one
    // codegen'd DAG instead of K materialization jobs.
    var (labels, blocks) =
      CheckpointTracking.checkpointTracked(nodes.withColumn("label", col("node")))
    var sinceCheckpoint = 0
    (1 to iters).foreach { _ =>
      val adopted = e
        .join(labels.withColumnRenamed("node", "src"), Seq("src"))
        .groupBy(col("dst"), col("label"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(col("dst"))
        .agg(expr("top_k_structs(struct(-cnt AS nc, label), 1)").as("t"))
        .select(col("dst").as("node"), expr("t[0].label").as("new_label"))
      val next = labels
        .join(adopted, Seq("node"), "left")
        .select(col("node"), coalesce(col("new_label"), col("label")).as("label"))
      sinceCheckpoint += 1
      if (sinceCheckpoint >= CheckpointEvery) {
        val (ck, ids) = CheckpointTracking.checkpointTracked(next)
        CheckpointTracking.free(labels, blocks)
        labels = ck
        blocks = ids
        sinceCheckpoint = 0
      } else {
        labels = next
      }
    }
    labels
  }
}
