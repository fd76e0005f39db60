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

  def propagate(edges: DataFrame, iters: Int): DataFrame = {
    require(iters >= 0, "negative iteration count")
    val e = edges.select(col("src"), col("dst"))
    val nodes = e
      .select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
    // PageRank's checkpoint discipline (PageRank.ranks): each sweep's
    // labels are localCheckpointed so the plan stays ONE sweep deep —
    // without it lineage doubles per iteration (the label table feeds
    // both the join and the fallback), and Catalyst re-plans the whole
    // unrolled history every round. The previous sweep's blocks are
    // freed as soon as the next checkpoint is materialized.
    var (labels, blocks) =
      CheckpointTracking.checkpointTracked(nodes.withColumn("label", col("node")))
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
      val (ck, ids) = CheckpointTracking.checkpointTracked(next)
      CheckpointTracking.free(labels, blocks)
      labels = ck
      blocks = ids
    }
    labels
  }
}
