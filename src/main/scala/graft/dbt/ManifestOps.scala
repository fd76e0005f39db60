package graft.dbt

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Derived operators over the normalized manifest view — the queries a
  * dbt-artifact consumer actually runs (lineage, impact analysis,
  * change detection). All inputs are `readManifest` outputs, so these
  * compose at fleet scale: edges and diffs are plain shuffle joins on
  * `unique_id`.
  */
object ManifestOps {

  /** Lineage edge list: one row per (dependent, dependency) pair, from
    * the depends_on fan-out (SURVEY §2.1 F4).
    */
  def lineageEdges(manifest: DataFrame): DataFrame =
    manifest
      .select(col("unique_id").as("src"), explode(col("depends_on")).as("d"))
      .select(col("src"), col("d.type").as("dep_type"), col("d.unique_id").as("dst"))

  /** Transitive dependency closure (src reaches dst in `hops` joins),
    * bounded by `maxHops`, with early termination when a frontier adds
    * nothing new. Classic iterative-join BFS: each hop is one
    * distributed equi-join + anti-join dedup; the driver only sees a
    * per-hop COUNT (a scalar), never edge data — the loop is control
    * flow, not data movement. dbt graphs are shallow (hops ≤ ~20), so
    * the bound is generous.
    */
  def transitiveClosure(edges: DataFrame, maxHops: Int = 10): DataFrame = {
    val e = edges.select(col("src"), col("dst")).distinct().cache()
    var paths = e.withColumn("hops", lit(1))
    var frontier = paths
    var hop = 1
    while (hop < maxHops && !frontier.isEmpty) {
      val next = frontier
        .as("f")
        // the static edge side is bounded by the manifest graph (node
        // count, not path count) — broadcast it so each hop is a
        // map-side join of the frontier, not a shuffle; the identical
        // broadcast subplan is reused across hops. The frontier/paths
        // sides stay distributed (path count can exceed node count).
        .join(broadcast(e.as("n")), col("f.dst") === col("n.src"))
        .select(col("f.src").as("src"), col("n.dst").as("dst"))
        .distinct()
        .withColumn("hops", lit(hop + 1))
      // localCheckpoint (eager) both materializes the frontier and
      // TRUNCATES its logical plan — without it every later iteration
      // re-analyzes the whole accumulated lineage per action
      frontier = next.join(paths.select("src", "dst"), Seq("src", "dst"), "left_anti").localCheckpoint()
      paths = paths.unionByName(frontier)
      hop += 1
    }
    // release the loop-lifetime edge cache instead of pinning a block
    // per invocation for the whole session. Hop layers ≥ 2 are
    // physically checkpointed; only the hops=1 layer re-derives the
    // edge distinct once when the caller consumes the result.
    e.unpersist(false)
    paths
  }

  /** Impact analysis — the composite every dbt consumer runs after a
    * change lands: which entities must rebuild because something they
    * (transitively) depend on changed between two manifest snapshots?
    * Composes `diff` (what changed) with the reverse reachability of
    * the AFTER graph's `transitiveClosure` (who reaches the changed
    * node through depends_on edges).
    */
  def impacted(before: DataFrame, after: DataFrame, maxHops: Int = 10): DataFrame = {
    val changed = diffUnsorted(before, after)
      .filter(col("status") === "changed")
      .select(col("unique_id").as("changed_id"))
    reverseReachable(lineageEdges(after), changed, maxHops)
      .select(col("changed_id"), col("src").as("impacted_id"), col("hops"))
      .orderBy("changed_id", "impacted_id", "hops")
  }

  /** Seeded reverse reachability: every (src, changed_id, hops) where
    * `src` reaches a seed through depends_on edges in `hops` ≥ 1 joins
    * (min hops — BFS discovery order). Equivalent to filtering the full
    * transitive closure on dst ∈ seeds, but explores ONLY the impact
    * cone: at fleet scale the full closure is O(V · avg-reach) while a
    * change set touches a small cone of it. Same broadcast-edges loop
    * shape as `transitiveClosure`.
    */
  def reverseReachable(edges: DataFrame, seeds: DataFrame, maxHops: Int = 10): DataFrame = {
    val e = edges.select(col("src"), col("dst")).distinct().cache()
    // eager localCheckpoint: the seed set's lineage (two manifest
    // parses + a full-outer diff) would otherwise be re-analyzed inside
    // every iteration's plan
    var frontier = e
      .join(broadcast(seeds), e("dst") === seeds("changed_id"))
      .select(col("src"), col("changed_id"))
      .distinct()
      .withColumn("hops", lit(1))
      .localCheckpoint()
    var paths = frontier
    var hop = 1
    while (hop < maxHops && !frontier.isEmpty) {
      // broadcast the static edge side (same shape as transitiveClosure):
      // the frontier is the cone-scaled side and must stay distributed;
      // without the hint the planner may broadcast the frontier or
      // shuffle the edges every hop once sizes cross the threshold
      val next = broadcast(e.as("n"))
        .join(frontier.as("f"), col("n.dst") === col("f.src"))
        .select(col("n.src").as("src"), col("f.changed_id").as("changed_id"))
        .distinct()
        .withColumn("hops", lit(hop + 1))
      frontier = next
        .join(paths.select("src", "changed_id"), Seq("src", "changed_id"), "left_anti")
        .localCheckpoint()
      paths = paths.unionByName(frontier)
      hop += 1
    }
    // every frontier layer is physically checkpointed, so the cached
    // edge list is no longer needed by the returned plan — release it
    // rather than leaving a session-lifetime block per invocation
    e.unpersist(false)
    paths
  }

  /** Incremental upsert — dbt's incremental-materialization primitive:
    * rows from `updates` win on key collision, unmatched `base` rows
    * carry over. One anti-join + union, both keyed on `key`: at fleet
    * scale this is a co-partitioned shuffle (or a broadcast anti-join
    * when the update batch is small — AQE decides), never a rewrite of
    * unmatched data through a full outer join.
    */
  def upsert(base: DataFrame, updates: DataFrame, key: String): DataFrame =
    updates.unionByName(
      base.join(updates.select(key), Seq(key), "left_anti"),
      allowMissingColumns = false
    )

  /** Snapshot diff of two manifest views keyed by unique_id:
    * added / removed / changed (content sha256 or materialization) /
    * unchanged. Enables incremental lineage at fleet scale — only
    * 'changed' nodes need lineage recomputation.
    */
  def diff(before: DataFrame, after: DataFrame): DataFrame =
    diffUnsorted(before, after).orderBy("unique_id")

  /** diff without the presentation sort — for consumers (impact
    * analysis) that only filter on `status` and don't need the
    * RangePartitioning exchange the ORDER BY costs. */
  def diffUnsorted(before: DataFrame, after: DataFrame): DataFrame = {
    // presence markers distinguish "row absent" from "row present with
    // NULL sha/materialization" (sources and macros legitimately carry
    // NULLs there)
    val a = before.select(
      col("unique_id"),
      col("sha256").as("sha_before"),
      col("materialized_as").as("mat_before"),
      lit(true).as("in_before")
    )
    val b = after.select(
      col("unique_id"),
      col("sha256").as("sha_after"),
      col("materialized_as").as("mat_after"),
      lit(true).as("in_after")
    )
    a.join(b, Seq("unique_id"), "full_outer")
      .select(
        col("unique_id"),
        when(col("in_before").isNull, lit("added"))
          .when(col("in_after").isNull, lit("removed"))
          .when(
            !(col("sha_before") <=> col("sha_after")) ||
              !(col("mat_before") <=> col("mat_after")),
            lit("changed")
          )
          .otherwise(lit("unchanged"))
          .as("status"),
        col("sha_before"),
        col("sha_after")
      )
  }
}
