package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-iteration PageRank over a directed edge table — the standard
  * graph-centrality signal of large-corpus curation (domain/source
  * ranking feeds quality weighting and crawl prioritization; the same
  * power-iteration shape ranks lineage nodes or co-purchase graphs).
  *
  * Arithmetic contract: ranks are FIXED-POINT BIGINTs in units of
  * 1e-12 ("picorank", total mass ≈ 1e12), and every step is integer
  * arithmetic — `rank div outdeg` per edge, `(85 * Σ contrib) div 100`
  * plus `(15 * SCALE) div (100 * N)` per node. Floating-point PageRank
  * sums in shuffle order, so two runs (or two engines) disagree in the
  * low bits; integer ranks are associative, order-independent, and
  * hence bit-identical across engines — this is what lets a DuckDB SQL
  * restatement hash-match the distributed run exactly. Truncation loses
  * < 1 picorank per (edge + node) per iteration: ~1e-7 relative error
  * at a billion edges, far below any ranking-relevant difference, and
  * identical truncation on both engines.
  *
  * 100 TB posture: each iteration is one equi-join of the edge table
  * against the current rank table on the source id (shuffle on node
  * id, partial aggregation map-side) — no driver-side graph state, no
  * all-pairs. The edge+degree table is `localCheckpoint`ed once up
  * front (it is consumed every iteration; a lazy cache would be raced
  * and recomputed by AQE's concurrent stages) and each round's ranks
  * replace the previous round's blocks, so state held is one narrow
  * (node, rank) table regardless of iteration count. Iterations are a
  * fixed parameter, not run-to-convergence: corpus-ranking practice
  * uses a small constant (the signal stabilizes in ~10 rounds) and a
  * fixed count keeps cost strictly bounded and restatement-friendly.
  */
object PageRank {

  val Scale = 1000000000000L // 1e12: rank unit = 1e-12 of total mass

  /** @param edges directed edge table, one row per (src, dst) pair —
    *              pre-deduplicated by the caller if multi-edges should
    *              not weigh double
    * @param src   source node id column name (any orderable type)
    * @param dst   destination node id column name
    * @param iters number of power iterations (fixed, ≥ 0)
    * @param pinEdgePartitioning keep the edge table's hash layout (on
    *              src) visible through the checkpoint — the 100M+-node
    *              regime switch (see the layout comment below)
    * @return (node, rank_e12): every node that appears as a source or
    *         destination, with its fixed-point rank after `iters`
    *         rounds (damping 0.85)
    */
  def ranks(
      edges: DataFrame,
      src: String,
      dst: String,
      iters: Int = 3,
      pinEdgePartitioning: Boolean = false
  ): DataFrame =
    core(edges, src, dst, iters, pinEdgePartitioning, sourcePred = None)

  /** PERSONALIZED PageRank (random walk with restart): the teleport
    * mass lands ONLY on the nodes satisfying `sourcePred` (a SQL
    * predicate over the `node` column), so ranks measure proximity TO
    * THE SOURCE SET instead of global centrality — the
    * recommendation / related-entity signal (Gleich 2015 §5). Same
    * fixed-point integer contract and per-iteration plan as [[ranks]];
    * only the restart vector changes: init = SCALE/|S| on S (0
    * elsewhere), teleport = 15%·SCALE/|S| on S per round. Nodes
    * unreachable from S stay at exactly 0 — integer arithmetic keeps
    * that crisp where float PPR leaves denormal dust. */
  def personalizedRanks(
      edges: DataFrame,
      src: String,
      dst: String,
      sourcePred: String,
      iters: Int = 3,
      pinEdgePartitioning: Boolean = false
  ): DataFrame =
    core(edges, src, dst, iters, pinEdgePartitioning, Some(sourcePred))

  private def core(
      edges: DataFrame,
      src: String,
      dst: String,
      iters: Int,
      pinEdgePartitioning: Boolean,
      sourcePred: Option[String]
  ): DataFrame = {
    import CheckpointTracking.checkpointTracked

    // Degree-annotated edges in ONE pass: the window's own exchange
    // hash-distributes by src and its sort orders within partitions —
    // no separate degree table, no degree join, one shuffle of the
    // edge table for the whole run.
    //
    // Default layout: deliberately NOT checkpointHashPartitioned —
    // re-stating the edge layout pins the per-iteration join to a
    // sort-merge shape, which suppresses AQE's runtime broadcast of
    // the rank side — and the rank table (one row per NODE) is orders
    // of magnitude smaller than the edge table, so broadcasting it is
    // the better plan until node count itself outgrows the broadcast
    // threshold (measured here: the pinned-SMJ variant was ~2× slower
    // at sf0.1). When ranks get that big — 100M+ domains —
    // `pinEdgePartitioning = true` checkpoints the edge table
    // hash-partitioned AND sorted on src, so each iteration's
    // sort-merge join neither re-shuffles nor re-sorts the edge side:
    // only the narrow (node, rank) table moves per round
    // (q115_pagerank_smj registers this path; PageRankSpec asserts the
    // single-exchange plan).
    val w = org.apache.spark.sql.expressions.Window.partitionBy("src")
    val annotated = edges
      .select(col(src).as("src"), col(dst).as("dst"))
      .withColumn("outdeg", count(lit(1)).over(w))
    val (edgesWithDeg, edgeBlocks) =
      if (pinEdgePartitioning)
        CheckpointTracking.checkpointHashPartitioned(annotated, Seq("src"), Seq("src"))
      else checkpointTracked(annotated)
    // In pinned mode the node universe is ALSO checkpointed
    // hash-partitioned (on node): the per-iteration teleport left-join
    // (nodes ⋈ contribs on node = dst) then shuffles only the contribs
    // stream — without it the node table re-shuffles every round, which
    // at 100M+ nodes is exactly the cost the pinned regime exists to
    // avoid.
    val nodeUniverse = edgesWithDeg
      .select(col("src").as("node"))
      .union(edgesWithDeg.select(col("dst").as("node")))
      .distinct()
    val (nodes, nodeBlocks) =
      if (pinEdgePartitioning)
        CheckpointTracking.checkpointHashPartitioned(nodeUniverse, Seq("node"), Seq("node"))
      else checkpointTracked(nodeUniverse)

    // teleport targets: the whole universe (classic) or the restart
    // set (personalized); |targets| is the only count the run needs
    val n = sourcePred match {
      case None    => nodes.count()
      case Some(p) => nodes.filter(expr(p)).count()
    }
    // an empty GRAPH yields an empty rank table for either variant
    // (the max(n, 1) guards below); a non-empty graph whose restart
    // set matches nothing is a caller error — every rank would be 0
    require(
      sourcePred.isEmpty || n > 0 || nodes.isEmpty,
      "personalized PageRank needs a non-empty source set"
    )
    val base = (15L * Scale) / (100L * math.max(n, 1L))
    val isTarget = sourcePred.map(expr).getOrElse(lit(true))

    var (rank, prevBlocks) = checkpointTracked(
      nodes.withColumn(
        "rank_e12",
        when(isTarget, lit(Scale / math.max(n, 1L))).otherwise(lit(0L))
      )
    )
    for (_ <- 1 to iters) {
      val contribs = edgesWithDeg
        .join(rank, edgesWithDeg("src") === rank("node"))
        .select(col("dst"), expr("rank_e12 div outdeg").as("contrib"))
        .groupBy("dst")
        .agg(sum("contrib").as("s"))
      // every teleport target keeps receiving its restart mass even
      // with no in-edges, hence the left join from the full universe
      val next = nodes
        .join(contribs, nodes("node") === contribs("dst"), "left")
        .select(
          col("node"),
          (when(isTarget, lit(base)).otherwise(lit(0L)) +
            expr("(85 * coalesce(s, 0L)) div 100")).as("rank_e12")
        )
      val (ck, blocks) = checkpointTracked(next)
      CheckpointTracking.free(ck, prevBlocks)
      rank = ck
      prevBlocks = blocks
    }
    // the returned rank is itself checkpointed (lineage truncated), so
    // the edge/node scaffolding blocks are no longer reachable from it —
    // free them here instead of leaking one edge-table-sized persisted
    // copy per ranks() call in long-lived library callers
    CheckpointTracking.free(rank, edgeBlocks ++ nodeBlocks)
    rank
  }
}
