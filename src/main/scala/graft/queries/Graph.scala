package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.operators.PageRank

/** Graph-centrality queries (SURVEY.md §2.3 — training-pipeline
  * extensions). Corpus curation at crawl scale ranks sources/domains by
  * link centrality and feeds the score into quality weighting and
  * sampling; the engine's instantiation runs PageRank over the
  * customer↔supplier co-purchase graph derived from orders⋈lineitem —
  * same bipartite "entity linked to entity by interaction" shape as a
  * domain/citation graph, built entirely from the testdata tables.
  */
object Graph {

  /** Symmetrized customer↔supplier purchase graph. Internal node ids
    * are numeric (customer 2k, supplier 2k+1): longs shuffle, sort, and
    * hash several times faster than strings across the iterations; the
    * readable c<id>/s<id> label is applied only to the 100 output rows.
    */
  private def purchaseGraph(
      s: org.apache.spark.sql.SparkSession,
      dir: String,
      orderMod: Long = 1L
  ) = {
    val fwd = Tables(s, dir, "orders")
      .select("o_orderkey", "o_custkey")
      .filter(col("o_orderkey") % orderMod === 0)
      .join(
        Tables(s, dir, "lineitem").select("l_orderkey", "l_suppkey"),
        col("o_orderkey") === col("l_orderkey")
      )
      .select(
        (col("o_custkey") * 2).as("src"),
        (col("l_suppkey") * 2 + 1).as("dst")
      )
      .distinct()
    fwd.union(fwd.select(col("dst").as("src"), col("src").as("dst")))
  }

  private def top100(ranked: org.apache.spark.sql.DataFrame) =
    ranked
      .orderBy(desc("rank_e12"), asc("node"))
      .limit(100)
      .select(
        expr(
          "CASE WHEN node % 2 = 0 THEN 'c' || CAST(node DIV 2 AS STRING) " +
            "ELSE 's' || CAST(node DIV 2 AS STRING) END"
        ).as("node"),
        col("rank_e12")
      )

  val defs: Seq[QueryDef] = Seq(
    // ------------------------------------------------------------------
    // Fixed-point integer PageRank (operators/PageRank): 3 power
    // iterations, damping 0.85, ranks in 1e-12 units. Integer
    // arithmetic makes the distributed sum order-independent, so the
    // DuckDB restatement (the same three iterations unrolled as chained
    // CTEs — recursive CTEs cannot aggregate over the recursive
    // reference) hash-matches exactly. Edges: distinct customer→supplier
    // purchase pairs, symmetrized so rank flows both ways.
    QueryDef(
      "q104_pagerank",
      (s, dir) => top100(PageRank.ranks(purchaseGraph(s, dir), "src", "dst", iters = 3)),
      Some(pagerankOracle())
    ),

    // ------------------------------------------------------------------
    // The SAME PageRank in the both-sides-big regime (100M+-node
    // posture): broadcast is disabled in a session clone — standing in
    // for a rank table past any broadcast threshold — and the edge
    // table is checkpointed hash-partitioned + sorted on src
    // (CheckpointTracking.checkpointHashPartitioned via the
    // PartitionedCheckpoint shim), so each iteration's sort-merge join
    // re-shuffles ONLY the narrow (node, rank) side. Integer arithmetic
    // is layout-independent, so the oracle hash-checks that the
    // physical-plan switch changes nothing semantically. The gate runs
    // on the quarter graph (o_orderkey % 4 = 0): the pinned-SMJ plan
    // SHAPE is what this query certifies — PageRankSpec asserts the
    // single-exchange iteration and pinned-teleport plans directly, and
    // the full-graph broadcast regime is already q104's bench row — so
    // measuring the checkpoint+SMJ machinery on 4× the edges bought no
    // extra evidence for ~10% of the whole bench (round-7 verdict #5).
    QueryDef(
      "q115_pagerank_smj",
      (s, dir) => {
        val s2 = s.newSession()
        s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        top100(
          PageRank.ranks(
            purchaseGraph(s2, dir, orderMod = 4L),
            "src",
            "dst",
            iters = 3,
            pinEdgePartitioning = true
          )
        )
      },
      Some(pagerankOracle("WHERE o_orderkey % 4 = 0"))
    ),

    // ------------------------------------------------------------------
    // Community detection by determinized mode-label propagation
    // (operators/LabelPropagation): 3 synchronous sweeps over the same
    // co-purchase graph, each node adopting its neighbors' most
    // frequent label (ties → smallest). Distinct from connected
    // components — bounded sweeps find DENSE regions, the structure a
    // crawl-graph curation pass weights domains by. The total tie
    // order makes the sweep a pure function of the graph, so the
    // oracle unrolls the identical 3 sweeps as CTEs (mode = rank-1
    // row per node, same (count DESC, label) order as the 1-entry
    // bounded heap) and hash-matches the top-50 community census.
    QueryDef(
      "q171_label_propagation",
      (s, dir) => {
        val labels =
          graft.operators.LabelPropagation.propagate(purchaseGraph(s, dir), iters = 3)
        labels
          .groupBy("label")
          .agg(count(lit(1)).as("n_members"))
          .orderBy(desc("n_members"), asc("label"))
          .limit(50)
          .select(
            expr(
              "CASE WHEN label % 2 = 0 THEN 'c' || CAST(label DIV 2 AS STRING) " +
                "ELSE 's' || CAST(label DIV 2 AS STRING) END"
            ).as("community"),
            col("n_members")
          )
      },
      Some("""WITH fwd AS (
          SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
          FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
        sym AS (SELECT src, dst FROM fwd
                UNION ALL SELECT dst AS src, src AS dst FROM fwd),
        nodes AS (SELECT DISTINCT node FROM
                  (SELECT src AS node FROM sym UNION ALL SELECT dst FROM sym)),
        l0 AS (SELECT node, node AS label FROM nodes),
        l1 AS (SELECT dst AS node, label FROM (
                 SELECT dst, label,
                        row_number() OVER (PARTITION BY dst ORDER BY cnt DESC, label) AS rk
                 FROM (SELECT e.dst, l.label, count(*) AS cnt
                       FROM sym e JOIN l0 l ON l.node = e.src GROUP BY 1, 2))
               WHERE rk = 1),
        l2 AS (SELECT dst AS node, label FROM (
                 SELECT dst, label,
                        row_number() OVER (PARTITION BY dst ORDER BY cnt DESC, label) AS rk
                 FROM (SELECT e.dst, l.label, count(*) AS cnt
                       FROM sym e JOIN l1 l ON l.node = e.src GROUP BY 1, 2))
               WHERE rk = 1),
        l3 AS (SELECT dst AS node, label FROM (
                 SELECT dst, label,
                        row_number() OVER (PARTITION BY dst ORDER BY cnt DESC, label) AS rk
                 FROM (SELECT e.dst, l.label, count(*) AS cnt
                       FROM sym e JOIN l2 l ON l.node = e.src GROUP BY 1, 2))
               WHERE rk = 1),
        sel AS (SELECT label, count(*) AS n_members FROM l3 GROUP BY label
                ORDER BY n_members DESC, label LIMIT 50)
        SELECT CASE WHEN label % 2 = 0 THEN 'c' || CAST(label // 2 AS VARCHAR)
                    ELSE 's' || CAST(label // 2 AS VARCHAR) END AS community,
               CAST(n_members AS BIGINT) AS n_members
        FROM sel ORDER BY n_members DESC, label""")
    )
  )

  private def pagerankOracle(fwdFilter: String = ""): String = s"""WITH fwd AS (
          SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
          FROM orders JOIN lineitem ON l_orderkey = o_orderkey $fwdFilter),
        sym AS (SELECT src, dst FROM fwd
                UNION ALL SELECT dst AS src, src AS dst FROM fwd),
        nodes AS (SELECT DISTINCT node FROM
                  (SELECT src AS node FROM sym UNION ALL SELECT dst FROM sym)),
        deg AS (SELECT src, count(*) AS outdeg FROM sym GROUP BY 1),
        ed AS (SELECT s.src, s.dst, d.outdeg FROM sym s JOIN deg d ON d.src = s.src),
        p AS (SELECT count(*) AS n FROM nodes),
        r0 AS (SELECT node, 1000000000000 // n AS rank_e12 FROM nodes, p),
        r1 AS (SELECT nodes.node,
                 CAST((15000000000000 // (100 * p.n))
                   + (85 * COALESCE(c.s, 0)) // 100 AS BIGINT) AS rank_e12
               FROM nodes CROSS JOIN p
               LEFT JOIN (SELECT ed.dst, sum(r0.rank_e12 // ed.outdeg) AS s
                          FROM ed JOIN r0 ON r0.node = ed.src GROUP BY 1) c
                 ON c.dst = nodes.node),
        r2 AS (SELECT nodes.node,
                 CAST((15000000000000 // (100 * p.n))
                   + (85 * COALESCE(c.s, 0)) // 100 AS BIGINT) AS rank_e12
               FROM nodes CROSS JOIN p
               LEFT JOIN (SELECT ed.dst, sum(r1.rank_e12 // ed.outdeg) AS s
                          FROM ed JOIN r1 ON r1.node = ed.src GROUP BY 1) c
                 ON c.dst = nodes.node),
        r3 AS (SELECT nodes.node,
                 CAST((15000000000000 // (100 * p.n))
                   + (85 * COALESCE(c.s, 0)) // 100 AS BIGINT) AS rank_e12
               FROM nodes CROSS JOIN p
               LEFT JOIN (SELECT ed.dst, sum(r2.rank_e12 // ed.outdeg) AS s
                          FROM ed JOIN r2 ON r2.node = ed.src GROUP BY 1) c
                 ON c.dst = nodes.node),
        top AS (SELECT node AS nid, rank_e12 FROM r3
                ORDER BY rank_e12 DESC, node LIMIT 100)
        SELECT CASE WHEN nid % 2 = 0 THEN 'c' || CAST(nid // 2 AS VARCHAR)
                    ELSE 's' || CAST(nid // 2 AS VARCHAR) END AS node,
               rank_e12
        FROM top ORDER BY rank_e12 DESC, nid"""
}
