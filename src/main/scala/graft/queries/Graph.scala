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
    // one distinct pass, then BOTH directions from a single explode —
    // the union-of-swapped-selves shape re-ran the distinct aggregate
    // once per branch (two HashAggregates over the reused exchange);
    // node parity (customer 2k, supplier 2k+1) guarantees the swap can
    // never collide with a forward edge, so exploding after one
    // distinct is set-identical
    Tables(s, dir, "orders")
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
      .select(
        explode(
          array(
            struct(col("src"), col("dst")),
            struct(col("dst").as("src"), col("src").as("dst"))
          )
        ).as("e")
      )
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
  }

  /** Distinct co-purchase edges between parts (u < v): parts appearing
    * in the same order. Candidate generation is BASKET-BOUNDED — an
    * order with t distinct parts yields t(t−1)/2 pairs and t is capped
    * by order size, so the pair stream is linear in orders at any
    * corpus scale (never quadratic in parts). One groupBy(order) with
    * a partially-aggregated collect_set, pair expansion LOCAL per
    * basket (sorted array → ordered struct pairs), then the distinct
    * every dedup pays — measurably cheaper than the equivalent
    * self-join, which shuffles the item table twice more.
    */
  private def partEdges(
      s: org.apache.spark.sql.SparkSession,
      dir: String,
      orderMod: Long = 1L
  ): org.apache.spark.sql.DataFrame =
    Tables(s, dir, "lineitem")
      .filter(col("l_orderkey") % orderMod === 0)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .groupBy("o")
      .agg(sort_array(collect_set(col("p"))).as("ps"))
      .select(
        explode(
          expr(
            "flatten(transform(ps, (x, i) -> transform(slice(ps, i + 2, size(ps)), y -> struct(x AS u, y AS v))))"
          )
        ).as("pr")
      )
      .select(col("pr.u").as("u"), col("pr.v").as("v"))
      .distinct()

  /** Shared oracle prefix: the same co-purchase edge set in DuckDB. */
  private def edgeCteOver(liFilter: String): String =
    s"""li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem $liFilter),
        e0 AS (SELECT DISTINCT a.p AS u, b.p AS v
               FROM li a JOIN li b ON a.o = b.o AND a.p < b.p)"""

  private val edgeCte = edgeCteOver("")

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

  /** The q194/q204 triangle dataflow (degree-ordered orientation +
    * per-edge out-neighbor intersection, Latapy 2008) in its two
    * physical regimes:
    *
    *  - `broadcastAdjacency = true` (q194): the adjacency table is
    *    NODE-scaled (one row per node, Σ outdeg = m entries total);
    *    attaching it by broadcast keeps the edge stream exchange-free
    *    past the orientation step. The right plan while the adjacency
    *    fits an executor.
    *  - `broadcastAdjacency = false` (q204, the beyond-broadcast
    *    regime — q115's gate pattern): the oriented edges are
    *    checkpointed hash-partitioned AND sorted on src
    *    (CheckpointTracking.checkpointHashPartitioned), so the
    *    adjacency groupBy and the first sort-merge join BOTH consume
    *    that one layout exchange-free; only the dst-side join
    *    shuffles. Orientation bounds every adjacency array at O(√m),
    *    so each shuffled row is bounded too — the payload never holds
    *    a hub's full neighborhood. Costs the array duplication an SMJ
    *    implies, which is exactly the price of outgrowing broadcast.
    *
    * Both enumerate the identical triangle set (the oracle's
    * id-ordered SQL formulation is layout-independent), each common
    * out-neighbor closing one triangle exactly once.
    */
  private def triangleCensus(
      edges: org.apache.spark.sql.DataFrame,
      broadcastAdjacency: Boolean
  ): org.apache.spark.sql.DataFrame = {
    val e = edges.cache()
    val deg = e
      .select(col("u").as("n"))
      .unionAll(e.select(col("v").as("n")))
      .groupBy("n")
      .agg(count(lit(1)).as("d"))
    val ed = e
      .join(deg.select(col("n").as("u"), col("d").as("du")), Seq("u"))
      .join(deg.select(col("n").as("v"), col("d").as("dv")), Seq("v"))
    val lower = col("du") < col("dv") || (col("du") === col("dv") && col("u") < col("v"))
    val o0 = ed
      .select(
        when(lower, col("u")).otherwise(col("v")).as("src"),
        when(lower, col("v")).otherwise(col("u")).as("dst")
      )
    val o =
      if (broadcastAdjacency) o0.cache()
      else
        graft.operators.CheckpointTracking
          .checkpointHashPartitioned(o0, Seq("src"), Seq("src"))
          ._1
    val nbrs0 = o.groupBy("src").agg(sort_array(collect_list("dst")).as("ns"))
    // the adjacency feeds BOTH joins: in the broadcast regime the
    // broadcast itself materializes it once; in the SMJ regime pin it
    // hash-partitioned on src so the src-side join stays exchange-free
    // and the dst-side join re-shuffles from a materialized table
    // instead of re-aggregating
    val nbrs =
      if (broadcastAdjacency) nbrs0
      else
        graft.operators.CheckpointTracking
          .checkpointHashPartitioned(nbrs0, Seq("src"), Seq("src"))
          ._1
    def side(df: org.apache.spark.sql.DataFrame) =
      if (broadcastAdjacency) broadcast(df) else df
    val closed = o
      .join(side(nbrs.select(col("src"), col("ns").as("nu"))), Seq("src"))
      .join(side(nbrs.select(col("src").as("dst"), col("ns").as("nv"))), Seq("dst"))
      .select(
        col("src").as("u"),
        col("dst").as("v"),
        expr("array_intersect(nu, nv)").as("common")
      )
      .withColumn("cnt", size(col("common")).cast("long"))
      .filter(col("cnt") > 0)
      .cache()
    val perNode = closed
      .select(
        explode(
          expr(
            """concat(
                 array(struct(u AS node, cnt AS c), struct(v AS node, cnt AS c)),
                 transform(common, x -> struct(x AS node, CAST(1 AS BIGINT) AS c)))"""
          )
        ).as("e")
      )
      .select(col("e.node").as("node"), col("e.c").as("c"))
      .groupBy("node")
      .agg(sum("c").as("n_tri"))
    val top = perNode
      .groupBy()
      .agg(expr("top_k_structs(struct(-n_tri AS nn, node), 20)").as("ks"))
      .select(explode(col("ks")).as("k"))
      .select(col("k.node").cast("string").as("node"), (-col("k.nn")).as("n_tri"))
    val total = closed
      .groupBy()
      .agg(coalesce(sum("cnt"), lit(0L)).as("n_tri"))
      .select(lit("ALL").as("node"), col("n_tri"))
    top.unionByName(total).orderBy(desc("n_tri"), asc("node"))
  }

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
    ),

    // ------------------------------------------------------------------
    // Triangle counting over the part co-purchase graph — the
    // clustering-structure metric, via degree-ordered orientation +
    // per-edge neighbor-list intersection (the compact-forward scheme,
    // Latapy 2008): orient every edge from its lower-(degree, id)
    // endpoint to the higher, build each node's OUT-neighbor list, and
    // close each oriented edge (u, v) against
    // array_intersect(N⁺(u), N⁺(v)) — every common out-neighbor is one
    // triangle, found exactly once. Orientation bounds out-degrees by
    // O(√m) (a node only points at nodes of ≥ its degree), so the
    // intersection work is Σ outdeg² ≪ Σ deg² — robust to power-law
    // hubs — and, critically for Spark, that superlinear term stays
    // COMPUTE-LOCAL inside one projection: the exchanges carry only
    // O(m) edge/adjacency rows, never the wedge stream (the naive
    // wedge self-join shuffles Σ outdeg² rows — measured 6× slower at
    // sf0.1). The oracle counts the same triangles with the id-ordered
    // SQL formulation (orientation changes the enumeration, never the
    // set). Per-node participation: u and v credit |common| each, each
    // common node credits 1. ORACLE-EXACT.
    QueryDef(
      "q194_triangles",
      (s, dir) => triangleCensus(partEdges(s, dir), broadcastAdjacency = true),
      Some(triangleOracle("")),
    ),

    // ------------------------------------------------------------------
    // The SAME triangle census in the beyond-broadcast regime (q115's
    // gate pattern): broadcast is disabled in a session clone —
    // standing in for an adjacency table past any executor's broadcast
    // reach — and the oriented edge table is checkpointed
    // hash-partitioned + sorted on src, so the adjacency build and the
    // first sort-merge join consume one layout exchange-free; only the
    // dst-side join shuffles, and orientation bounds every shuffled
    // adjacency array at O(√m). Runs on the quarter graph
    // (l_orderkey % 4 = 0), q115's scale discipline: the pinned-SMJ
    // plan SHAPE is what this query certifies (GraphStructureSpec
    // asserts no broadcast of the adjacency), and the full-graph
    // broadcast regime is already q194's bench row. ORACLE-EXACT.
    QueryDef(
      "q204_triangles_smj",
      (s, dir) => {
        val s2 = s.newSession()
        s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        triangleCensus(partEdges(s2, dir, orderMod = 4L), broadcastAdjacency = false)
      },
      Some(triangleOracle("WHERE l_orderkey % 4 = 0")),
    ),

    // ------------------------------------------------------------------
    // Bounded k-core peeling (k = 80, 3 synchronous sweeps toward the
    // k-core fixpoint — the q171 bounded-sweep discipline): each sweep
    // recomputes degrees over the surviving edges and drops every node
    // below k, converging on the dense core that survives cascading
    // deletions. The core/periphery split is the curation signal
    // triangle counts approximate locally: domains that stay connected
    // AFTER their weak neighbors are removed. Per sweep: one keyed
    // degree aggregate + two semi joins (key-only shuffles); edges are
    // localCheckpointed per sweep so lineage stays one sweep deep
    // (PageRank/LabelPropagation discipline). The oracle unrolls the
    // identical 3 sweeps as CTEs. ORACLE-EXACT.
    QueryDef(
      "q195_kcore",
      (s, dir) => {
        val kMin = 80
        var edges = partEdges(s, dir).localCheckpoint()
        var survivors: org.apache.spark.sql.DataFrame = null
        (1 to 3).foreach { _ =>
          val deg = edges
            .select(col("u").as("n"))
            .unionAll(edges.select(col("v").as("n")))
            .groupBy("n")
            .agg(count(lit(1)).as("d"))
          survivors = deg.filter(col("d") >= kMin).select("n").localCheckpoint()
          edges = edges
            .join(survivors.select(col("n").as("u")), Seq("u"), "left_semi")
            .join(survivors.select(col("n").as("v")), Seq("v"), "left_semi")
            .localCheckpoint()
        }
        val finalDeg = edges
          .select(col("u").as("n"))
          .unionAll(edges.select(col("v").as("n")))
          .groupBy("n")
          .agg(count(lit(1)).as("d"))
        val surv = survivors
          .join(finalDeg, Seq("n"), "left")
          .na
          .fill(0L, Seq("d"))
        val top = surv
          .groupBy()
          .agg(expr("top_k_structs(struct(-d AS nd, n), 20)").as("ks"))
          .select(explode(col("ks")).as("k"))
          .select(col("k.n").cast("string").as("node"), (-col("k.nd")).as("core_deg"))
        val allRow = survivors
          .groupBy()
          .agg(count(lit(1)).as("core_deg"))
          .select(lit("ALL").as("node"), col("core_deg"))
        top.unionByName(allRow).orderBy(desc("core_deg"), asc("node"))
      },
      Some(s"""WITH $edgeCte,
        d1 AS (SELECT n, count(*) AS d FROM (
                 SELECT u AS n FROM e0 UNION ALL SELECT v FROM e0) GROUP BY n),
        s1 AS (SELECT n FROM d1 WHERE d >= 80),
        e1 AS (SELECT * FROM e0 WHERE u IN (SELECT n FROM s1) AND v IN (SELECT n FROM s1)),
        d2 AS (SELECT n, count(*) AS d FROM (
                 SELECT u AS n FROM e1 UNION ALL SELECT v FROM e1) GROUP BY n),
        s2 AS (SELECT n FROM d2 WHERE d >= 80),
        e2 AS (SELECT * FROM e1 WHERE u IN (SELECT n FROM s2) AND v IN (SELECT n FROM s2)),
        d3 AS (SELECT n, count(*) AS d FROM (
                 SELECT u AS n FROM e2 UNION ALL SELECT v FROM e2) GROUP BY n),
        s3 AS (SELECT n FROM d3 WHERE d >= 80),
        e3 AS (SELECT * FROM e2 WHERE u IN (SELECT n FROM s3) AND v IN (SELECT n FROM s3)),
        fd AS (SELECT n, count(*) AS d FROM (
                 SELECT u AS n FROM e3 UNION ALL SELECT v FROM e3) GROUP BY n),
        surv AS (SELECT s3.n, COALESCE(fd.d, 0) AS d
                 FROM s3 LEFT JOIN fd ON fd.n = s3.n),
        top AS (SELECT n, d FROM surv ORDER BY d DESC, n LIMIT 20)
        SELECT node, core_deg FROM (
          SELECT CAST(n AS VARCHAR) AS node, CAST(d AS BIGINT) AS core_deg FROM top
          UNION ALL SELECT 'ALL', (SELECT count(*) FROM s3))
        ORDER BY core_deg DESC, node""")
    ),

    // ------------------------------------------------------------------
    // EDGE EMBEDDEDNESS (per-edge neighborhood Jaccard) — the
    // link-strength score behind tie-strength ranking and weak-link
    // pruning (Granovetter-style): for every co-purchase edge (u,v),
    // |N(u)∩N(v)| / |N(u)∪N(v) \ {u,v}| in exact ppm. Unlike the
    // triangle census (whose orientation bounds arrays at O(√m)), the
    // DENOMINATOR needs full neighborhoods, so this is the
    // broadcast-analog regime: adjacency arrays are degree-scaled and
    // the intersection runs compute-local in one projection —
    // exchanges carry each edge + two adjacency rows, never the wedge
    // stream. The half graph (orderMod=2) keeps the bench honest; a
    // hub-capped variant (top-c neighbors by id) would be the 100 TB
    // fallback, documented not built — the score itself then becomes
    // approximate. Min-degree floor 3 keeps the ratio meaningful;
    // ties broken by (u, v), so the top-20 is deterministic.
    // ORACLE-EXACT against the symmetric-adjacency SQL restatement.
    QueryDef(
      "q267_edge_jaccard",
      (s, dir) => {
        val e = partEdges(s, dir, orderMod = 2L)
        val sym = e
          .select(col("u").as("n"), col("v").as("nb"))
          .unionAll(e.select(col("v").as("n"), col("u").as("nb")))
        val adj = sym.groupBy("n").agg(sort_array(collect_list("nb")).as("ns"))
        e.join(adj.select(col("n").as("u"), col("ns").as("nu")), Seq("u"))
          .join(adj.select(col("n").as("v"), col("ns").as("nv")), Seq("v"))
          .select(
            col("u"),
            col("v"),
            size(expr("array_intersect(nu, nv)")).cast("long").as("common"),
            size(col("nu")).cast("long").as("du"),
            size(col("nv")).cast("long").as("dv")
          )
          .filter(col("du") >= 3 && col("dv") >= 3)
          .withColumn("jac_ppm", expr("common * 1000000L DIV (du + dv - common - 2)"))
          .orderBy(desc("jac_ppm"), asc("u"), asc("v"))
          .limit(20)
      },
      Some(edgeJaccardOracle("WHERE l_orderkey % 2 = 0"))
    ),

    // ------------------------------------------------------------------
    // BOUNDED MULTI-SOURCE BFS (round 14): shortest-hop distances from
    // a source set over the co-purchase graph, 3 supersteps of frontier
    // relaxation — the Pregel iteration shape (one frontier ⋈ edges
    // join + one anti join against the settled set per hop, frontiers
    // localCheckpointed so lineage stays one superstep deep, the
    // PageRank/k-core discipline). Per superstep the exchange carries
    // the FRONTIER's adjacency, not the graph: expansion is
    // Σ deg(frontier) — at 100 TB the bound is the hop limit, which is
    // exactly why production reachability queries are hop-bounded.
    // The census (per-distance node count + id checksum) pins every
    // settled distance. ORACLE-EXACT (DuckDB recursive CTE, min-dist
    // per node).
    QueryDef(
      "q287_bfs_distances",
      (s, dir) => {
        val e = partEdges(s, dir, orderMod = 2L)
        val sym = e
          .select(col("u").as("src"), col("v").as("dst"))
          .unionAll(e.select(col("v").as("src"), col("u").as("dst")))
          .localCheckpoint()
        var dists = sym
          .select(col("src").as("node"))
          .distinct()
          .filter(col("node") % 97 === 1)
          .withColumn("dist", lit(0L))
          .localCheckpoint()
        var frontier = dists
        (1 to 3).foreach { d =>
          frontier = frontier
            .join(sym, frontier("node") === sym("src"))
            .select(col("dst").as("node"))
            .distinct()
            .join(dists, Seq("node"), "left_anti")
            .withColumn("dist", lit(d.toLong))
            .localCheckpoint()
          dists = dists.unionByName(frontier).localCheckpoint()
        }
        dists
          .groupBy("dist")
          .agg(count(lit(1)).as("n_nodes"), sum("node").as("sum_node"))
          .orderBy("dist")
      },
      Some(s"""WITH RECURSIVE ${edgeCteOver("WHERE l_orderkey % 2 = 0")},
        sym AS (SELECT u AS src, v AS dst FROM e0
                UNION ALL SELECT v, u FROM e0),
        srcs AS (SELECT DISTINCT src AS node FROM sym WHERE src % 97 = 1),
        bfs AS (
          SELECT node, 0 AS dist FROM srcs
          UNION
          SELECT s.dst, b.dist + 1 FROM bfs b
          JOIN sym s ON s.src = b.node WHERE b.dist < 3),
        settled AS (SELECT node, min(dist) AS dist FROM bfs GROUP BY 1)
        SELECT CAST(dist AS BIGINT) AS dist, count(*) AS n_nodes,
               CAST(sum(node) AS BIGINT) AS sum_node
        FROM settled GROUP BY dist ORDER BY dist""")
    ),

    // ------------------------------------------------------------------
    // PERSONALIZED PAGERANK (round 14): q104's power iteration with the
    // teleport RESTRICTED to a restart set (random walk with restart,
    // Gleich 2015 §5) — ranks measure proximity to the sources, the
    // recommendation / related-entity signal. Same fixed-point integer
    // contract (restart mass SCALE/|S| on S, 0 elsewhere; 15% restart +
    // 85% damped flow per round, all DIV arithmetic, so the distributed
    // run is bit-identical to the SQL restatement), same one-join-per-
    // iteration plan. Nodes unreachable from S hold exactly 0.
    // ORACLE-EXACT (3 iterations unrolled as CTEs, top-100).
    QueryDef(
      "q292_personalized_pagerank",
      (s, dir) => top100(
        PageRank.personalizedRanks(
          purchaseGraph(s, dir, orderMod = 2L),
          "src",
          "dst",
          sourcePred = "node % 97 = 1",
          iters = 3
        )
      ),
      Some(s"""WITH fwd AS (
          SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
          FROM orders JOIN lineitem ON l_orderkey = o_orderkey
          WHERE o_orderkey % 2 = 0),
        sym AS (SELECT src, dst FROM fwd
                UNION ALL SELECT dst AS src, src AS dst FROM fwd),
        nodes AS (SELECT DISTINCT node FROM
                  (SELECT src AS node FROM sym UNION ALL SELECT dst FROM sym)),
        deg AS (SELECT src, count(*) AS outdeg FROM sym GROUP BY 1),
        ed AS (SELECT s.src, s.dst, d.outdeg FROM sym s JOIN deg d ON d.src = s.src),
        p AS (SELECT count(*) AS n FROM nodes WHERE node % 97 = 1),
        r0 AS (SELECT node, CASE WHEN node % 97 = 1
                 THEN 1000000000000 // n ELSE 0 END AS rank_e12 FROM nodes, p),
        r1 AS (SELECT nodes.node,
                 CAST(CASE WHEN nodes.node % 97 = 1
                        THEN 15000000000000 // (100 * p.n) ELSE 0 END
                   + (85 * COALESCE(c.s, 0)) // 100 AS BIGINT) AS rank_e12
               FROM nodes CROSS JOIN p
               LEFT JOIN (SELECT ed.dst, sum(r0.rank_e12 // ed.outdeg) AS s
                          FROM ed JOIN r0 ON r0.node = ed.src GROUP BY 1) c
                 ON c.dst = nodes.node),
        r2 AS (SELECT nodes.node,
                 CAST(CASE WHEN nodes.node % 97 = 1
                        THEN 15000000000000 // (100 * p.n) ELSE 0 END
                   + (85 * COALESCE(c.s, 0)) // 100 AS BIGINT) AS rank_e12
               FROM nodes CROSS JOIN p
               LEFT JOIN (SELECT ed.dst, sum(r1.rank_e12 // ed.outdeg) AS s
                          FROM ed JOIN r1 ON r1.node = ed.src GROUP BY 1) c
                 ON c.dst = nodes.node),
        r3 AS (SELECT nodes.node,
                 CAST(CASE WHEN nodes.node % 97 = 1
                        THEN 15000000000000 // (100 * p.n) ELSE 0 END
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
        FROM top ORDER BY rank_e12 DESC, nid""")
    ),

    // ------------------------------------------------------------------
    // NEIGHBORHOOD FUNCTION N(d) AT d ≤ 2 (round 14, the ANF quantity
    // of Palmer/Gibbons/Faloutsos KDD'02): how many distinct nodes are
    // within d hops of each node — per-distance totals, the max (the
    // 2-hop hub), and a reach histogram, the connectivity profile that
    // drives crawl-frontier and sampling decisions. Exact form: the
    // 2-hop pair set is one self-join on the mid vertex + distinct —
    // Σdeg² candidate generation, honest for the orderMod-thinned
    // fixture graph and AS THE ORACLE; the 100 TB path for d ≫ 2 is
    // Flajolet-Martin register merging along edges (each superstep
    // unions neighbors' registers — frontier-scaled like q287, never
    // pair materialization), recorded as the design note in PLANS.md.
    // Self is excluded; dedup before counting makes multiplicities
    // irrelevant. ORACLE-EXACT.
    QueryDef(
      "q305_neighborhood_function",
      (s, dir) => {
        val sym = purchaseGraph(s, dir, orderMod = 2L).localCheckpoint()
        // the ANF methodology: exact reach for a SAMPLED source set —
        // never per-node all-pairs (the first cut of this query
        // materialized the full 2-hop set and cost 34 s at sf0.1, the
        // Σdeg² hub explosion in person; sampled sources make both
        // hops frontier-scaled, the q287 shape)
        val sources = sym
          .select(col("src").as("s0"))
          .distinct()
          .filter(col("s0") % 97 === 1)
        val hop1 = sources
          .join(sym, col("s0") === col("src"))
          .select(col("s0"), col("dst"))
          .distinct()
        val mid = sym.select(col("src").as("m"), col("dst"))
        val hop2 = hop1
          .select(col("s0"), col("dst").as("m"))
          .join(mid, Seq("m"))
          .select(col("s0"), col("dst"))
          .filter(col("s0") =!= col("dst"))
          .unionByName(hop1)
          .distinct()
        def nf(pairs: org.apache.spark.sql.DataFrame, d: Long) = {
          val reach = pairs.groupBy("s0").agg(count(lit(1)).as("r"))
          reach.agg(
            lit(d).as("d"),
            count(lit(1)).as("n_sources"),
            sum("r").as("n_pairs"),
            max("r").as("max_reach"),
            expr("(sum(r) * 1000) DIV count(1)").as("avg_reach_milli")
          )
        }
        nf(hop1, 1L).unionByName(nf(hop2, 2L)).orderBy("d")
      },
      Some(s"""WITH fwd AS (
          SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
          FROM orders JOIN lineitem ON l_orderkey = o_orderkey
          WHERE o_orderkey % 2 = 0),
        sym AS (SELECT src, dst FROM fwd
                UNION ALL SELECT dst AS src, src AS dst FROM fwd),
        srcs AS (SELECT DISTINCT src AS s0 FROM sym WHERE src % 97 = 1),
        hop1 AS (
          SELECT DISTINCT s0, dst FROM srcs JOIN sym ON sym.src = srcs.s0),
        hop2 AS (
          SELECT DISTINCT s0, dst FROM (
            SELECT h.s0, b.dst FROM hop1 h JOIN sym b ON b.src = h.dst
            WHERE h.s0 <> b.dst
            UNION ALL SELECT s0, dst FROM hop1)),
        r1 AS (SELECT s0, count(*) AS r FROM hop1 GROUP BY 1),
        r2 AS (SELECT s0, count(*) AS r FROM hop2 GROUP BY 1)
        SELECT CAST(1 AS BIGINT) AS d, count(*) AS n_sources,
               CAST(sum(r) AS BIGINT) AS n_pairs, CAST(max(r) AS BIGINT) AS max_reach,
               CAST((sum(r) * 1000) // count(*) AS BIGINT) AS avg_reach_milli
        FROM r1
        UNION ALL
        SELECT 2, count(*), CAST(sum(r) AS BIGINT), CAST(max(r) AS BIGINT),
               CAST((sum(r) * 1000) // count(*) AS BIGINT)
        FROM r2
        ORDER BY d""")
    ),

    // ------------------------------------------------------------------
    // ANF REGISTER-MERGE SUPERSTEPS (round 15): q305's design note made
    // real — the Flajolet-Martin register union of Palmer/Gibbons/
    // Faloutsos KDD'02, the 100 TB path for N(d) at d ≫ 2. Every node
    // carries 32 FM registers (one deterministic xxhash64 bit each);
    // each superstep ORs a node's registers with its neighbors' — ONE
    // edge-scaled join + one (node, trial) bit_or per distance, never
    // pair materialization, so d = 4 costs four passes while the exact
    // form's Σdeg⁴ candidates would explode (q305's own first cut blew
    // up at d = 2). Validation rides the query: for d ≤ 2 the exact
    // sampled-source reach (q305's machinery, self included) is
    // computed alongside and the estimator error is REQUIREd within
    // the FM bound (k = 32 → σ ≈ 13.6% of log₂N; 25% headroom at the
    // ppm gate); d = 3, 4 are estimate-only — the regime exact cannot
    // reach. No oracle: DuckDB has no 64-bit register algebra to
    // restate this; rows + the in-query bound + AnfSketchSpec's
    // bit-identical register property are the gate.
    QueryDef(
      "q315_anf_register_sketch",
      (s, dir) => {
        import graft.operators.AnfSketch
        val sym = purchaseGraph(s, dir, orderMod = 2L).localCheckpoint()
        val nodes = sym.select(col("src").as("node")).distinct().localCheckpoint()
        val sources = nodes.filter(col("node") % 97 === 1)
        val nSources = sources.count()
        // exact reach (self included) for the sampled sources, d ≤ 2
        val hop1 = sources
          .select(col("node").as("s0"))
          .join(sym, col("s0") === col("src"))
          .select(col("s0"), col("dst"))
          .distinct()
          .localCheckpoint()
        val hop2 = hop1
          .select(col("s0"), col("dst").as("m"))
          .join(sym.select(col("src").as("m"), col("dst")), Seq("m"))
          .select(col("s0"), col("dst"))
          .filter(col("s0") =!= col("dst"))
          .unionByName(hop1)
          .distinct()
        val exactInclSelf = Map(
          1 -> (hop1.count() + nSources),
          2 -> (hop2.count() + nSources)
        )
        var regs = AnfSketch.initRegisters(nodes, k = 32).localCheckpoint()
        val rows = (1 to 4).map { d =>
          regs = AnfSketch.superstep(regs, sym).localCheckpoint()
          val est = AnfSketch
            .estimate(regs)
            .join(sources, Seq("node"))
            .agg(sum("est"))
            .head()
            .getDouble(0)
          val exact = exactInclSelf.get(d)
          val errPpm = exact.map(e => math.abs(est - e) / e * 1e6)
          errPpm.foreach { err =>
            require(
              err <= 250000d,
              s"ANF estimate at d=$d off by ${err / 10000}% — outside the FM bound"
            )
          }
          (
            d.toLong,
            nSources,
            exact,
            math.floor(est).toLong,
            errPpm.map(e => math.floor(e).toLong)
          )
        }
        val sess = s
        import sess.implicits._
        rows
          .toDF("d", "n_sources", "exact_reach", "est_reach", "err_ppm")
          .orderBy("d")
      },
      None
    ),

    // ------------------------------------------------------------------
    // EFFECTIVE DIAMETER (round 15): the question ANF exists to answer
    // (Palmer/Gibbons/Faloutsos §1 — "how many hops until the graph is
    // effectively covered?"): run register supersteps to convergence
    // and report, per distance, the estimated TOTAL reach Σ_v N(d,v)
    // and its share of the converged mass; the effective diameter is
    // the smallest d whose share reaches 90%. Convergence is detected
    // from the estimates themselves (relative growth < 0.5%, cap 8
    // supersteps — each is one edge-scaled join, so the cap bounds
    // cost, not correctness). In-query REQUIRE pins the sketch's
    // structural MONOTONICITY: registers only gain bits under OR, so
    // the lowest-zero index — and with it every estimate — can never
    // decrease across supersteps; a violation means the superstep
    // merged registers wrong. No oracle (register algebra; the exact
    // d ≤ 2 validation lives in q315, the bit-identical union property
    // in AnfSketchSpec).
    QueryDef(
      "q317_effective_diameter",
      (s, dir) => {
        import graft.operators.AnfSketch
        val sym = purchaseGraph(s, dir, orderMod = 2L).localCheckpoint()
        val nodes = sym.select(col("src").as("node")).distinct().localCheckpoint()
        var regs = AnfSketch.initRegisters(nodes, k = 32).localCheckpoint()
        val totals = scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
        var d = 0L
        var converged = false
        while (!converged && d < 8) {
          d += 1
          regs = AnfSketch.superstep(regs, sym).localCheckpoint()
          val tot = AnfSketch.estimate(regs).agg(sum("est")).head().getDouble(0)
          totals.lastOption.foreach { case (_, prev) =>
            require(
              tot >= prev * (1 - 1e-9),
              s"ANF total reach shrank at d=$d ($prev -> $tot) — register merge broken"
            )
            if (tot <= prev * 1.005) converged = true
          }
          totals += ((d, tot))
        }
        val finalTot = totals.last._2
        val effDiam = totals.find(_._2 >= 0.9 * finalTot).map(_._1).get
        val sess = s
        import sess.implicits._
        totals.toSeq
          .map { case (dd, tot) =>
            (
              dd,
              math.floor(tot).toLong,
              math.floor(tot / finalTot * 1e6).toLong,
              dd == effDiam
            )
          }
          .toDF("d", "est_total_reach", "share_ppm", "is_effective_diameter")
          .orderBy("d")
      },
      None
    )
  )

  /** q267's DuckDB restatement: per-edge common-neighbor counts from
    * the symmetric adjacency, Jaccard over the union excluding the
    * endpoints themselves. */
  private def edgeJaccardOracle(liFilter: String): String = s"""WITH ${edgeCteOver(liFilter)},
        sym AS (SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0),
        deg AS (SELECT u AS n, count(*) AS d FROM sym GROUP BY 1),
        com AS (SELECT e.u, e.v, count(*) AS c
                FROM e0 e JOIN sym a ON a.u = e.u JOIN sym b ON b.u = e.v AND b.v = a.v
                GROUP BY 1, 2),
        j AS (SELECT e.u, e.v, COALESCE(c.c, 0) AS common, du.d AS du, dv.d AS dv
              FROM e0 e
              LEFT JOIN com c ON c.u = e.u AND c.v = e.v
              JOIN deg du ON du.n = e.u JOIN deg dv ON dv.n = e.v)
        SELECT u, v, CAST(common AS BIGINT) AS common,
               CAST(du AS BIGINT) AS du, CAST(dv AS BIGINT) AS dv,
               CAST(common * 1000000 // (du + dv - common - 2) AS BIGINT) AS jac_ppm
        FROM j WHERE du >= 3 AND dv >= 3
        ORDER BY jac_ppm DESC, u, v LIMIT 20"""

  /** q194/q204's DuckDB restatement — id-ordered triangle enumeration
    * over the (optionally filtered) co-purchase graph, with an OUTER
    * order matching the Spark side (the union rows arrive ordered, not
    * incidentally). */
  private def triangleOracle(liFilter: String): String = s"""WITH ${edgeCteOver(liFilter)},
        t AS (SELECT e1.u AS x, e1.v AS y, e2.v AS z
              FROM e0 e1 JOIN e0 e2 ON e2.u = e1.v
              JOIN e0 e3 ON e3.u = e1.u AND e3.v = e2.v),
        pn AS (SELECT node, count(*) AS n_tri FROM (
                 SELECT x AS node FROM t
                 UNION ALL SELECT y FROM t
                 UNION ALL SELECT z FROM t) GROUP BY node),
        top AS (SELECT node, n_tri FROM pn ORDER BY n_tri DESC, node LIMIT 20)
        SELECT node, n_tri FROM (
          SELECT CAST(node AS VARCHAR) AS node, n_tri FROM top
          UNION ALL SELECT 'ALL', (SELECT count(*) FROM t))
        ORDER BY n_tri DESC, node"""

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
