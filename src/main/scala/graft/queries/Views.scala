package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.plans.ViewRewrite

/** Materialized-view transparency (plans/ViewRewrite): consumers write
  * their aggregates against the BASE corpus; the Catalyst optimizer
  * rule answers them from the summary table. The view layer the
  * engine's FeedView maintains incrementally becomes invisible to the
  * query author — the OLAP summary-table contract, done by the
  * optimizer instead of by hand-rewritten SQL.
  */
object Views {

  /** Scan roots of every file relation in the optimized plan. */
  private def scannedRoots(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan
      .collect { case l: LogicalRelation =>
        l.relation match {
          case fs: HadoopFsRelation => fs.location.rootPaths.map(_.toString)
          case _                    => Nil
        }
      }
      .flatten

  val defs: Seq[QueryDef] = Seq(
    // ------------------------------------------------------------------
    // Automatic materialized-view rewrite (the engine's first
    // Rule[LogicalPlan], registered through SparkSessionExtensions):
    // a (lang, source)-grained summary of the base corpus is
    // materialized once; two consumer aggregates are then written
    // AGAINST THE BASE — a per-lang rollup and a source-filtered
    // per-lang min — and the optimizer rule rewrites both into
    // groups-scaled rollups over the view (count → sum(cnt),
    // sum → sum(sum_chars), min → min(min_chars); filters on group
    // columns ride along). At 100 TB that is a corpus scan + shuffle
    // replaced by an O(groups) read, picked up by EVERY matching
    // consumer query with zero query changes. The fn REQUIRES the
    // rewrite fired (optimized plans must scan the view, not the
    // base), so the correctness gate doubles as a plan regression
    // gate; values are ORACLE-EXACT against a direct restatement of
    // `documents` — the rewrite is only right if it is invisible.
    // Soundness guards (avg/distinct/global/non-group filters refuse
    // the rewrite) are pinned by ViewRewriteSpec.
    QueryDef(
      "q224_view_rewrite",
      (s, dir) => {
        val base = Similarity.freshIndexDir("mv_base")
        val view = Similarity.freshIndexDir("mv_view")
        Tables(s, dir, "documents")
          .filter(col("doc_id") % 2 === 0)
          .select("doc_id", "lang", "source", "n_chars")
          .write
          .mode("overwrite")
          .parquet(base)
        s.read
          .parquet(base)
          .groupBy("lang", "source")
          .agg(
            count(lit(1)).as("cnt"),
            sum("n_chars").as("sum_chars"),
            min("n_chars").as("min_chars"),
            max("n_chars").as("max_chars")
          )
          .write
          .mode("overwrite")
          .parquet(view)
        ViewRewrite.register(
          s,
          base,
          view,
          Seq("lang", "source"),
          Seq(
            ViewRewrite.ViewAgg("count", "", "cnt"),
            ViewRewrite.ViewAgg("sum", "n_chars", "sum_chars"),
            ViewRewrite.ViewAgg("min", "n_chars", "min_chars"),
            ViewRewrite.ViewAgg("max", "n_chars", "max_chars")
          )
        )
        try {
          // both consumers are written against the BASE path
          val rollup = s.read
            .parquet(base)
            .groupBy("lang")
            .agg(count(lit(1)).as("a"), sum("n_chars").as("b"))
            .select(lit("rollup").as("probe"), col("lang"), col("a"), col("b"))
          val filtered = s.read
            .parquet(base)
            .filter(col("source") === "src3")
            .groupBy("lang")
            .agg(count(lit(1)).as("a"), min("n_chars").as("b"))
            .select(lit("filtered").as("probe"), col("lang"), col("a"), col("b"))
          // the optimizer must have swapped BOTH scans to the view —
          // a silent fallback to the base would still return the right
          // values, so the plan check is part of the query's contract
          Seq(rollup, filtered).foreach { q =>
            val roots = scannedRoots(q)
            require(
              roots.nonEmpty && roots.forall(_.contains("mv_view")),
              s"materialized-view rewrite did not fire; scans: ${roots.mkString(", ")}"
            )
          }
          // materialize while the registration is still active — the
          // returned plan must not depend on registry state at the
          // driver's later collect
          val s2 = s
          import s2.implicits._
          rollup
            .unionByName(filtered)
            .orderBy("probe", "lang")
            .collect()
            .toSeq
            .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
            .toDF("probe", "lang", "a", "b")
        } finally ViewRewrite.unregister(s, base)
      },
      Some("""WITH b AS (
          SELECT lang, source, n_chars FROM documents WHERE doc_id % 2 = 0)
        SELECT probe, lang, a, b FROM (
          SELECT 'rollup' AS probe, lang, count(*) AS a,
                 CAST(sum(n_chars) AS BIGINT) AS b
          FROM b GROUP BY lang
          UNION ALL
          SELECT 'filtered', lang, count(*), CAST(min(n_chars) AS BIGINT)
          FROM b WHERE source = 'src3' GROUP BY lang)
        ORDER BY probe, lang""")
    ),

    // ------------------------------------------------------------------
    // Automatic window-top-k rewrite (plans/TopKRewrite — the engine's
    // first full preference-order-(c) stack: custom LogicalPlan +
    // Rule + SparkStrategy + SparkPlan). The query is written the way
    // every analyst writes per-group top-k — row_number() over
    // (partition by brand order by price desc, id) filtered to rk<=3 —
    // and the optimizer replaces the sort-based Window plan with the
    // two-phase bounded-heap operator: map-side per-key heaps, ONE
    // hash exchange shipping ≤k rows per key per task, reduce-side
    // heaps emitting ranks. O(n log k) per task instead of the
    // window's O(n log n) full sort, and the engine's PlanLint top-k
    // discipline now applies itself. The fn REQUIRES the custom node
    // in the optimized plan (a silent fallback to WindowExec would
    // still return right values); values are oracle-exact against the
    // identical window SQL in DuckDB — the rewrite is only right if
    // it is invisible. Guard rails (rank()/multi-expr windows/global
    // top-k/foreign filters refuse the rewrite) are pinned by
    // TopKRewriteSpec.
    QueryDef(
      "q229_topk_rewrite",
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("p_brand")
          .orderBy(col("p_retailprice").desc, col("p_partkey").asc)
        val df = Tables(s, dir, "part")
          .select("p_partkey", "p_brand", "p_retailprice")
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 3)
          .select(
            col("p_brand"),
            col("rk").cast("long").as("rk"),
            col("p_partkey"),
            col("p_retailprice")
          )
          .orderBy("p_brand", "rk")
        require(
          df.queryExecution.optimizedPlan.exists(_.isInstanceOf[graft.plans.TopKPerKey]),
          "window-top-k rewrite did not fire; plan:\n" + df.queryExecution.optimizedPlan
        )
        df
      },
      Some("""SELECT p_brand, CAST(rk AS BIGINT) AS rk, p_partkey, p_retailprice
        FROM (SELECT p_brand, p_partkey, p_retailprice,
                     row_number() OVER (PARTITION BY p_brand
                                        ORDER BY p_retailprice DESC, p_partkey) AS rk
              FROM part)
        WHERE rk <= 3 ORDER BY p_brand, rk""")
    ),

    // ------------------------------------------------------------------
    // JOIN ELIMINATION from informational referential constraints
    // (plans/JoinElim — the engine's second query-rewriting Rule).
    // lineitem.l_orderkey → orders.o_orderkey is declared (and
    // VALIDATED: pk unique, fk non-null, zero orphans) as a RELY
    // foreign key; two consumers then join fact to dimension the way
    // generated BI SQL always does — and reference only fact columns,
    // so the optimizer REMOVES the join: the 100 TB fact table never
    // shuffles against orders at all. Both consumers REQUIRE a
    // join-free optimized plan (a silent fallback would still return
    // right values); values are ORACLE-EXACT against DuckDB EXECUTING
    // THE JOIN — the elimination is only right if it is invisible.
    // Guard rails (filtered dimensions, dim-column references, outer
    // joins, undeclared pairs) are pinned by JoinElimSpec.
    QueryDef(
      "q241_join_elimination",
      (s, dir) => {
        val factDir = s"$dir/lineitem.parquet"
        val dimDir = s"$dir/orders.parquet"
        graft.plans.JoinElim.declare(s, factDir, "l_orderkey", dimDir, "o_orderkey")
        try {
          val fact = s.read.parquet(factDir)
          val dim = s.read.parquet(dimDir)
          val agg = fact
            .join(dim, col("l_orderkey") === col("o_orderkey"))
            .groupBy(year(col("l_shipdate")).cast("long").as("yr"))
            .agg(
              count(lit(1)).as("n"),
              sum(expr("CAST(round(l_extendedprice * 100) AS bigint)")).as("cents")
            )
            .select(lit("agg").as("probe"), col("yr"), col("n"), col("cents"))
          val proj = dim
            .join(fact, col("o_orderkey") === col("l_orderkey")) // dim on the LEFT
            .filter(col("l_quantity") >= 49.0)
            .groupBy(col("l_orderkey").as("yr"))
            .agg(count(lit(1)).as("n"), sum(col("l_linenumber").cast("long")).as("cents"))
            .select(lit("proj").as("probe"), col("yr"), col("n"), col("cents"))
          Seq(agg, proj).foreach { q =>
            val joins = q.queryExecution.optimizedPlan.collect {
              case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
            }
            require(
              joins.isEmpty,
              s"join elimination did not fire:\n${q.queryExecution.optimizedPlan}"
            )
          }
          agg.unionByName(proj).orderBy("probe", "yr")
        } finally graft.plans.JoinElim.undeclare(s, factDir, "l_orderkey")
      },
      Some("""WITH a AS (
          SELECT 'agg' AS probe, CAST(year(l_shipdate) AS BIGINT) AS yr,
                 count(*) AS n,
                 CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          GROUP BY 2),
        p AS (
          SELECT 'proj' AS probe, l_orderkey AS yr, count(*) AS n,
                 CAST(sum(CAST(l_linenumber AS BIGINT)) AS BIGINT) AS cents
          FROM orders JOIN lineitem ON o_orderkey = l_orderkey
          WHERE l_quantity >= 49.0
          GROUP BY 2)
        SELECT probe, yr, n, cents FROM (SELECT * FROM a UNION ALL SELECT * FROM p)
        ORDER BY probe, yr""")
    ),

    // ------------------------------------------------------------------
    // COLUMN-LEVEL LINEAGE (plans/ColumnLineage): the catalog metadata
    // every governed pipeline owes — for each output column, the
    // (source table, source column) pairs that feed it, extracted by
    // a bottom-up dataflow closure over the ANALYZED plan's
    // expression ids (Catalyst already knows; this says it out loud).
    // Probe 1 is the BI shape (join + aggregate): the revenue column
    // traces to both lineitem price columns, the priority key to
    // orders, and count(1) — honestly — to nothing. Probe 2 is the
    // expression/window shape: a cross-table sum traces to both
    // tables, and a rank traces to its partition AND order columns
    // (rank is value-flow from the ordering). Driver-side plan walk,
    // no job runs; deterministic, so the report itself is
    // ORACLE-EXACT as a constant relation.
    QueryDef(
      "q243_column_lineage",
      (s, dir) => {
        import org.apache.spark.sql.expressions.{Window => W}
        val li = Tables(s, dir, "lineitem")
        val o = Tables(s, dir, "orders")
        val q1 = li
          .join(o, col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_orderpriority").as("pri"))
          .agg(
            sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"),
            count(lit(1)).as("n")
          )
        val q2 = li
          .join(o, col("l_orderkey") === col("o_orderkey"))
          .select(
            (col("l_extendedprice") + col("o_totalprice")).as("mix"),
            row_number()
              .over(W.partitionBy("o_orderpriority").orderBy("l_orderkey", "l_linenumber"))
              .as("rk")
          )
        val sess = s
        import sess.implicits._
        (graft.plans.ColumnLineage.edges(q1).map { case (c, t, sc) => ("q1", c, t, sc) } ++
          graft.plans.ColumnLineage.edges(q2).map { case (c, t, sc) => ("q2", c, t, sc) })
          .toDF("probe", "out_col", "src_table", "src_col")
          .orderBy("probe", "out_col", "src_table", "src_col")
      },
      Some("""SELECT * FROM (VALUES
          ('q1', 'pri', 'orders',   'o_orderpriority'),
          ('q1', 'rev', 'lineitem', 'l_discount'),
          ('q1', 'rev', 'lineitem', 'l_extendedprice'),
          ('q2', 'mix', 'lineitem', 'l_extendedprice'),
          ('q2', 'mix', 'orders',   'o_totalprice'),
          ('q2', 'rk',  'lineitem', 'l_linenumber'),
          ('q2', 'rk',  'lineitem', 'l_orderkey'),
          ('q2', 'rk',  'orders',   'o_orderpriority')
        ) AS t(probe, out_col, src_table, src_col)
        ORDER BY probe, out_col, src_table, src_col""")
    ),

    // ------------------------------------------------------------------
    // BITMAP INDEX (round 13): low-cardinality membership packed as
    // one BIGINT per (value, 64-key word) — COUNT, AND, OR answered
    // by word-aligned integer algebra on |keys|/64 rows per value,
    // never a row-level pass over the table (operators/BitmapIndex;
    // the exact-count AND/OR complement of the bloom index's
    // probabilistic point SKIPPING). The query builds bitmaps over
    // documents.lang and documents.source, then answers per-lang
    // counts, three cross-column AND counts, a within-column OR, and
    // a conjunctive count the fact table never sees — all restated by
    // DuckDB over the raw rows, so a single flipped or misplaced bit
    // breaks the hash. ORACLE-EXACT.
    QueryDef(
      "q260_bitmap_index",
      (s, dir) => {
        import graft.operators.BitmapIndex
        val idx = Similarity.freshIndexDir("bitmap_idx")
        val docs = Tables(s, dir, "documents").select("doc_id", "lang", "source")
        BitmapIndex.build(docs, "doc_id", "lang", idx)
        BitmapIndex.build(docs, "doc_id", "source", idx)
        val sess = s
        import sess.implicits._
        val perLang = BitmapIndex
          .valueCounts(s, idx, "lang")
          .select(lit("lang").as("probe"), col("value").as("k"), col("n"))
        val ands = Seq(("en", "src0"), ("fr", "src1"), ("zh", "src2")).map { case (l, src) =>
          (s"and:$l&$src", BitmapIndex.intersectCount(s, idx, "lang", l, "source", src))
        }
        val or = Seq(
          ("or:en|fr", BitmapIndex.unionCount(s, idx, "lang", "en", "lang", "fr"))
        )
        val probes = (ands ++ or)
          .toDF("k", "n")
          .select(lit("setop").as("probe"), col("k"), col("n"))
        perLang.unionByName(probes).orderBy("probe", "k")
      },
      Some("""WITH d AS (SELECT doc_id, lang, source FROM documents)
        SELECT probe, k, n FROM (
          SELECT 'lang' AS probe, lang AS k, count(*) AS n FROM d GROUP BY 2
          UNION ALL
          SELECT 'setop', 'and:en&src0',
                 count(*) FROM d WHERE lang = 'en' AND source = 'src0'
          UNION ALL
          SELECT 'setop', 'and:fr&src1',
                 count(*) FROM d WHERE lang = 'fr' AND source = 'src1'
          UNION ALL
          SELECT 'setop', 'and:zh&src2',
                 count(*) FROM d WHERE lang = 'zh' AND source = 'src2'
          UNION ALL
          SELECT 'setop', 'or:en|fr',
                 count(*) FROM d WHERE lang IN ('en', 'fr'))
        ORDER BY probe, k""")
    ),

    // ------------------------------------------------------------------
    // BITMAP INDEX MAINTENANCE (round 13): the q260 index made a
    // LIVING artifact — appends land as OR-mergeable segments (O(batch),
    // existing segments never read: the shingle-index log-structured
    // contract), erasure lands as value-agnostic NEGATIVE mask
    // segments (request-scaled, idempotent — a forgotten key leaves
    // EVERY value's bitmap), reads fold `bit_or` per word and AND-NOT
    // the delete mask, and compact() folds everything into one base by
    // checked staged swap. The query walks the full lifecycle — build
    // on half the corpus, append the other half, erase a subject set,
    // probe, compact, and REQUIRE the compacted probes bit-equal —
    // with every count restated over the raw rows. ORACLE-EXACT.
    QueryDef(
      "q275_bitmap_maintenance",
      (s, dir) => {
        import graft.operators.BitmapIndex
        val idx = Similarity.freshIndexDir("bitmap_live")
        val docs = Tables(s, dir, "documents").select("doc_id", "lang", "source")
        BitmapIndex.build(docs.filter(col("doc_id") % 2 === 0), "doc_id", "lang", idx)
        BitmapIndex.append(docs.filter(col("doc_id") % 2 === 1), "doc_id", "lang", idx)
        BitmapIndex.delete(docs.filter(col("doc_id") % 7 === 3).select("doc_id"), "doc_id", idx)
        val sess = s
        import sess.implicits._
        def probes() = {
          val perLang = BitmapIndex
            .valueCounts(s, idx, "lang")
            .select(lit("lang").as("probe"), col("value").as("k"), col("n"))
            .collect()
            .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
            .toSeq
          val or = Seq(
            ("setop", "or:en|fr", BitmapIndex.unionCount(s, idx, "lang", "en", "lang", "fr"))
          )
          (perLang ++ or).sorted
        }
        val before = probes()
        BitmapIndex.compact(s, idx)
        require(probes() == before, "compaction must not change a single answer")
        before.toDF("probe", "k", "n").orderBy("probe", "k")
      },
      Some(bitmapMaintainOracle)
    )
  )

  /** The post-lifecycle bitmap census shared by batch q275 and the
    * live q279 gate: per-lang exact counts plus one OR probe over the
    * corpus minus the erased (doc_id % 7 = 3) keys. */
  private[queries] lazy val bitmapMaintainOracle: String =
    """WITH d AS (
          SELECT doc_id, lang FROM documents WHERE doc_id % 7 <> 3)
        SELECT probe, k, n FROM (
          SELECT 'lang' AS probe, lang AS k, count(*) AS n FROM d GROUP BY 2
          UNION ALL
          SELECT 'setop', 'or:en|fr',
                 count(*) FROM d WHERE lang IN ('en', 'fr'))
        ORDER BY probe, k"""
}
