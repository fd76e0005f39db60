package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.operators.DistributedRank

/** Second relational tranche (SURVEY.md §2.3): statistical aggregates,
  * distribution windows, positional explode, time bucketing, SQL
  * subqueries, and selective aggregates — each oracle-checked.
  *
  * Determinism posture matches Relational: float-valued statistics are
  * DERIVED from exact integer sums with the identical sequence of
  * correctly-rounded double ops on both sides (a built-in
  * `stddev`/`corr` merges partials in partition order — not
  * reproducible bit-for-bit across engines; the integer-moment
  * formulation is, and runs in the same single aggregate pass).
  */
object Extras {

  val defs: Seq[QueryDef] = Seq(
    // ------------------------------------------------------------------
    // E5: sample variance / stddev / correlation from exact integer
    // moments (l_quantity and l_linenumber are integral-valued).
    QueryDef(
      "q56_stats_moments",
      (s, dir) => {
        val q = col("l_quantity").cast("long")
        val y = col("l_linenumber").cast("long")
        val agg = Tables(s, dir, "lineitem")
          .groupBy("l_returnflag")
          .agg(
            count(lit(1)).as("n"),
            sum(q).as("s1"),
            sum(q * q).as("s2"),
            sum(y).as("t1"),
            sum(y * y).as("t2"),
            sum(q * y).as("sxy")
          )
        // moment products in DECIMAL(38,0): n*s2 overflows BIGINT once a
        // group holds ~1.5e9 rows (n*s2 ≈ 5e21 at the 1 TB point) —
        // 128-bit intermediates keep the integers exact at any SF; the
        // oracle mirrors with HUGEINT. Cast to double only at the end.
        def d(c: Column) = c.cast("decimal(38,0)")
        val n = d(col("n")); val s1 = d(col("s1")); val s2 = d(col("s2"))
        val t1 = d(col("t1")); val t2 = d(col("t2")); val sxy = d(col("sxy"))
        val varSamp = (n * s2 - s1 * s1).cast("double") / (n * (n - 1)).cast("double")
        val corr = (n * sxy - s1 * t1).cast("double") /
          (sqrt((n * s2 - s1 * s1).cast("double")) * sqrt((n * t2 - t1 * t1).cast("double")))
        agg
          .select(
            col("l_returnflag"),
            col("n"),
            col("s1").as("sum_q"),
            varSamp.as("var_q"),
            sqrt(varSamp).as("std_q"),
            corr.as("corr_q_line")
          )
          .orderBy("l_returnflag")
      },
      Some("""WITH m AS (
          SELECT l_returnflag,
                 count(*) AS n,
                 CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS s1,
                 CAST(sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS BIGINT) AS s2,
                 CAST(sum(CAST(l_linenumber AS BIGINT)) AS BIGINT) AS t1,
                 CAST(sum(CAST(l_linenumber AS BIGINT) * CAST(l_linenumber AS BIGINT)) AS BIGINT) AS t2,
                 CAST(sum(CAST(l_quantity AS BIGINT) * CAST(l_linenumber AS BIGINT)) AS BIGINT) AS sxy
          FROM lineitem GROUP BY l_returnflag),
        h AS (SELECT l_returnflag, n, s1,
                     CAST(n AS HUGEINT) AS nh, CAST(s1 AS HUGEINT) AS s1h,
                     CAST(s2 AS HUGEINT) AS s2h, CAST(t1 AS HUGEINT) AS t1h,
                     CAST(t2 AS HUGEINT) AS t2h, CAST(sxy AS HUGEINT) AS sxyh
              FROM m)
        SELECT l_returnflag, n, s1 AS sum_q,
               CAST(nh*s2h - s1h*s1h AS DOUBLE) / CAST(nh*(nh-1) AS DOUBLE) AS var_q,
               sqrt(CAST(nh*s2h - s1h*s1h AS DOUBLE) / CAST(nh*(nh-1) AS DOUBLE)) AS std_q,
               CAST(nh*sxyh - s1h*t1h AS DOUBLE)
                 / (sqrt(CAST(nh*s2h - s1h*s1h AS DOUBLE)) * sqrt(CAST(nh*t2h - t1h*t1h AS DOUBLE))) AS corr_q_line
        FROM h ORDER BY l_returnflag""")
    ),

    // ------------------------------------------------------------------
    // E7: distribution window functions. The window orders by a UNIQUE
    // key pair so peer groups are single rows — percent_rank/cume_dist
    // are then exact rational values both engines compute identically.
    QueryDef(
      "q57_distribution_windows",
      (s, dir) => {
        val w = Window
          .partitionBy("c_mktsegment")
          .orderBy(col("c_acctbal").asc, col("c_custkey").asc)
        Tables(s, dir, "customer")
          .filter(col("c_custkey") <= 3000)
          .select(
            col("c_mktsegment"),
            col("c_custkey"),
            ntile(4).over(w).cast("long").as("quartile"),
            percent_rank().over(w).as("pct_rank"),
            cume_dist().over(w).as("cume")
          )
          .orderBy("c_mktsegment", "c_custkey")
      },
      Some("""SELECT c_mktsegment, c_custkey,
          CAST(ntile(4) OVER w AS BIGINT) AS quartile,
          percent_rank() OVER w AS pct_rank,
          cume_dist() OVER w AS cume
        FROM customer WHERE c_custkey <= 3000
        WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal ASC, c_custkey ASC)
        ORDER BY c_mktsegment, c_custkey""")
    ),

    // ------------------------------------------------------------------
    // E10/F-family: positional explode of a regex token extraction —
    // generator with ordinality.
    QueryDef(
      "q58_posexplode_tokens",
      (s, dir) =>
        Tables(s, dir, "documents")
          .filter(col("doc_id") < 25)
          .select(col("doc_id"), posexplode(regexp_extract_all(col("text"), lit("[a-z]{7,}"), lit(0))))
          .select(col("doc_id"), col("pos").cast("long").as("pos"), col("col").as("token"))
          .orderBy("doc_id", "pos"),
      Some("""SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos, toks[i] AS token
        FROM (SELECT doc_id, regexp_extract_all(text, '[a-z]{7,}') AS toks,
                     unnest(range(1, len(regexp_extract_all(text, '[a-z]{7,}')) + 1)) AS i
              FROM documents WHERE doc_id < 25)
        ORDER BY doc_id, pos""")
    ),

    // ------------------------------------------------------------------
    // E10: calendar bucketing — monthly order histogram with exact-cents
    // totals and quarter extraction.
    QueryDef(
      "q59_date_trunc",
      (s, dir) =>
        Tables(s, dir, "orders")
          .select(
            date_trunc("month", col("o_orderdate").cast("timestamp")).as("month"),
            quarter(col("o_orderdate")).cast("long").as("qtr"),
            Exact.cents(col("o_totalprice")).as("cents")
          )
          .groupBy("month", "qtr")
          .agg(count(lit(1)).as("n"), sum(col("cents")).as("total_cents"))
          .orderBy("month"),
      Some("""SELECT date_trunc('month', CAST(o_orderdate AS TIMESTAMP)) AS month,
          CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
          count(*) AS n,
          CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS total_cents
        FROM orders
        GROUP BY 1, 2 ORDER BY month""")
    ),

    // ------------------------------------------------------------------
    // E3/E10 via the SQL front end: IN-subquery + correlated EXISTS —
    // Catalyst rewrites both to semi joins; registered through temp
    // views to exercise spark.sql end to end.
    QueryDef(
      "q60_subqueries",
      (s, dir) => {
        Tables(s, dir, "orders").createOrReplaceTempView("orders_v")
        Tables(s, dir, "customer").createOrReplaceTempView("customer_v")
        Tables(s, dir, "lineitem").createOrReplaceTempView("lineitem_v")
        s.sql("""SELECT o_orderpriority, count(*) AS n
          FROM orders_v o
          WHERE o_custkey IN (SELECT c_custkey FROM customer_v WHERE c_mktsegment = 'BUILDING')
            AND EXISTS (SELECT 1 FROM lineitem_v l
                        WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 45)
          GROUP BY o_orderpriority
          ORDER BY o_orderpriority""")
      },
      Some("""SELECT o_orderpriority, count(*) AS n
        FROM orders o
        WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
          AND EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 45)
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority""")
    ),

    // ------------------------------------------------------------------
    // E10: error-safe scalar functions (ANSI try_* family) — NULL
    // instead of failure on bad casts, division by zero, and BIGINT
    // overflow. The oracle states the same semantics with guards.
    // Failure rates are kept RARE (2–4% of rows) on purpose: each try_*
    // failure constructs and catches a formatted JVM exception, so an
    // always-failing try_cast costs ~50µs/row — measured 9.6s over 100k
    // rows with universal failures vs <1s with rare ones. That cost
    // model (exceptions are for the exceptional path) matters at 100 TB.
    QueryDef(
      "q64_try_funcs",
      (s, dir) =>
        Tables(s, dir, "events")
          .select(
            col("event_id"),
            expr("try_cast(get_json_object(props, '$.k') AS BIGINT)").as("k")
          )
          .select(
            col("event_id"),
            col("k"),
            expr("try_cast(CASE WHEN k % 50 = 0 THEN 'not_a_number' ELSE CAST(k AS STRING) END AS BIGINT)")
              .as("mostly_cast"),
            // CAST to DOUBLE on both engines: a bare 100.0 literal is
            // DECIMAL in Spark SQL and the decimal division rounds
            // differently from IEEE double division
            expr("try_divide(CAST(100 AS DOUBLE), CAST(k % 10 AS DOUBLE))").as("div_or_null"),
            expr("try_add(9223372036854775712, k)").as("overflow_or_null")
          )
          .orderBy("event_id"),
      Some("""WITH e AS (SELECT event_id,
            TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events)
        SELECT event_id, k,
          TRY_CAST(CASE WHEN k % 50 = 0 THEN 'not_a_number' ELSE CAST(k AS VARCHAR) END AS BIGINT) AS mostly_cast,
          CASE WHEN k % 10 = 0 THEN NULL
               ELSE CAST(100 AS DOUBLE) / CAST(k % 10 AS DOUBLE) END AS div_or_null,
          CASE WHEN k > 95 THEN NULL ELSE 9223372036854775712 + k END AS overflow_or_null
        FROM e ORDER BY event_id""")
    ),

    // ------------------------------------------------------------------
    // F-family: null-preserving generator — explode_outer keeps the
    // parent row (with a NULL element) when the child array is empty;
    // the oracle emulates it by unnesting a [NULL] sentinel.
    QueryDef(
      "q65_explode_outer",
      (s, dir) =>
        Tables(s, dir, "events")
          .select(
            col("event_id"),
            expr("try_cast(get_json_object(props, '$.k') AS BIGINT) % 3").as("m")
          )
          .select(
            col("event_id"),
            explode_outer(array_remove(array(col("m")), 0)).as("elem")
          )
          .orderBy("event_id"),
      Some("""SELECT event_id,
          unnest(CASE WHEN m = 0 OR m IS NULL THEN [NULL] ELSE [m] END) AS elem
        FROM (SELECT event_id,
                     TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) % 3 AS m
              FROM events)
        ORDER BY event_id""")
    ),

    // ------------------------------------------------------------------
    // E14/E10: edit distance between adjacent tokens — both engines
    // implement standard Levenshtein over exact strings.
    QueryDef(
      "q66_edit_distance",
      (s, dir) =>
        Tables(s, dir, "documents")
          .filter(col("doc_id") < 200)
          .select(
            col("doc_id"),
            element_at(split(col("text"), " "), 1).as("w1"),
            element_at(split(col("text"), " "), 2).as("w2")
          )
          .select(
            col("doc_id"),
            col("w1"),
            col("w2"),
            levenshtein(col("w1"), col("w2")).cast("long").as("dist")
          )
          .orderBy("doc_id"),
      Some("""SELECT doc_id, w1, w2, CAST(levenshtein(w1, w2) AS BIGINT) AS dist
        FROM (SELECT doc_id,
                     string_split(text, ' ')[1] AS w1,
                     string_split(text, ' ')[2] AS w2
              FROM documents WHERE doc_id < 200)
        ORDER BY doc_id""")
    ),

    // ------------------------------------------------------------------
    // E5: selective aggregates — min_by/max_by keyed by the UNIQUE
    // custkey (deterministic), count_if, bool_or.
    QueryDef(
      "q61_selective_agg",
      (s, dir) =>
        Tables(s, dir, "customer")
          .groupBy("c_mktsegment")
          .agg(
            count(lit(1)).as("n"),
            expr("count_if(c_acctbal < 0)").cast("long").as("n_neg"),
            expr("bool_or(c_acctbal < 0)").as("any_neg"),
            min_by(col("c_name"), col("c_custkey")).as("first_name"),
            max_by(col("c_name"), col("c_custkey")).as("last_name")
          )
          .orderBy("c_mktsegment"),
      Some("""SELECT c_mktsegment, count(*) AS n,
          CAST(count_if(c_acctbal < 0) AS BIGINT) AS n_neg,
          bool_or(c_acctbal < 0) AS any_neg,
          min_by(c_name, c_custkey) AS first_name,
          max_by(c_name, c_custkey) AS last_name
        FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""")
    ),

    // ------------------------------------------------------------------
    // E5: exact interpolated quartiles. `percentile` (exact, linear
    // interpolation) — l_quantity is integral-valued so quarter-point
    // interpolations are dyadic rationals, exactly representable; the
    // oracle's quantile_cont uses the same definition bit-for-bit.
    // 100 TB note: exact percentile shuffles per group; the sketch path
    // (approx_percentile / t-digest) is the scale alternative and is
    // covered by q27's HLL analogue — here the group count is tiny and
    // exactness buys an oracle.
    QueryDef(
      "q71_quartiles",
      (s, dir) =>
        Tables(s, dir, "lineitem")
          .groupBy("l_returnflag")
          .agg(percentile(col("l_quantity"), array(lit(0.25), lit(0.5), lit(0.75))).as("qs"))
          .select(
            col("l_returnflag"),
            element_at(col("qs"), 1).as("q1"),
            element_at(col("qs"), 2).as("q2"),
            element_at(col("qs"), 3).as("q3")
          )
          .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
          quantile_cont(l_quantity, 0.25) AS q1,
          quantile_cont(l_quantity, 0.50) AS q2,
          quantile_cont(l_quantity, 0.75) AS q3
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")
    ),

    // ------------------------------------------------------------------
    // E3 (SQL front end): LATERAL correlated subquery — top-3 customers
    // by balance per nation, the "for each row, run this dependent
    // query" shape. Catalyst decorrelates it into a ranked window join
    // (DomainJoin → Window rank ≤ 3), so execution is one shuffle, not
    // per-row subquery invocations.
    QueryDef(
      "q72_lateral_topk",
      (s, dir) => {
        Tables(s, dir, "nation").createOrReplaceTempView("nation_l")
        Tables(s, dir, "customer").createOrReplaceTempView("customer_l")
        s.sql("""SELECT n.n_name, t.c_name, t.c_acctbal
          FROM nation_l n,
          LATERAL (
            SELECT c_name, c_acctbal FROM customer_l c
            WHERE c.c_nationkey = n.n_nationkey
            ORDER BY c_acctbal DESC, c_custkey LIMIT 3
          ) t
          ORDER BY n.n_name, t.c_acctbal DESC, t.c_name""")
      },
      Some("""SELECT n.n_name, t.c_name, t.c_acctbal
        FROM nation n,
        LATERAL (
          SELECT c_name, c_acctbal FROM customer c
          WHERE c.c_nationkey = n.n_nationkey
          ORDER BY c_acctbal DESC, c_custkey LIMIT 3
        ) t
        ORDER BY n.n_name, t.c_acctbal DESC, t.c_name""")
    ),

    // ------------------------------------------------------------------
    // E3 at scale: bloom-filter runtime pre-filter, stated explicitly
    // in the same shape Catalyst's InjectRuntimeFilter produces: a
    // scalar-subquery bloom_filter_agg over the join keys of the
    // FILTERED fact side, applied with might_contain to the dimension
    // BEFORE the exact join (graft.functions.BloomSketch exposes the
    // internal sketch expressions as SQL functions; might_contain
    // itself requires the scalar-subquery/constant shape — the sketch
    // is one row, never a shuffled side). On a cluster this cuts the
    // shuffled dimension volume by the bloom's true-negative rate;
    // false positives are removed by the exact semi-join after, so the
    // final result is EXACTLY the plain semi-join (which is the oracle).
    QueryDef(
      "q73_bloom_prefilter",
      (s, dir) => {
        Tables(s, dir, "orders").createOrReplaceTempView("orders_bf")
        Tables(s, dir, "customer").createOrReplaceTempView("customer_bf")
        s.sql("""SELECT c_custkey, c_name, c_mktsegment
          FROM customer_bf
          WHERE might_contain(
                  (SELECT bloom_filter_agg(xxhash64(o_custkey), 50000L, 400000L)
                   FROM orders_bf WHERE o_totalprice > 400000.0),
                  xxhash64(c_custkey))
            AND EXISTS (SELECT 1 FROM orders_bf
                        WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
          ORDER BY c_custkey""")
      },
      Some("""SELECT c_custkey, c_name, c_mktsegment
        FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
        ORDER BY c_custkey""")
    ),

    // ------------------------------------------------------------------
    // E5: mergeable distinct-count sketches (Apache DataSketches HLL,
    // Spark 4 hll_sketch_agg/hll_union_agg). THE 100 TB pattern for
    // distinct users per slice: per-partition sketches merge
    // associatively (map-side partial agg), and pre-aggregated slice
    // sketches re-merge to any rollup without touching raw data —
    // hll_union_agg over the per-type sketches reproduces the global
    // count. No oracle (the sketch binary layout is engine-specific);
    // ExtrasSpec pins estimates against exact distinct counts.
    QueryDef(
      "q74_hll_sketch",
      (s, dir) => {
        val perType = Tables(s, dir, "events")
          .groupBy("event_type")
          .agg(expr("hll_sketch_agg(user_id, 14)").as("sk"), count(lit(1)).as("n_events"))
        perType
          .select(
            col("event_type"),
            col("n_events"),
            expr("hll_sketch_estimate(sk)").cast("long").as("approx_users")
          )
          .unionByName(
            perType
              .agg(expr("hll_sketch_estimate(hll_union_agg(sk)) ")
                     .cast("long").as("approx_users"),
                   sum("n_events").as("n_events"))
              .select(lit("_all").as("event_type"), col("n_events"), col("approx_users"))
          )
          .orderBy("event_type")
      },
      None
    ),

    // ------------------------------------------------------------------
    // Date-spine gap fill: generate the full day spine between the
    // corpus min/max order date and left-join daily counts, filling
    // silent days with 0 — the canonical time-series densification
    // before windowed trend features. The spine explodes from ONE
    // aggregate row (sequence() of days), so at any scale it is
    // |days| rows, never |orders|.
    QueryDef(
      "q75_date_spine",
      (s, dir) => {
        // exact-cents sum (the repo's money rule): a raw double sum's
        // reduction order diverges between engines once groups are big
        // enough, and round(...,2) can't mask that at 100 TB volumes.
        // The single division of an exact integer is bit-stable.
        val daily = Tables(s, dir, "orders")
          .groupBy(to_date(col("o_orderdate")).as("day"))
          .agg(
            count(lit(1)).as("n_orders"),
            sum(Exact.cents(col("o_totalprice"))).as("volume_c")
          )
        val spine = Tables(s, dir, "orders")
          .agg(to_date(min("o_orderdate")).as("d0"), to_date(max("o_orderdate")).as("d1"))
          .select(explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
        spine
          .join(daily, Seq("day"), "left")
          .select(
            col("day"),
            coalesce(col("n_orders"), lit(0L)).as("n_orders"),
            (coalesce(col("volume_c"), lit(0L)).cast("double") / 100.0).as("volume")
          )
          .orderBy("day")
      },
      Some("""WITH daily AS (
          SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS n_orders,
                 sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS volume_c
          FROM orders GROUP BY 1
        ), bounds AS (
          SELECT CAST(min(o_orderdate) AS DATE) AS d0,
                 CAST(max(o_orderdate) AS DATE) AS d1 FROM orders
        ), spine AS (
          SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
          FROM bounds
        )
        SELECT spine.day AS day, COALESCE(n_orders, 0) AS n_orders,
               CAST(COALESCE(volume_c, 0) AS DOUBLE) / 100.0 AS volume
        FROM spine LEFT JOIN daily ON spine.day = daily.day
        ORDER BY spine.day""")
    ),

    // ------------------------------------------------------------------
    // Stratified sampling (training-data pipeline): per-language
    // fractions with a fixed seed — downsample the over-represented
    // language, keep the rest. sampleBy is a per-row Bernoulli draw
    // seeded per partition: fully distributed, no shuffle, and
    // deterministic for a fixed input layout + seed (rows-only check;
    // ExtrasSpec pins determinism and per-stratum bounds).
    QueryDef(
      "q76_stratified_sample",
      (s, dir) => {
        val fracs = Map("en" -> 0.3, "de" -> 0.8, "fr" -> 0.8, "es" -> 0.8, "zh" -> 0.8)
        Tables(s, dir, "documents")
          .stat
          .sampleBy("lang", fracs, 42L)
          .groupBy("lang")
          .agg(count(lit(1)).as("n_sampled"))
          .orderBy("lang")
      },
      None
    ),

    // ------------------------------------------------------------------
    // SQL UDF (Spark 4 CREATE FUNCTION ... RETURN expr): a reusable
    // scalar defined IN SQL, inlined by Catalyst into the calling plan —
    // full codegen/pushdown, none of the black-box cost of a JVM UDF.
    // The oracle restates the body inline (DuckDB macros can't ship in
    // a single-statement oracle); one IEEE division of exact integers,
    // so the hash matches bit-for-bit.
    QueryDef(
      "q80_sql_udf",
      (s, dir) => {
        s.sql("""CREATE OR REPLACE TEMPORARY FUNCTION graft_chars_per_token(
                   nc BIGINT, nt BIGINT) RETURNS DOUBLE
                 RETURN CAST(nc AS DOUBLE) / (CAST(nt AS DOUBLE) + 1.0)""")
        Tables(s, dir, "documents").createOrReplaceTempView("docs_sqludf")
        s.sql("""SELECT doc_id,
                        graft_chars_per_token(n_chars,
                          CAST(size(split(text, ' ')) AS BIGINT)) AS cpt
                 FROM docs_sqludf ORDER BY doc_id""")
      },
      Some("""SELECT doc_id,
               CAST(n_chars AS DOUBLE) /
                 (CAST(len(string_split(text, ' ')) AS DOUBLE) + 1.0) AS cpt
        FROM documents ORDER BY doc_id""")
    ),

    // ------------------------------------------------------------------
    // E5: single-pass heavy hitters (df.stat.freqItems — the
    // Karp/Shenker/Papadimitriou counter algorithm): candidate frequent
    // tokens at 3% support in ONE scan with map-side partial merges, no
    // full groupBy — the 100 TB way to surface boilerplate tokens
    // before an exact count of just the candidates. Guarantee is
    // superset (may include false positives, never misses a true heavy
    // hitter); the exact-count join then trims to truth. The final
    // exact filter makes the output deterministic, but freqItems'
    // internal candidate set is layout-dependent → rows-only + spec.
    QueryDef(
      "q81_freq_items",
      (s, dir) => {
        val toks = Tables(s, dir, "documents")
          .select(explode(split(col("text"), " ")).as("tok"))
        val candidates = toks.stat.freqItems(Seq("tok"), 0.03)
          .select(explode(col("tok_freqItems")).as("tok"))
        // total token count as a LAZY 1-row broadcast scalar (the q38
        // n_docs pattern) — an eager toks.count() here would run a full
        // scan job every time the plan is merely BUILT (RunOne explain,
        // plan lint over all queries, ...)
        val total = toks.agg(count(lit(1)).as("n_total"))
        toks
          .join(broadcast(candidates), Seq("tok"), "left_semi")
          .groupBy("tok")
          .agg(count(lit(1)).as("n"))
          .join(broadcast(total))
          // strict >: the KSP superset guarantee covers count > n*support
          .filter(col("n") > col("n_total") * 0.03)
          .select(col("tok"), col("n"))
          .orderBy(desc("n"), col("tok"))
      },
      None
    ),

    // ------------------------------------------------------------------
    // E5: quantile SKETCH (approx_percentile, Greenwald-Khanna): the
    // scale path q71's exact percentile trades against — mergeable
    // per-partition summaries, one pass, bounded memory, rank error ≤
    // 1/accuracy. Sketch internals are engine-defined → rows-only;
    // ExtrasSpec pins the rank-error bound against the exact quartiles.
    QueryDef(
      "q82_approx_quantiles",
      (s, dir) =>
        Tables(s, dir, "lineitem")
          .groupBy("l_returnflag")
          .agg(
            expr("approx_percentile(l_quantity, array(0.25, 0.5, 0.75), 10000)").as("qs"),
            count(lit(1)).as("n")
          )
          .select(
            col("l_returnflag"),
            col("n"),
            element_at(col("qs"), 1).as("q1"),
            element_at(col("qs"), 2).as("q2"),
            element_at(col("qs"), 3).as("q3")
          )
          .orderBy("l_returnflag"),
      None
    ),

    // ------------------------------------------------------------------
    // E7: sessionization — assign a session SEQUENCE NUMBER to every
    // event (gap > 30 min starts a new session): lag + conditional flag
    // + running sum, one shuffle on the session key. This is the
    // per-event id-assignment twin of q26's session-window AGGREGATE —
    // pipelines need the ids to join features back onto events. All
    // integer arithmetic (epoch micros) → oracle-exact.
    QueryDef(
      "q83_sessionize",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        val gapUs = unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w)
        Tables(s, dir, "events")
          .select(
            col("user_id"),
            col("event_id"),
            col("ts"),
            when(gapUs > 1800L * 1000000L, 1L).otherwise(0L).as("new_sess")
          )
          .select(
            col("user_id"),
            col("event_id"),
            (sum(col("new_sess")).over(w) + 1L).as("session_seq")
          )
          .orderBy("user_id", "event_id")
      },
      Some("""WITH flagged AS (
          SELECT user_id, event_id, ts,
                 CASE WHEN epoch_us(ts) - lag(epoch_us(ts), 1)
                        OVER (PARTITION BY user_id ORDER BY ts, event_id)
                      > 1800 * 1000000 THEN 1 ELSE 0 END AS new_sess
          FROM events
        )
        SELECT user_id, event_id,
               CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) + 1 AS BIGINT)
                 AS session_seq
        FROM flagged ORDER BY user_id, event_id""")
    ),

    // ------------------------------------------------------------------
    // E9 (bag semantics): INTERSECT ALL / EXCEPT ALL — multiplicity-
    // preserving set ops (q12/q13 cover the DISTINCT variants). Spark
    // plans both as aggregate+join on counts, not row-by-row NL.
    QueryDef(
      "q84_setops_all",
      (s, dir) => {
        val a = Tables(s, dir, "events")
          .filter(col("event_type").isin("click", "view"))
          .select(col("user_id"), col("event_type"))
        val b = Tables(s, dir, "events")
          .filter(col("value") > 0.5)
          .select(col("user_id"), col("event_type"))
        a.intersectAll(b)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_intersect"))
          .join(
            a.exceptAll(b).groupBy("event_type").agg(count(lit(1)).as("n_except")),
            Seq("event_type"),
            "full_outer"
          )
          .select(
            col("event_type"),
            coalesce(col("n_intersect"), lit(0L)).as("n_intersect"),
            coalesce(col("n_except"), lit(0L)).as("n_except")
          )
          .orderBy("event_type")
      },
      Some("""WITH a AS (
          SELECT user_id, event_type FROM events WHERE event_type IN ('click', 'view')
        ), b AS (
          SELECT user_id, event_type FROM events WHERE value > 0.5
        ), i AS (
          SELECT event_type, count(*) AS n_intersect
          FROM (SELECT * FROM a INTERSECT ALL SELECT * FROM b) GROUP BY 1
        ), e AS (
          SELECT event_type, count(*) AS n_except
          FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM b) GROUP BY 1
        )
        SELECT COALESCE(i.event_type, e.event_type) AS event_type,
               COALESCE(n_intersect, 0) AS n_intersect,
               COALESCE(n_except, 0) AS n_except
        FROM i FULL OUTER JOIN e ON i.event_type = e.event_type
        ORDER BY event_type""")
    ),

    // ------------------------------------------------------------------
    // E5: fixed-bound histogram via width_bucket — n_chars binned into
    // 10 equal buckets over [0, 2000) plus the overflow bucket. The
    // oracle restates width_bucket's in-range arithmetic
    // (floor(x/width)+1, clamped) — exact because n_chars is integral.
    QueryDef(
      "q77_histogram",
      (s, dir) =>
        Tables(s, dir, "documents")
          .select(expr("width_bucket(n_chars, 0, 2000, 10)").as("bucket"))
          .groupBy("bucket")
          .agg(count(lit(1)).as("n_docs"))
          .orderBy("bucket"),
      Some("""SELECT CASE WHEN n_chars >= 2000 THEN 11
                          WHEN n_chars < 0 THEN 0
                          ELSE CAST(floor(n_chars / 200) AS BIGINT) + 1 END AS bucket,
               count(*) AS n_docs
        FROM documents GROUP BY 1 ORDER BY bucket""")
    ),

    // ------------------------------------------------------------------
    // E3 (skew mitigation): the manual salted join — operators/SkewJoin
    // — registered through the gate (this also backfills the q106
    // numbering gap the round-6 audit flagged). The large side gets a
    // position-derived salt in [0,8), the small side is replicated 8×,
    // and the join keys on (key, salt), spreading any hot part key over
    // 8 reducer partitions. Salting is pure physical re-layout, so the
    // aggregate must equal the plain join's — which is exactly what the
    // oracle states (a wrong/degenerate salt would double or drop rows
    // and break count and sum alike).
    QueryDef(
      "q106_salted_join",
      (s, dir) =>
        graft.operators.SkewJoin
          .saltedJoin(
            Tables(s, dir, "lineitem").select("l_partkey", "l_extendedprice"),
            Tables(s, dir, "part").select("p_partkey", "p_brand"),
            "l_partkey",
            "p_partkey",
            salts = 8
          )
          .groupBy("p_brand")
          .agg(
            count(lit(1)).as("n_items"),
            sum(Exact.cents(col("l_extendedprice"))).as("price_cents")
          )
          .orderBy("p_brand"),
      Some("""SELECT p_brand, count(*) AS n_items,
            CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS price_cents
          FROM lineitem JOIN part ON p_partkey = l_partkey
          GROUP BY 1 ORDER BY 1""")
    ),

    // ------------------------------------------------------------------
    // Deterministic fixed-n stratified sample — the exact-oracle
    // counterpart to q76's sampleBy (which is honest RNG → rows-only):
    // EXACTLY min(20, |stratum|) docs per language, chosen by md5 order
    // with a doc_id tie-break so the "random" 20 are a pure function of
    // the data. This is the eval-set construction shape (fixed-size
    // per-slice samples that must be reproducible run-over-run and
    // engine-over-engine). One hash exchange on lang, rank within the
    // partition, filter — N-per-key at 100 TB, never a global sort;
    // emits the chosen set itself so the oracle pins membership, not
    // just counts.
    QueryDef(
      "q121_stratified_exact",
      (s, dir) =>
        Tables(s, dir, "documents")
          .select(
            col("doc_id"),
            col("lang"),
            md5(col("doc_id").cast("string")).as("h")
          )
          .withColumn(
            "rn",
            row_number()
              .over(Window.partitionBy("lang").orderBy(asc("h"), asc("doc_id")))
              .cast("long")
          )
          .filter(col("rn") <= 20)
          .select("lang", "rn", "doc_id")
          .orderBy("lang", "rn"),
      Some("""SELECT lang, rn, doc_id FROM (
          SELECT lang, doc_id,
                 row_number() OVER (PARTITION BY lang
                                    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
          FROM documents)
        WHERE rn <= 20 ORDER BY lang, rn""")
    ),

    // ------------------------------------------------------------------
    // Winsorized robust statistics — the outlier-trimming step of data
    // cleaning: per language, clamp document token counts to the
    // stratum's exact [p05, p95] rank quantiles and report mean token
    // mass before/after. Quantiles are RANK-BASED on integers (the
    // value at row_number ceil(q·n), ties broken by doc_id), not an
    // interpolating percentile — identical by construction in both
    // engines, so clamped sums stay integer-exact. Two window passes
    // over one exchange on lang (rank + count), then a broadcast-sized
    // 5-row quantile table joins back.
    QueryDef(
      "q122_winsorize",
      (s, dir) => {
        val toks = Tables(s, dir, "documents")
          .select(col("doc_id"), col("lang"), size(split(col("text"), " ")).cast("long").as("nt"))
        val w = Window.partitionBy("lang")
        val ranked = toks
          .withColumn("rn", row_number().over(w.orderBy(asc("nt"), asc("doc_id"))))
          .withColumn("n", count(lit(1)).over(w))
        val bounds = ranked
          .filter(col("rn") === ceil(col("n") * 0.05) || col("rn") === ceil(col("n") * 0.95))
          .groupBy("lang")
          .agg(min("nt").as("p05"), max("nt").as("p95"))
        toks
          .join(broadcast(bounds), Seq("lang"))
          .groupBy("lang")
          .agg(
            count(lit(1)).as("n_docs"),
            sum("nt").as("tok_sum"),
            sum(greatest(least(col("nt"), col("p95")), col("p05"))).as("tok_sum_winsorized"),
            sum(when(col("nt") > col("p95"), 1L).otherwise(0L)).as("n_clamped_hi"),
            sum(when(col("nt") < col("p05"), 1L).otherwise(0L)).as("n_clamped_lo")
          )
          .orderBy("lang")
      },
      Some("""WITH toks AS (
          SELECT doc_id, lang, CAST(len(string_split(text, ' ')) AS BIGINT) AS nt
          FROM documents
        ), ranked AS (
          SELECT lang, nt,
                 row_number() OVER (PARTITION BY lang ORDER BY nt, doc_id) AS rn,
                 count(*) OVER (PARTITION BY lang) AS n
          FROM toks
        ), bounds AS (
          SELECT lang, min(nt) AS p05, max(nt) AS p95
          FROM ranked
          WHERE rn = CAST(ceil(n * 0.05) AS BIGINT) OR rn = CAST(ceil(n * 0.95) AS BIGINT)
          GROUP BY 1
        )
        SELECT t.lang, count(*) AS n_docs,
               CAST(sum(nt) AS BIGINT) AS tok_sum,
               CAST(sum(greatest(least(nt, p95), p05)) AS BIGINT) AS tok_sum_winsorized,
               CAST(sum(CASE WHEN nt > p95 THEN 1 ELSE 0 END) AS BIGINT) AS n_clamped_hi,
               CAST(sum(CASE WHEN nt < p05 THEN 1 ELSE 0 END) AS BIGINT) AS n_clamped_lo
        FROM toks t JOIN bounds b ON t.lang = b.lang
        GROUP BY 1 ORDER BY 1""")
    ),

    // ------------------------------------------------------------------
    // Table reconciliation — the migration-validation op this whole
    // engine's correctness gate is an instance of: two versions of a
    // table (here: orders vs a deterministically perturbed copy — 2%
    // of rows dropped, 3% with a changed o_comment, keyed by md5 so
    // both engines derive the identical perturbation) are full-outer
    // joined on the key and each row is classified by comparing a
    // whole-row fingerprint. Per-status counts pin exactly how the
    // versions differ. At 100 TB: one co-partitioned full-outer join
    // on the key; fingerprints are computed scan-side so only (key,
    // 32-byte md5) ever shuffles — never the row payload.
    QueryDef(
      "q125_table_reconcile",
      (s, dir) => {
        val orders = Tables(s, dir, "orders")
        def fp(c: String) =
          md5(concat_ws("|", col("o_orderstatus"), col("o_totalprice").cast("string"),
            col("o_orderdate").cast("string"), col(c)))
        val h2 = conv(substring(md5(concat(lit("v2"), col("o_orderkey").cast("string"))), 1, 4), 16, 10)
          .cast("long") // 16 bits: 0..65535
        val v2 = orders
          .withColumn("h2", h2)
          .filter(col("h2") % 50 =!= 0) // drop 2%
          .withColumn(
            "prio2",
            when(col("h2") % 33 === 1, concat(col("o_orderpriority"), lit(" [amended]")))
              .otherwise(col("o_orderpriority"))
          )
        // ~2.5% synthesized INSERTS (re-keyed far above any real key) so
        // the only_v2 branch is reachable — without them v2 ⊆ v1 on keys
        // and a swapped only_v1/only_v2 classification would pass the gate
        val inserts = orders
          .withColumn("h2", h2)
          .filter(col("h2") % 40 === 2)
          .select(
            (col("o_orderkey") + lit(1000000000000L)).as("o_orderkey"),
            col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
            col("o_orderpriority").as("prio2")
          )
        val left = orders.select(col("o_orderkey").as("k"), fp("o_orderpriority").as("fp1"))
        val right = v2
          .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
            col("o_orderdate"), col("prio2"))
          .unionByName(inserts)
          .select(col("o_orderkey").as("k"), fp("prio2").as("fp2"))
        left
          .join(right, Seq("k"), "full_outer")
          .select(
            when(col("fp2").isNull, "only_v1")
              .when(col("fp1").isNull, "only_v2")
              .when(col("fp1") === col("fp2"), "match")
              .otherwise("changed")
              .as("status")
          )
          .groupBy("status")
          .agg(count(lit(1)).as("n"))
          .orderBy("status")
      },
      Some("""WITH h AS (
          SELECT *, CAST(('0x' || substr(md5('v2' || CAST(o_orderkey AS VARCHAR)), 1, 4))
                         AS BIGINT) AS h2
          FROM orders
        ), v2 AS (
          SELECT o_orderkey,
                 CASE WHEN h2 % 33 = 1 THEN o_orderpriority || ' [amended]'
                      ELSE o_orderpriority END AS prio2,
                 o_orderstatus, o_totalprice, o_orderdate
          FROM h WHERE h2 % 50 <> 0
          UNION ALL
          SELECT o_orderkey + 1000000000000 AS o_orderkey,
                 o_orderpriority AS prio2, o_orderstatus, o_totalprice, o_orderdate
          FROM h WHERE h2 % 40 = 2
        ), l AS (
          SELECT o_orderkey AS k,
                 md5(o_orderstatus || '|' || CAST(o_totalprice AS VARCHAR) || '|'
                     || CAST(o_orderdate AS VARCHAR) || '|' || o_orderpriority) AS fp1
          FROM orders
        ), r AS (
          SELECT o_orderkey AS k,
                 md5(o_orderstatus || '|' || CAST(o_totalprice AS VARCHAR) || '|'
                     || CAST(o_orderdate AS VARCHAR) || '|' || prio2) AS fp2
          FROM v2
        )
        SELECT CASE WHEN fp2 IS NULL THEN 'only_v1'
                    WHEN fp1 IS NULL THEN 'only_v2'
                    WHEN fp1 = fp2 THEN 'match'
                    ELSE 'changed' END AS status,
               count(*) AS n
        FROM l FULL OUTER JOIN r USING (k)
        GROUP BY 1 ORDER BY 1""")
    ),

    // ------------------------------------------------------------------
    // Key-skew diagnostic — the report that decides WHEN the salted
    // join (q106) or AQE skew handling is needed: per-key frequencies
    // of lineitem.l_partkey reduced to exact integer statistics (key
    // count, max/mean frequency in 1e6 fixed point, rank-based p99,
    // and the share of rows on the top-10 keys in ppm). Every stage is
    // scale-safe: the wide table is touched once (keyed count,
    // map-side combinable); top-10 is TakeOrderedAndProject; p99 comes
    // from the FREQUENCY-OF-FREQUENCIES table — the value at rank
    // ceil(0.01·nk) from the top equals max{f : #keys with freq ≥ f ≥
    // that rank}, and the cumulative count runs over DISTINCT
    // frequency values, a domain bounded by max multiplicity (dozens),
    // never a global sort of all keys. The three 1-row pieces
    // broadcast-join back together.
    QueryDef(
      "q126_skew_report",
      (s, dir) => {
        val freqs = Tables(s, dir, "lineitem")
          .groupBy("l_partkey")
          .agg(count(lit(1)).as("f"))
        val base = freqs.agg(
          count(lit(1)).as("n_keys"),
          sum("f").as("n_rows"),
          max("f").as("max_f")
        )
        val top10 = freqs
          .orderBy(desc("f"), asc("l_partkey"))
          .limit(10)
          .agg(sum("f").as("top10_rows"))
        val ff = freqs
          .groupBy("f")
          .agg(count(lit(1)).as("nf"))
          .withColumn("cum", sum("nf").over(Window.orderBy(desc("f"))))
        val p99 = ff
          .join(broadcast(base.select(col("n_keys").as("nk"))))
          .filter(col("cum") >= ceil(col("nk") * 0.01))
          .agg(max("f").as("p99_f"))
        base
          .join(broadcast(top10))
          .join(broadcast(p99))
          // integer `div`, not `/`: the ratios must stay exact BIGINTs
          .selectExpr(
            "n_keys",
            "n_rows",
            "max_f",
            "(n_rows * 1000000) div n_keys AS mean_f_e6",
            "p99_f",
            "(top10_rows * 1000000) div n_rows AS top10_ppm"
          )
      },
      Some("""WITH freqs AS (
          SELECT l_partkey, count(*) AS f FROM lineitem GROUP BY 1
        ), ranked AS (
          SELECT f, row_number() OVER (ORDER BY f DESC, l_partkey) AS rk,
                 count(*) OVER () AS nk
          FROM freqs
        )
        SELECT count(*) AS n_keys,
               CAST(sum(f) AS BIGINT) AS n_rows,
               CAST(max(f) AS BIGINT) AS max_f,
               CAST(sum(f) * 1000000 // count(*) AS BIGINT) AS mean_f_e6,
               CAST(max(CASE WHEN rk = CAST(ceil(nk * 0.01) AS BIGINT)
                             THEN f END) AS BIGINT) AS p99_f,
               CAST(sum(CASE WHEN rk <= 10 THEN f ELSE 0 END) * 1000000
                    // sum(f) AS BIGINT) AS top10_ppm
        FROM ranked""")
    ),

    // ------------------------------------------------------------------
    // SCD2 snapshot merge — the slowly-changing-dimension history build
    // every warehouse runs nightly: given two snapshots of a dimension,
    // emit one row per (key, version-run) with [valid_from, valid_to)
    // effective snapshot ids and an is_current flag. The two snapshots
    // are derived deterministically from `customer` (v1 drops keys
    // divisible by 97 — later "inserts"; v2 drops keys divisible by 89
    // — "deletes" — and bumps acctbal by 100 on keys divisible by 7 —
    // "updates"), so inserts, deletes, updates, and no-ops all occur.
    // Shape: UNION the stamped snapshots (no shuffle), ONE hash
    // exchange on the key for the per-key window, then change-point
    // detection via lag() with null-safe comparison (`<=>`, IS
    // DISTINCT FROM in the oracle — no fingerprint strings, so double
    // equality is bitwise and engine-independent). valid_to comes from
    // lead() over surviving change points; a key whose last sighting
    // predates the newest snapshot closes at that snapshot (delete).
    // At 100 TB this is the plan you want: snapshots stream through a
    // single keyed exchange, no join, no global sort except the
    // display ORDER BY the oracle needs.
    QueryDef(
      "q137_scd2_merge",
      (s, dir) => {
        val cust = Tables(s, dir, "customer")
          .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
        val v1 = cust
          .filter(col("c_custkey") % 97 =!= 0)
          .withColumn("v", lit(1L))
        val v2 = cust
          .filter(col("c_custkey") % 89 =!= 0)
          .withColumn(
            "c_acctbal",
            when(col("c_custkey") % 7 === 0, col("c_acctbal") + 100.0)
              .otherwise(col("c_acctbal"))
          )
          .withColumn("v", lit(2L))
        val w = Window.partitionBy("c_custkey").orderBy("v")
        val stamped = v1
          .unionByName(v2)
          .withColumn("last_seen", max(col("v")).over(Window.partitionBy("c_custkey")))
          .withColumn(
            "changed",
            lag(col("v"), 1).over(w).isNull ||
              !(col("c_mktsegment") <=> lag(col("c_mktsegment"), 1).over(w)) ||
              !(col("c_acctbal") <=> lag(col("c_acctbal"), 1).over(w))
          )
        val runs = stamped.filter(col("changed"))
        val w2 = Window.partitionBy("c_custkey").orderBy("v")
        runs
          .withColumn(
            "valid_to",
            coalesce(
              lead(col("v"), 1).over(w2),
              when(col("last_seen") === 2L, lit(null).cast("long")).otherwise(lit(2L))
            )
          )
          .select(
            col("c_custkey"),
            col("c_mktsegment"),
            col("c_acctbal"),
            col("v").as("valid_from"),
            col("valid_to"),
            (col("valid_to").isNull).as("is_current")
          )
          .orderBy("c_custkey", "valid_from")
      },
      Some("""WITH v1 AS (
          SELECT c_custkey, c_mktsegment, c_acctbal, CAST(1 AS BIGINT) AS v
          FROM customer WHERE c_custkey % 97 <> 0
        ), v2 AS (
          SELECT c_custkey, c_mktsegment,
                 CASE WHEN c_custkey % 7 = 0 THEN c_acctbal + 100.0
                      ELSE c_acctbal END AS c_acctbal,
                 CAST(2 AS BIGINT) AS v
          FROM customer WHERE c_custkey % 89 <> 0
        ), stamped AS (
          SELECT *,
                 max(v) OVER (PARTITION BY c_custkey) AS last_seen,
                 (lag(v) OVER (PARTITION BY c_custkey ORDER BY v) IS NULL
                  OR c_mktsegment IS DISTINCT FROM
                     lag(c_mktsegment) OVER (PARTITION BY c_custkey ORDER BY v)
                  OR c_acctbal IS DISTINCT FROM
                     lag(c_acctbal) OVER (PARTITION BY c_custkey ORDER BY v))
                   AS changed
          FROM (SELECT * FROM v1 UNION ALL SELECT * FROM v2)
        ), runs AS (
          SELECT * FROM stamped WHERE changed
        )
        SELECT c_custkey, c_mktsegment, c_acctbal,
               v AS valid_from,
               coalesce(lead(v) OVER (PARTITION BY c_custkey ORDER BY v),
                        CASE WHEN last_seen = 2 THEN NULL
                             ELSE CAST(2 AS BIGINT) END) AS valid_to,
               (coalesce(lead(v) OVER (PARTITION BY c_custkey ORDER BY v),
                         CASE WHEN last_seen = 2 THEN NULL
                              ELSE CAST(2 AS BIGINT) END) IS NULL) AS is_current
        FROM runs ORDER BY c_custkey, valid_from""")
    ),

    // ------------------------------------------------------------------
    // Ordered conversion funnel over the event stream — the classic
    // product-analytics op (first-touch semantics): per user, the
    // first 'view', the first 'click' STRICTLY AFTER that view, the
    // first 'purchase' strictly after that click. Emits per step the
    // surviving user count and its share of step 1 in ppm (integer DIV
    // — exact). Order-sensitivity is the whole op: a purchase BEFORE
    // the first view does not convert, which a naive per-type count
    // gets wrong. Plan: one user-keyed window computes the first-view
    // time alongside the stream, then two user-keyed conditional
    // aggregates chain the strictly-after mins — three user-bounded
    // exchanges, no self-join of the raw stream, no skew (user
    // cardinality-keyed).
    QueryDef(
      "q177_funnel",
      (s, dir) => {
        val (n1, n2, n3) =
          funnelCounts(Tables(s, dir, "events").select("user_id", "event_type", "ts"))
        import s.implicits._
        Seq(
          ("1_view", n1, 1000000L),
          ("2_click", n2, if (n1 == 0) 0L else n2 * 1000000L / n1),
          ("3_purchase", n3, if (n1 == 0) 0L else n3 * 1000000L / n1)
        ).toDF("step", "n_users", "ppm_of_step1").orderBy("step")
      },
      Some(funnelOracleSql)
    ),

    // ------------------------------------------------------------------
    // E7/E14 (time-series gap-fill + linear interpolation): per-user
    // daily purchase series with missing days filled by interpolating
    // between the nearest observed neighbors — the regularization
    // every metrics/training-curve pipeline needs before windowed
    // models see the series. Per user: one groupBy builds the observed
    // days, the date spine is GENERATED per user from its own
    // [min, max] range (sequence + explode — no cross join against a
    // global calendar), and prev/next observations arrive via two
    // ignore-nulls window passes over user-bounded frames. All value
    // arithmetic is integer micro-units with one DIV — the lerp
    // (prev + (next−prev)·(d−dp) DIV (dn−dp)) is exact in both
    // engines, so the whole fill is oracle-checkable. Spine edges are
    // observed by construction, so every gap day has both neighbors.
    // 100 TB posture: everything after the daily rollup is keyed by
    // user and windowed inside user-bounded frames — one exchange on
    // user_id; the spine explode is output-scaled (days), never a
    // calendar cross join.
    QueryDef(
      "q235_gapfill_interp",
      (s, dir) => {
        val daily = Tables(s, dir, "events")
          .filter(col("event_type") === "purchase")
          .groupBy(col("user_id"), col("ts").cast("date").as("day"))
          .agg(sum(expr("CAST(round(value * 1000000) AS bigint)")).as("obs_micros"))
        val spine = daily
          .groupBy("user_id")
          .agg(min("day").as("d0"), max("day").as("d1"))
          .select(
            col("user_id"),
            explode(expr("sequence(d0, d1, interval 1 day)")).as("day")
          )
        val wPrev = Window
          .partitionBy("user_id")
          .orderBy("day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wNext = Window
          .partitionBy("user_id")
          .orderBy("day")
          .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        spine
          .join(daily, Seq("user_id", "day"), "left")
          .withColumn("pv", last(col("obs_micros"), ignoreNulls = true).over(wPrev))
          .withColumn("pd", last(when(col("obs_micros").isNotNull, col("day")), ignoreNulls = true).over(wPrev))
          .withColumn("nv", first(col("obs_micros"), ignoreNulls = true).over(wNext))
          .withColumn("nd", first(when(col("obs_micros").isNotNull, col("day")), ignoreNulls = true).over(wNext))
          .select(
            col("user_id"),
            col("day"),
            coalesce(
              col("obs_micros"),
              col("pv") + expr("((nv - pv) * datediff(day, pd)) DIV datediff(nd, pd)")
            ).as("value_micros"),
            when(col("obs_micros").isNotNull, "obs").otherwise("interp").as("src")
          )
          .filter(col("user_id") < 120)
          .orderBy("user_id", "day")
      },
      Some("""WITH daily AS (
          SELECT user_id, CAST(ts AS DATE) AS day,
                 CAST(sum(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT) AS obs
          FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
        spine AS (
          SELECT user_id, CAST(unnest(generate_series(min(day), max(day), INTERVAL 1 DAY)) AS DATE) AS day
          FROM daily GROUP BY user_id),
        j AS (
          SELECT s.user_id, s.day, d.obs,
                 last_value(d.obs IGNORE NULLS) OVER
                   (PARTITION BY s.user_id ORDER BY s.day
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
                 last_value(CASE WHEN d.obs IS NOT NULL THEN s.day END IGNORE NULLS) OVER
                   (PARTITION BY s.user_id ORDER BY s.day
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pd,
                 first_value(d.obs IGNORE NULLS) OVER
                   (PARTITION BY s.user_id ORDER BY s.day
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
                 first_value(CASE WHEN d.obs IS NOT NULL THEN s.day END IGNORE NULLS) OVER
                   (PARTITION BY s.user_id ORDER BY s.day
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
          FROM spine s LEFT JOIN daily d USING (user_id, day))
        SELECT user_id, day,
               COALESCE(obs, pv + ((nv - pv) * datediff('day', pd, day))
                                   // datediff('day', pd, nd)) AS value_micros,
               CASE WHEN obs IS NOT NULL THEN 'obs' ELSE 'interp' END AS src
        FROM j WHERE user_id < 120 ORDER BY user_id, day""")
    ),

    // ------------------------------------------------------------------
    // E5/E14 (robust anomaly screening, median/MAD): the data-quality
    // gate that survives the outliers it hunts — per event type, flag
    // values beyond 3 median-absolute-deviations. Values are integer
    // micro-units, so both medians land on exact .0/.5 doubles and
    // the 3·MAD comparison is bit-identical across engines (a
    // mean/stddev screen would both drift and be corrupted by the
    // outliers themselves). Two grouped exact medians + two broadcast
    // joins back (the group table is categorical-small); the per-type
    // exact median is a sort-based aggregate within each group — at
    // 100 TB swap in a quantile sketch if groups become data-scaled,
    // but a screen's thresholds should not be approximate when they
    // can be exact.
    QueryDef(
      "q244_mad_anomaly",
      (s, dir) => {
        val ev = Tables(s, dir, "events")
          .filter(col("value").isNotNull)
          .select(
            col("event_type"),
            col("event_id"),
            expr("CAST(round(value * 1000000) AS bigint)").as("v")
          )
        val med = ev.groupBy("event_type").agg(median(col("v")).as("med"))
        val dev = ev
          .join(broadcast(med), Seq("event_type"))
          .withColumn("d", abs(col("v") - col("med")))
        val mad = dev.groupBy("event_type").agg(median(col("d")).as("mad"))
        dev
          .join(broadcast(mad), Seq("event_type"))
          .groupBy("event_type")
          .agg(
            count(lit(1)).as("n"),
            max(col("med")).as("med"),
            max(col("mad")).as("mad"),
            sum(when(col("d") > lit(3.0) * col("mad"), 1L).otherwise(0L)).as("n_anom"),
            max(when(col("d") > lit(3.0) * col("mad"), col("d"))).as("max_anom_dev")
          )
          .orderBy("event_type")
      },
      Some("""WITH ev AS (
          SELECT event_type, event_id,
                 CAST(round(value * 1000000) AS BIGINT) AS v
          FROM events WHERE value IS NOT NULL),
        med AS (SELECT event_type, median(v) AS med FROM ev GROUP BY 1),
        dev AS (
          SELECT ev.event_type, abs(v - med) AS d, med
          FROM ev JOIN med USING (event_type)),
        mad AS (SELECT event_type, median(d) AS mad FROM dev GROUP BY 1)
        SELECT dev.event_type, count(*) AS n,
               max(dev.med) AS med, max(mad.mad) AS mad,
               CAST(sum(CASE WHEN d > 3.0 * mad.mad THEN 1 ELSE 0 END) AS BIGINT) AS n_anom,
               max(CASE WHEN d > 3.0 * mad.mad THEN d END) AS max_anom_dev
        FROM dev JOIN mad USING (event_type)
        GROUP BY dev.event_type ORDER BY dev.event_type""")
    ),

    // ------------------------------------------------------------------
    // RETENTION COHORT MATRIX — the product-analytics staple: users
    // grouped by their FIRST-activity day (the cohort), each later
    // active day attributed to (cohort, day offset) with distinct-user
    // counts — the diagonal decay every growth dashboard plots. One
    // keyed min + one join + one distinct aggregate; at 100 TB the
    // first-touch table is user-scaled and broadcastable per cohort
    // shard, and the distinct count shuffles (cohort, offset, user)
    // triples once. ORACLE-EXACT (dates rendered as strings so both
    // engines hash identical bytes).
    QueryDef(
      "q257_retention_cohort",
      (s, dir) => cohortReport(Tables(s, dir, "events").select("user_id", "ts")),
      Some(cohortOracleSql)
    ),

    // ------------------------------------------------------------------
    // CUSUM CHANGEPOINT SCREEN — the classic sequential drift detector
    // (Page 1954) over per-type daily event counts, made RELATIONAL by
    // the prefix identity: the recursion s_d = max(0, s_{d-1} + x_d −
    // target − slack) equals P_d − min(0, min_{j≤d} P_j) with P the
    // running sum of (x − target − slack) — so the whole detector is
    // two ordered windows per key (running sum + running min), no
    // sequential fold, no driver loop, and DuckDB restates the
    // identical windows. Integer target/slack/threshold (mean daily
    // count, a tenth of it, 2× it) keep every value exact. Windows are
    // DAY-scaled per key — at 100 TB the daily rollup shrinks the
    // series to O(days × types) before any window runs.
    QueryDef(
      "q258_cusum_changepoint",
      (s, dir) => cusumReport(Tables(s, dir, "events").select("event_type", "ts")),
      Some(cusumOracleSql)
    ),

    // ------------------------------------------------------------------
    // INTEGER EWMA FORECAST — exponential smoothing over the same
    // per-type daily series, with the floor-division recursion
    // ewma_d = (7·ewma_{d-1} + x_d) DIV 8 that has no closed form —
    // the genuine sequential-fold case, expressed as an `aggregate`
    // higher-order function over the day-sorted series (seeded with
    // day 1, so both engines fold the identical chain; DuckDB's
    // list_reduce seeds from the first element natively). The fold
    // runs over a DAY-scaled array per key — at 100 TB the daily
    // rollup exchange dominates and the fold is free. Counts and
    // value mass (exact cents) each get a smoothed forecast.
    QueryDef(
      "q259_ewma_forecast",
      (s, dir) => {
        val daily = Tables(s, dir, "events")
          .select(
            col("event_type"),
            to_date(col("ts")).as("d"),
            expr("CAST(round(value * 100) AS BIGINT)").as("cents")
          )
          .groupBy("event_type", "d")
          .agg(count(lit(1)).as("x"), sum("cents").as("vc"))
        daily
          .groupBy("event_type")
          .agg(
            count(lit(1)).as("n_days"),
            sort_array(collect_list(struct(col("d"), col("x"), col("vc")))).as("xs")
          )
          .select(
            col("event_type"),
            col("n_days"),
            expr("""aggregate(slice(xs, 2, size(xs) - 1), xs[0].x,
                     (a, e) -> (7L * a + e.x) DIV 8L)""").as("ewma_count"),
            expr("""aggregate(slice(xs, 2, size(xs) - 1), xs[0].vc,
                     (a, e) -> (7L * a + e.vc) DIV 8L)""").as("ewma_cents")
          )
          .orderBy("event_type")
      },
      Some("""WITH daily AS (
          SELECT event_type, CAST(ts AS DATE) AS d, count(*) AS x,
                 CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS vc
          FROM events GROUP BY 1, 2),
        series AS (
          SELECT event_type, count(*) AS n_days,
                 list(x ORDER BY d) AS xl, list(vc ORDER BY d) AS vl
          FROM daily GROUP BY 1)
        SELECT event_type, CAST(n_days AS BIGINT) AS n_days,
               CAST(list_reduce(xl, (a, e) -> (7 * a + e) // 8) AS BIGINT) AS ewma_count,
               CAST(list_reduce(vl, (a, e) -> (7 * a + e) // 8) AS BIGINT) AS ewma_cents
        FROM series ORDER BY event_type""")
    ),

    // ------------------------------------------------------------------
    // LAST-TOUCH ATTRIBUTION (round 13): every purchase is credited to
    // the user's most recent preceding non-purchase touch (view/click/
    // error as the "channels") within a 3-day lookback — the marketing
    // attribution staple. One user-keyed ordered window (last_value of
    // the running touch over the interleaved event stream) — never a
    // purchases × touches self-join, whose skew would follow the most
    // active user. Purchases with no in-window touch credit
    // 'unattributed'. Value mass in exact cents. ORACLE-EXACT.
    QueryDef(
      "q272_attribution",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val ev = Tables(s, dir, "events")
          .select(
            col("user_id"),
            col("ts"),
            col("event_type"),
            expr("CAST(round(value * 100) AS BIGINT)").as("cents")
          )
        val w = Window
          .partitionBy("user_id")
          .orderBy("ts", "event_type")
          .rowsBetween(Window.unboundedPreceding, -1)
        val attributed = ev
          .withColumn(
            "touch",
            last(
              when(col("event_type") =!= "purchase", struct(col("ts").as("t"), col("event_type").as("ch"))),
              ignoreNulls = true
            ).over(w)
          )
          .filter(col("event_type") === "purchase")
          .withColumn(
            "channel",
            when(
              col("touch").isNotNull &&
                col("ts").cast("long") - col("touch.t").cast("long") <= 3L * 86400L,
              col("touch.ch")
            ).otherwise("unattributed")
          )
        attributed
          .groupBy("channel")
          .agg(count(lit(1)).as("n_purchases"), sum("cents").as("cents"))
          .orderBy("channel")
      },
      Some("""WITH ev AS (
          SELECT user_id, ts, event_type,
                 CAST(round(value * 100) AS BIGINT) AS cents
          FROM events),
        touched AS (
          SELECT *,
                 last_value(CASE WHEN event_type <> 'purchase'
                                 THEN struct_pack(t := ts, ch := event_type) END
                            IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY ts, event_type
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch
          FROM ev),
        purchases AS (
          SELECT CASE WHEN touch IS NOT NULL
                       AND CAST(floor(epoch(ts)) AS BIGINT)
                           - CAST(floor(epoch(touch.t)) AS BIGINT) <= 3 * 86400
                      THEN touch.ch ELSE 'unattributed' END AS channel,
                 cents
          FROM touched WHERE event_type = 'purchase')
        SELECT channel, count(*) AS n_purchases,
               CAST(sum(cents) AS BIGINT) AS cents
        FROM purchases GROUP BY channel ORDER BY channel""")
    ),

    // ------------------------------------------------------------------
    // CONVERSION LATENCY (round 13): time from each user's FIRST view
    // to their FIRST strictly-later purchase — q177's funnel chain with
    // the latency distribution attached: per-converting-user seconds,
    // then exact integer median / min / max per cohort-free rollup.
    // One user-keyed aggregate; the median runs over the converting
    // USERS (user-scaled, not event-scaled). ORACLE-EXACT (integer
    // epoch seconds; medians of BIGINT agree across engines because
    // the even-count average of two longs is computed identically).
    QueryDef(
      "q273_conversion_latency",
      (s, dir) => {
        val ev = Tables(s, dir, "events").select("user_id", "event_type", "ts")
        val v1 = ev
          .filter(col("event_type") === "view")
          .groupBy("user_id")
          .agg(min("ts").as("t1"))
        val p1 = ev
          .filter(col("event_type") === "purchase")
          .join(v1, Seq("user_id"))
          .filter(col("ts") > col("t1"))
          .groupBy("user_id")
          .agg(min("ts").as("tp"), min("t1").as("t1"))
          .select(
            col("user_id"),
            (col("tp").cast("long") - col("t1").cast("long")).as("latency_s")
          )
        p1.agg(
          count(lit(1)).as("n_converted"),
          min("latency_s").as("min_s"),
          expr("CAST(FLOOR(median(latency_s)) AS BIGINT)").as("median_s"),
          max("latency_s").as("max_s")
        ).select(lit("view->purchase").as("step"), col("n_converted"), col("min_s"), col("median_s"), col("max_s"))
      },
      Some("""WITH v1 AS (
          SELECT user_id, min(ts) AS t1 FROM events
          WHERE event_type = 'view' GROUP BY 1),
        p1 AS (
          SELECT e.user_id,
                 CAST(floor(epoch(min(e.ts))) AS BIGINT)
                   - CAST(floor(epoch(min(v1.t1))) AS BIGINT) AS latency_s
          FROM events e JOIN v1 USING (user_id)
          WHERE e.event_type = 'purchase' AND e.ts > v1.t1
          GROUP BY 1)
        SELECT 'view->purchase' AS step,
               count(*) AS n_converted,
               CAST(min(latency_s) AS BIGINT) AS min_s,
               CAST(FLOOR(median(latency_s)) AS BIGINT) AS median_s,
               CAST(max(latency_s) AS BIGINT) AS max_s
        FROM p1""")
    ),

    // ------------------------------------------------------------------
    // EVENT TRANSITION MATRIX (round 14): the first-order Markov view
    // of user behavior — for every (from, to) event-type pair, how
    // often does `to` immediately follow `from` in a user's timeline,
    // and what fraction of `from`'s transitions does that represent
    // (exact ppm — integer DIV, no float drift). One user-keyed
    // ordered window (lead) + one pair-keyed aggregate + one
    // from-keyed window sum: event-scaled, never a self-join, and the
    // per-user window never concentrates more than one user's events
    // on a task. Deterministic tie order (ts, event_id — unique).
    // ORACLE-EXACT.
    QueryDef(
      "q284_event_transitions",
      (s, dir) => {
        val ev = Tables(s, dir, "events").select("user_id", "event_type", "ts", "event_id")
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        ev.withColumn("to_type", lead("event_type", 1).over(w))
          .filter(col("to_type").isNotNull)
          .groupBy(col("event_type").as("from_type"), col("to_type"))
          .agg(count(lit(1)).as("n"))
          .withColumn("tot", sum("n").over(Window.partitionBy("from_type")))
          .select(
            col("from_type"),
            col("to_type"),
            col("n"),
            expr("(n * 1000000) DIV tot").as("p_ppm")
          )
          .orderBy("from_type", "to_type")
      },
      Some("""WITH seq AS (
          SELECT user_id, event_type,
                 lead(event_type) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS to_type
          FROM events),
        t AS (
          SELECT event_type AS from_type, to_type, count(*) AS n
          FROM seq WHERE to_type IS NOT NULL GROUP BY 1, 2)
        SELECT from_type, to_type, n,
               CAST((n * 1000000) // sum(n) OVER (PARTITION BY from_type)
                 AS BIGINT) AS p_ppm
        FROM t ORDER BY from_type, to_type""")
    ),

    // ------------------------------------------------------------------
    // RFM SEGMENTATION (round 14): the classic customer scoring —
    // recency (days since last event, integer epoch-micros DIV),
    // frequency (event count), monetary (exact cents: floor(value*100)
    // is one IEEE product + floor, bit-identical across engines) —
    // each scored 1-5 by DETERMINISTIC quintile (row_number with the
    // user id as tiebreak, then integer bucket arithmetic; ntile's
    // tie placement is engine-defined and would break the hash).
    // Plan: one user-keyed aggregate (event-scaled) + three exact
    // DISTRIBUTED global ranks over the per-user rollup
    // ([[graft.operators.DistributedRank]]: range-partition + local
    // sort + broadcast prefix offsets — the round-15 replacement for
    // the partition-less rank windows this query shipped with, which
    // moved every user into ONE sort task; at 100 TB each rank pass is
    // now fully parallel and the events never enter it at all).
    // ORACLE-EXACT.
    QueryDef(
      "q285_rfm_segmentation",
      (s, dir) => {
        val ev = Tables(s, dir, "events").select("user_id", "ts", "value")
        val per = ev
          .groupBy("user_id")
          .agg(
            max(unix_micros(col("ts"))).as("last_us"),
            count(lit(1)).as("freq"),
            sum(expr("CAST(floor(value * 100) AS BIGINT)")).as("monetary_c")
          )
        val maxUs = per.agg(max("last_us")).head().getLong(0)
        val base = per
          .withColumn("r_days", expr(s"(${maxUs}L - last_us) DIV 86400000000"))
        val byR = DistributedRank.rowNumber(base, Seq(col("r_days"), col("user_id")), "rr")
        val n = byR.total
        val byF = DistributedRank
          .rowNumber(byR.df, Seq(col("freq").desc, col("user_id")), "fr")
        val byM = DistributedRank
          .rowNumber(byF.df, Seq(col("monetary_c").desc, col("user_id")), "mr")
        val scored = byM.df
          .select(
            col("user_id"),
            col("r_days"),
            col("freq"),
            col("monetary_c"),
            expr(s"5 - (((rr - 1) * 5) DIV ${n}L)").as("r_score"),
            expr(s"5 - (((fr - 1) * 5) DIV ${n}L)").as("f_score"),
            expr(s"5 - (((mr - 1) * 5) DIV ${n}L)").as("m_score")
          )
          .withColumn("rfm", expr("r_score * 100 + f_score * 10 + m_score"))
        scored.orderBy("user_id")
      },
      Some("""WITH per AS (
          SELECT user_id, CAST(max(epoch_us(ts)) AS BIGINT) AS last_us,
                 count(*) AS freq,
                 CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS monetary_c
          FROM events GROUP BY 1),
        anchor AS (SELECT max(last_us) AS mx, count(*) AS n FROM per),
        base AS (
          SELECT user_id, CAST((mx - last_us) // 86400000000 AS BIGINT) AS r_days,
                 freq, monetary_c, n
          FROM per, anchor),
        ranked AS (
          SELECT *,
                 row_number() OVER (ORDER BY r_days, user_id) AS rr,
                 row_number() OVER (ORDER BY freq DESC, user_id) AS fr,
                 row_number() OVER (ORDER BY monetary_c DESC, user_id) AS mr
          FROM base)
        SELECT user_id, r_days, freq, monetary_c,
               CAST(5 - (((rr - 1) * 5) // n) AS BIGINT) AS r_score,
               CAST(5 - (((fr - 1) * 5) // n) AS BIGINT) AS f_score,
               CAST(5 - (((mr - 1) * 5) // n) AS BIGINT) AS m_score,
               CAST((5 - (((rr - 1) * 5) // n)) * 100
                    + (5 - (((fr - 1) * 5) // n)) * 10
                    + (5 - (((mr - 1) * 5) // n)) AS BIGINT) AS rfm
        FROM ranked ORDER BY user_id""")
    ),

    // ------------------------------------------------------------------
    // A/B TWO-PROPORTION Z-TEST (round 14): the experimentation
    // primitive — conversion-rate difference between two user cohorts
    // (conversion = a high-value purchase; plain "any purchase" is
    // degenerate on this data — every user converts, the pooled
    // variance is 0, and the z statistic is 0/0, which ANSI mode
    // rightly refuses) with the pooled-variance z statistic. Counts
    // are exact integers from one user-keyed rollup; the z value is
    // ONE textually identical sequence of correctly-rounded double ops
    // on both engines (all literals spelled `1e0` — `1.0` parses as
    // DECIMAL in BOTH engines and would drag the arithmetic through
    // engine-specific decimal scales; every intermediate is an IEEE
    // double of exact-integer inputs < 2^53, sqrt is correctly
    // rounded, floor of the identical double is identical), and the
    // verdict thresholds the integer micros at the two-sided 5%
    // critical value. ORACLE-EXACT.
    QueryDef(
      "q288_ab_proportion_test",
      (s, dir) => {
        val zExpr =
          """CAST(floor(
               ((CAST(c0 AS DOUBLE) / n0) - (CAST(c1 AS DOUBLE) / n1))
               / sqrt((CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
                      * (1e0 - CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
                      * (1e0 / n0 + 1e0 / n1))
               * 1000000e0) AS BIGINT)"""
        Tables(s, dir, "events")
          .select("user_id", "event_type", "value")
          .groupBy("user_id")
          .agg(
            max(
              when(col("event_type") === "purchase" && col("value") > 100, 1L).otherwise(0L)
            ).as("conv")
          )
          .withColumn("cohort", col("user_id") % 2)
          .agg(
            sum(when(col("cohort") === 0, 1L).otherwise(0L)).as("n0"),
            sum(when(col("cohort") === 0, col("conv")).otherwise(0L)).as("c0"),
            sum(when(col("cohort") === 1, 1L).otherwise(0L)).as("n1"),
            sum(when(col("cohort") === 1, col("conv")).otherwise(0L)).as("c1")
          )
          .select(
            col("n0"),
            col("c0"),
            col("n1"),
            col("c1"),
            expr("(c0 * 1000000) DIV n0").as("rate0_ppm"),
            expr("(c1 * 1000000) DIV n1").as("rate1_ppm"),
            expr(zExpr).as("z_micros"),
            expr(s"abs($zExpr) > 1959964").as("significant")
          )
      },
      Some("""WITH u AS (
          SELECT user_id,
                 max(CASE WHEN event_type = 'purchase' AND value > 100
                     THEN 1 ELSE 0 END) AS conv,
                 user_id % 2 AS cohort
          FROM events GROUP BY user_id),
        agg AS (
          SELECT CAST(sum(CASE WHEN cohort = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
                 CAST(sum(CASE WHEN cohort = 0 THEN conv ELSE 0 END) AS BIGINT) AS c0,
                 CAST(sum(CASE WHEN cohort = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
                 CAST(sum(CASE WHEN cohort = 1 THEN conv ELSE 0 END) AS BIGINT) AS c1
          FROM u),
        z AS (
          SELECT *,
                 CAST(floor(
                   ((CAST(c0 AS DOUBLE) / n0) - (CAST(c1 AS DOUBLE) / n1))
                   / sqrt((CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
                          * (1e0 - CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
                          * (1e0 / n0 + 1e0 / n1))
                   * 1000000e0) AS BIGINT) AS z_micros
          FROM agg)
        SELECT n0, c0, n1, c1,
               (c0 * 1000000) // n0 AS rate0_ppm,
               (c1 * 1000000) // n1 AS rate1_ppm,
               z_micros,
               abs(z_micros) > 1959964 AS significant
        FROM z""")
    ),

    // ------------------------------------------------------------------
    // MANN-WHITNEY U TEST (round 14): the rank-based complement to
    // q288's parametric z — does the purchase-value DISTRIBUTION
    // differ between two user cohorts, with no normality assumption?
    // Values are coarsened to integer floors so ties are real and the
    // tie machinery is exercised, not vestigial. All rank arithmetic
    // is exact-integer: average ranks are half-integers, so ranks are
    // carried ×2 (2·avgrank = 2·rank_min + t − 1 for a tie group of
    // size t), the rank-sum and U fold without a single float, and
    // the tie correction Σ(t³−t) falls out of the SAME ranked pass as
    // sum(t²−1) — one global rank window + one aggregate, no second
    // scan, no scalar cross join. The normal-approximation z is then
    // ONE textually identical double sequence over those exact
    // integers (q288's discipline: `1e0` literals, floor at micros).
    // Plan (round 15, replacing the partition-less rank window that
    // single-task-sorted every purchase row): ranks only ever attach
    // to VALUE GROUPS — rank_min(v) = 1 + Σ_{v'<v} t(v') — so the
    // purchases fold to one row per distinct value first (event-scaled
    // aggregate) and the global structure is an exact distributed
    // prefix sum over the group frame
    // ([[graft.operators.DistributedRank.prefixSumExclusive]]: range
    // partition + pid-partitioned running sum + broadcast offsets).
    // Identical integers: 2·avgrank = 2·rank_min + t − 1 per group,
    // the cohort-0 rank sum weights that by the group's cohort-0
    // count, and the tie term t³−t is per-group algebra. Nothing
    // data-scaled crosses a single partition. ORACLE-EXACT.
    QueryDef(
      "q294_mann_whitney",
      (s, dir) => {
        val zExpr =
          """CAST(floor(
               ((CAST(r0_2 - n0 * (n0 + 1) AS DOUBLE) / 2e0)
                 - CAST(n0 AS DOUBLE) * n1 / 2e0)
               / sqrt(CAST(n0 AS DOUBLE) * n1 / 12e0
                      * ((CAST(n0 + n1 AS DOUBLE) + 1e0)
                         - CAST(tie3 AS DOUBLE)
                           / (CAST(n0 + n1 AS DOUBLE) * (n0 + n1 - 1))))
               * 1000000e0) AS BIGINT)"""
        val groups = Tables(s, dir, "events")
          .filter(col("event_type") === "purchase")
          .select(
            expr("CAST(floor(value) AS BIGINT)").as("v"),
            (col("user_id") % 2).as("cohort")
          )
          .groupBy("v")
          .agg(
            count(lit(1)).as("t"),
            sum(when(col("cohort") === 0, 1L).otherwise(0L)).as("c0")
          )
        // rank_min(v) = 1 + (rows with a strictly smaller value) — the
        // exact distributed prefix sum over the group frame; v is
        // unique per row here, so the order is total by construction
        DistributedRank
          .prefixSumExclusive(groups, Seq(col("v")), col("t"), "pre")
          .df
          .withColumn("r_lo", col("pre") + 1L)
          .agg(
            // Σ over cohort-0 rows of 2·avgrank = Σ groups c0·(2·rank_min + t − 1)
            sum(expr("c0 * (2 * r_lo + t - 1)")).as("r0_2"),
            sum(col("c0")).as("n0"),
            sum(expr("t - c0")).as("n1"),
            // Σ_v (t³ − t): per-group algebra — no per-row pass needed
            sum(expr("t * (t * t - 1)")).as("tie3")
          )
          .select(
            col("n0"),
            col("n1"),
            expr("(r0_2 - n0 * (n0 + 1)) DIV 2").as("u0"),
            expr("n0 * n1 - (r0_2 - n0 * (n0 + 1)) DIV 2").as("u1"),
            col("tie3"),
            expr(zExpr).as("z_micros"),
            expr(s"abs($zExpr) > 1959964").as("significant")
          )
      },
      Some("""WITH p AS (
          SELECT CAST(floor(value) AS BIGINT) AS v, user_id % 2 AS cohort
          FROM events WHERE event_type = 'purchase'),
        r AS (
          SELECT cohort,
                 CAST(rank() OVER (ORDER BY v) AS BIGINT) AS r_lo,
                 CAST(count(*) OVER (PARTITION BY v) AS BIGINT) AS t
          FROM p),
        agg AS (
          SELECT CAST(sum(CASE WHEN cohort = 0 THEN 2 * r_lo + t - 1 ELSE 0 END) AS BIGINT) AS r0_2,
                 CAST(sum(CASE WHEN cohort = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
                 CAST(sum(CASE WHEN cohort = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
                 CAST(sum(t * t - 1) AS BIGINT) AS tie3
          FROM r),
        z AS (
          SELECT *,
                 CAST(floor(
                   ((CAST(r0_2 - n0 * (n0 + 1) AS DOUBLE) / 2e0)
                     - CAST(n0 AS DOUBLE) * n1 / 2e0)
                   / sqrt(CAST(n0 AS DOUBLE) * n1 / 12e0
                          * ((CAST(n0 + n1 AS DOUBLE) + 1e0)
                             - CAST(tie3 AS DOUBLE)
                               / (CAST(n0 + n1 AS DOUBLE) * (n0 + n1 - 1))))
                   * 1000000e0) AS BIGINT) AS z_micros
          FROM agg)
        SELECT n0, n1,
               (r0_2 - n0 * (n0 + 1)) // 2 AS u0,
               n0 * n1 - (r0_2 - n0 * (n0 + 1)) // 2 AS u1,
               tie3, z_micros,
               abs(z_micros) > 1959964 AS significant
        FROM z""")
    ),

    // ------------------------------------------------------------------
    // CHI-SQUARED INDEPENDENCE TEST (round 14): is event mix
    // independent of user cohort? The contingency table is cohort
    // (user_id % 3) × event_type with exact integer observed counts;
    // expected counts are row·col/N doubles. Float summation order is
    // engine-defined in a plain SUM, so the statistic is folded over
    // the cell contributions IN SORTED CELL ORDER via the q259
    // aggregate-HOF discipline — both engines execute the identical
    // left-fold over the identical doubles, making a 15-cell double
    // sum bit-reproducible. Plan: one event-scaled aggregate down to
    // |cohorts|×|types| cells, then windows + the fold over that tiny
    // frame — nothing data-scaled touches a window. The 5% critical
    // value for df = (3−1)(5−1) = 8 is 15.50731 (pinned in micros).
    // ORACLE-EXACT.
    QueryDef(
      "q295_chi_squared",
      (s, dir) => {
        val xExpr =
          """(CAST(o AS DOUBLE) - CAST(r AS DOUBLE) * c / n)
             * (CAST(o AS DOUBLE) - CAST(r AS DOUBLE) * c / n)
             / (CAST(r AS DOUBLE) * c / n)"""
        Tables(s, dir, "events")
          .groupBy((col("user_id") % 3).as("cohort"), col("event_type"))
          .agg(count(lit(1)).as("o"))
          .withColumn("r", sum("o").over(Window.partitionBy("cohort")))
          .withColumn("c", sum("o").over(Window.partitionBy("event_type")))
          .withColumn("n", sum("o").over(Window.partitionBy()))
          .withColumn("x", expr(xExpr))
          .agg(
            count(lit(1)).as("n_cells"),
            countDistinct("cohort").as("n_rows"),
            countDistinct("event_type").as("n_cols"),
            sort_array(collect_list(struct(col("cohort"), col("event_type"), col("x")))).as("xs")
          )
          .select(
            col("n_cells"),
            expr("(n_rows - 1) * (n_cols - 1)").as("df"),
            expr("CAST(floor(aggregate(xs, CAST(0 AS DOUBLE), (a, e) -> a + e.x) * 1000000e0) AS BIGINT)")
              .as("chi2_micros"),
            expr("CAST(floor(aggregate(xs, CAST(0 AS DOUBLE), (a, e) -> a + e.x) * 1000000e0) AS BIGINT) > 15507313")
              .as("significant")
          )
      },
      Some("""WITH cells AS (
          SELECT user_id % 3 AS cohort, event_type, count(*) AS o
          FROM events GROUP BY 1, 2),
        tot AS (
          SELECT cohort, event_type, o,
                 sum(o) OVER (PARTITION BY cohort) AS r,
                 sum(o) OVER (PARTITION BY event_type) AS c,
                 sum(o) OVER () AS n
          FROM cells),
        contrib AS (
          SELECT cohort, event_type,
                 (CAST(o AS DOUBLE) - CAST(r AS DOUBLE) * c / n)
                 * (CAST(o AS DOUBLE) - CAST(r AS DOUBLE) * c / n)
                 / (CAST(r AS DOUBLE) * c / n) AS x
          FROM tot),
        folded AS (
          SELECT CAST(count(*) AS BIGINT) AS n_cells,
                 CAST(count(DISTINCT cohort) AS BIGINT) AS n_rows,
                 CAST(count(DISTINCT event_type) AS BIGINT) AS n_cols,
                 list(x ORDER BY cohort, event_type) AS xs
          FROM contrib)
        SELECT n_cells,
               (n_rows - 1) * (n_cols - 1) AS df,
               CAST(floor(list_reduce(xs, (a, e) -> a + e) * 1000000e0) AS BIGINT) AS chi2_micros,
               CAST(floor(list_reduce(xs, (a, e) -> a + e) * 1000000e0) AS BIGINT) > 15507313 AS significant
        FROM folded""")
    ),

    // ------------------------------------------------------------------
    // CUPED VARIANCE REDUCTION (round 14): the experimentation
    // platform's workhorse adjustment — each user's post-period
    // purchase spend (days 15+) is adjusted by their PRE-period spend
    // (days 1-14) via θ = cov(X,Y)/var(X), shrinking metric variance
    // by the squared correlation without biasing the treatment
    // difference (Deng et al., WSDM'13). Moments are EXACT integer
    // sums of cents (the q56 discipline — a built-in covar_samp merges
    // float partials in partition order and is not reproducible);
    // θ, the adjusted means, and the variance-reduction ratio are one
    // textually identical double sequence over those integers. Plan:
    // one user-keyed rollup (event-scaled) + one 6-sum global
    // aggregate + one 2-row cohort aggregate. The date split is the
    // fixture midpoint (the generator's January window), not a data
    // scan. ORACLE-EXACT.
    QueryDef(
      "q296_cuped",
      (s, dir) => {
        val per = Tables(s, dir, "events")
          .select("user_id", "ts", "event_type", "value")
          .groupBy("user_id")
          .agg(
            sum(
              when(
                col("ts") < lit("2024-01-15").cast("timestamp")
                  && col("event_type") === "purchase",
                expr("CAST(round(value * 100) AS BIGINT)")
              ).otherwise(0L)
            ).as("x"),
            sum(
              when(
                col("ts") >= lit("2024-01-15").cast("timestamp")
                  && col("event_type") === "purchase",
                expr("CAST(round(value * 100) AS BIGINT)")
              ).otherwise(0L)
            ).as("y")
          )
          .withColumn("cohort", col("user_id") % 2)
        val g = per
          .agg(
            count(lit(1)).as("n"),
            sum("x").as("sx"),
            sum("y").as("sy"),
            sum(expr("x * x")).as("sxx"),
            sum(expr("x * y")).as("sxy"),
            sum(expr("y * y")).as("syy")
          )
        val thExpr =
          """(CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
             / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)"""
        val varredExpr =
          """(CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
             * (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
             / ((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))"""
        per
          .join(
            broadcast(
              g.select(
                col("n"),
                col("sx"),
                expr(thExpr).as("th"),
                expr(varredExpr).as("vr")
              )
            )
          )
          .groupBy("cohort")
          .agg(
            count(lit(1)).as("n_users"),
            first("n").as("n"),
            first("sx").as("sx"),
            first("th").as("th"),
            first("vr").as("vr"),
            sum("x").as("cx"),
            sum("y").as("cy")
          )
          .select(
            col("cohort"),
            col("n_users"),
            expr("CAST(floor(CAST(cy AS DOUBLE) / n_users * 10e0) AS BIGINT)").as("y_mean_milli_c"),
            expr(
              """CAST(floor((CAST(cy AS DOUBLE) / n_users
                   - th * (CAST(cx AS DOUBLE) / n_users - CAST(sx AS DOUBLE) / n))
                   * 10e0) AS BIGINT)"""
            ).as("adj_y_milli_c"),
            expr("CAST(floor(th * 1000000e0) AS BIGINT)").as("theta_micros"),
            expr("CAST(floor(vr * 1000000e0) AS BIGINT)").as("varred_ppm")
          )
          .orderBy("cohort")
      },
      Some("""WITH per AS (
          SELECT user_id, user_id % 2 AS cohort,
                 CAST(sum(CASE WHEN ts < TIMESTAMP '2024-01-15'
                               AND event_type = 'purchase'
                          THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS x,
                 CAST(sum(CASE WHEN ts >= TIMESTAMP '2024-01-15'
                               AND event_type = 'purchase'
                          THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS y
          FROM events GROUP BY 1, 2),
        g AS (
          SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
                 CAST(sum(x * x) AS BIGINT) AS sxx, CAST(sum(x * y) AS BIGINT) AS sxy,
                 CAST(sum(y * y) AS BIGINT) AS syy
          FROM per),
        th AS (
          SELECT n, sx,
                 (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) AS th,
                 (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 * (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 / ((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                    * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)) AS vr
          FROM g)
        SELECT p.cohort, count(*) AS n_users,
               CAST(floor(CAST(sum(p.y) AS DOUBLE) / count(*) * 10e0) AS BIGINT) AS y_mean_milli_c,
               CAST(floor((CAST(sum(p.y) AS DOUBLE) / count(*)
                    - t.th * (CAST(sum(p.x) AS DOUBLE) / count(*)
                              - CAST(t.sx AS DOUBLE) / t.n)) * 10e0) AS BIGINT) AS adj_y_milli_c,
               CAST(floor(t.th * 1000000e0) AS BIGINT) AS theta_micros,
               CAST(floor(t.vr * 1000000e0) AS BIGINT) AS varred_ppm
        FROM per p, th t
        GROUP BY p.cohort, t.th, t.vr, t.sx, t.n
        ORDER BY p.cohort""")
    ),

    // ------------------------------------------------------------------
    // HOLT LINEAR-TREND FORECAST (round 14): q259's EWMA extended with
    // the trend term — level lₜ = (3xₜ + 5(lₜ₋₁+bₜ₋₁)) DIV 8 and trend
    // bₜ = ((lₜ−lₜ₋₁) + 3bₜ₋₁) DIV 4 (α=3/8, β=1/4), the genuinely
    // sequential two-state recursion, expressed as ONE aggregate-HOF
    // fold by PACKING (level, trend) into a single BIGINT: level in
    // the high 32 bits, trend biased by 2³¹ in the low (daily counts
    // and cent sums keep both far inside range). Integer division is
    // the cross-engine landmine here — Spark's DIV truncates while
    // DuckDB's // floors, which differ on NEGATIVES — so every
    // division adds a 2³¹-scaled offset first: the operand is then
    // always positive and floor == truncate. Seeds l₁=x₁, b₁=x₂−x₁;
    // the fold text is generated once with the division operator as
    // the only substitution. Forecast at h=7: l + 7b. Folds run over
    // DAY-scaled arrays per type — the daily rollup exchange
    // dominates at any scale. ORACLE-EXACT.
    QueryDef(
      "q303_holt_forecast",
      (s, dir) => {
        val daily = Tables(s, dir, "events")
          .select(
            col("event_type"),
            to_date(col("ts")).as("d"),
            expr("CAST(round(value * 100) AS BIGINT)").as("cents")
          )
          .groupBy("event_type", "d")
          .agg(count(lit(1)).as("x"), sum("cents").as("vc"))
        def fold(arr: String) =
          s"""aggregate(slice($arr, 3, size($arr) - 2),
                (element_at($arr, 1) + 1073741824) * 4294967296
                  + (element_at($arr, 2) - element_at($arr, 1) + 1073741824),
                (a, e) -> ${holtStep("DIV")})"""
        daily
          .groupBy("event_type")
          .agg(
            count(lit(1)).as("n_days"),
            sort_array(collect_list(struct(col("d"), col("x"), col("vc")))).as("xs")
          )
          .withColumn("xl", expr("transform(xs, e -> e.x)"))
          .withColumn("vl", expr("transform(xs, e -> e.vc)"))
          .withColumn("accx", expr(fold("xl")))
          .withColumn("accv", expr(fold("vl")))
          .select(
            col("event_type"),
            col("n_days"),
            expr("accx DIV 4294967296 - 1073741824").as("level_count"),
            expr("accx % 4294967296 - 1073741824").as("trend_count"),
            expr("accx DIV 4294967296 - 1073741824 + 7 * (accx % 4294967296 - 1073741824)")
              .as("fc7_count"),
            expr("accv DIV 4294967296 - 1073741824").as("level_cents"),
            expr("accv % 4294967296 - 1073741824").as("trend_cents"),
            expr("accv DIV 4294967296 - 1073741824 + 7 * (accv % 4294967296 - 1073741824)")
              .as("fc7_cents")
          )
          .orderBy("event_type")
      },
      Some(s"""WITH daily AS (
          SELECT event_type, CAST(ts AS DATE) AS d, count(*) AS x,
                 CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS vc
          FROM events GROUP BY 1, 2),
        series AS (
          SELECT event_type, count(*) AS n_days,
                 list(x ORDER BY d) AS xl, list(vc ORDER BY d) AS vl
          FROM daily GROUP BY 1),
        folded AS (
          SELECT event_type, n_days,
                 list_reduce(list_prepend((xl[1] + 1073741824) * 4294967296 + (xl[2] - xl[1] + 1073741824), xl[3:]),
                             (a, e) -> ${holtStep("//")}) AS accx,
                 list_reduce(list_prepend((vl[1] + 1073741824) * 4294967296 + (vl[2] - vl[1] + 1073741824), vl[3:]),
                             (a, e) -> ${holtStep("//")}) AS accv
          FROM series)
        SELECT event_type, CAST(n_days AS BIGINT) AS n_days,
               CAST(accx // 4294967296 - 1073741824 AS BIGINT) AS level_count,
               CAST(accx % 4294967296 - 1073741824 AS BIGINT) AS trend_count,
               CAST(accx // 4294967296 - 1073741824 + 7 * (accx % 4294967296 - 1073741824) AS BIGINT) AS fc7_count,
               CAST(accv // 4294967296 - 1073741824 AS BIGINT) AS level_cents,
               CAST(accv % 4294967296 - 1073741824 AS BIGINT) AS trend_cents,
               CAST(accv // 4294967296 - 1073741824 + 7 * (accv % 4294967296 - 1073741824) AS BIGINT) AS fc7_cents
        FROM folded ORDER BY event_type""")
    )
  ) ++ kmDefs

  // lazy: concatenated into `defs`, which initializes first in the
  // object body — a strict val here would still be null at that point
  private lazy val kmDefs: Seq[QueryDef] = Seq(
    // ------------------------------------------------------------------
    // KAPLAN-MEIER SURVIVAL (round 14, Kaplan & Meier 1958): time from
    // first signup to first subsequent purchase, with users who never
    // convert RIGHT-CENSORED at the window end — the canonical
    // incomplete-observation estimator naive conversion rates get
    // wrong. All counting is exact-integer: per-day deaths/censorings
    // from one user rollup, the at-risk set as a SUFFIX-sum window
    // (n_risk(k) = Σ_{j≥k}(d+c) — no scalar subquery), and the
    // survival product Π(1 − dᵢ/nᵢ) folded per event time over the
    // day-ordered factor list (the q259/q295 HOF discipline: both
    // engines run the identical left-to-right double product; seed 1
    // is exact under IEEE). The triangular self-join that gives each
    // event time its prefix factors is DAY-bounded (≤31 rows here;
    // event TIMES, never users — at 100 TB the user table collapses
    // to per-day counts before anything quadratic). ORACLE-EXACT.
    QueryDef(
      "q304_kaplan_meier",
      (s, dir) => {
        val ev = Tables(s, dir, "events").select("user_id", "event_type", "ts")
        val s0 = ev
          .filter(col("event_type") === "signup")
          .groupBy("user_id")
          .agg(min("ts").as("t0"))
        val p = ev
          .filter(col("event_type") === "purchase")
          .join(s0, Seq("user_id"))
          .filter(col("ts") > col("t0"))
          .groupBy("user_id")
          .agg(min("ts").as("tp"))
        val dur = s0
          .join(p, Seq("user_id"), "left")
          .select(
            when(
              col("tp").isNull,
              expr("(unix_micros(TIMESTAMP '2024-01-31') - unix_micros(t0)) DIV 86400000000")
            ).otherwise(expr("(unix_micros(tp) - unix_micros(t0)) DIV 86400000000")).as("k"),
            when(col("tp").isNull, 0L).otherwise(1L).as("ev")
          )
        val byday = dur
          .groupBy("k")
          .agg(sum("ev").as("d"), sum(expr("1 - ev")).as("c"))
        val wSuffix = Window
          .orderBy("k")
          .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        val et = byday
          .withColumn("n_risk", sum(expr("d + c")).over(wSuffix))
          .filter(col("d") > 0)
          .select(
            col("k"),
            col("d"),
            col("n_risk"),
            expr("1e0 - CAST(d AS DOUBLE) / n_risk").as("f")
          )
        val a = et.select(col("k"), col("d"), col("n_risk"))
        val b = et.select(col("k").as("j"), col("f"))
        a.join(b, col("j") <= col("k"))
          .groupBy("k", "d", "n_risk")
          .agg(sort_array(collect_list(struct(col("j"), col("f")))).as("fs"))
          .select(
            col("k").as("day"),
            col("d"),
            col("n_risk"),
            expr(
              "CAST(floor(aggregate(fs, CAST(1 AS DOUBLE), (x, y) -> x * y.f) * 1000000e0) AS BIGINT)"
            ).as("survival_ppm")
          )
          .orderBy("day")
      },
      Some("""WITH s AS (
          SELECT user_id, min(ts) AS t0 FROM events
          WHERE event_type = 'signup' GROUP BY 1),
        p AS (
          SELECT e.user_id, min(e.ts) AS tp
          FROM events e JOIN s ON s.user_id = e.user_id
          WHERE e.event_type = 'purchase' AND e.ts > s.t0 GROUP BY 1),
        dur AS (
          SELECT CASE WHEN p.tp IS NULL
                   THEN CAST(epoch_us(TIMESTAMP '2024-01-31') - epoch_us(s.t0) AS BIGINT) // 86400000000
                   ELSE CAST(epoch_us(p.tp) - epoch_us(s.t0) AS BIGINT) // 86400000000 END AS k,
                 CASE WHEN p.tp IS NULL THEN 0 ELSE 1 END AS ev
          FROM s LEFT JOIN p ON p.user_id = s.user_id),
        byday AS (
          SELECT k, CAST(sum(ev) AS BIGINT) AS d, CAST(sum(1 - ev) AS BIGINT) AS c
          FROM dur GROUP BY 1),
        et AS (
          SELECT k, d, n_risk, 1e0 - CAST(d AS DOUBLE) / n_risk AS f FROM (
            SELECT k, d, c,
                   CAST(sum(d + c) OVER (ORDER BY k
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT) AS n_risk
            FROM byday)
          WHERE d > 0),
        tri AS (
          SELECT a.k, a.d, a.n_risk, list(b.f ORDER BY b.k) AS fs
          FROM et a JOIN et b ON b.k <= a.k
          GROUP BY a.k, a.d, a.n_risk)
        SELECT k AS day, d, n_risk,
               CAST(floor(list_reduce(list_prepend(CAST(1 AS DOUBLE), fs), (x, y) -> x * y)
                    * 1000000e0) AS BIGINT) AS survival_ppm
        FROM tri ORDER BY day""")
    ),

    // ------------------------------------------------------------------
    // SEASONAL DECOMPOSITION (round 14): the classical-decomposition
    // prep every forecast needs before q259/q303 smooth anything —
    // day-of-week seasonal indexes (exact ppm: the dow's share of the
    // overall daily mean, pure integer cross-ratio), trend as the
    // 7-day centered moving average (milli-units, integer DIV), and
    // per-dow residual mass off the trend. Engine landmine: Spark's
    // dayofweek is 1-7 Sunday-first, DuckDB's 0-6 — the Spark side
    // subtracts 1 rather than both sides guessing. Everything is
    // integer arithmetic over the DAY-scaled rollup: at 100 TB the
    // daily aggregate's exchange dominates and the windows run over
    // ~30 rows. ORACLE-EXACT.
    QueryDef(
      "q307_seasonal_decompose",
      (s, dir) => {
        val daily = Tables(s, dir, "events")
          .select(to_date(col("ts")).as("d"))
          .groupBy("d")
          .agg(count(lit(1)).as("x"))
        val tot = daily.agg(count(lit(1)).as("nd"), sum("x").as("sx"))
        val w7 = Window.orderBy("d").rowsBetween(-3, 3)
        val resid = daily
          .withColumn("s7", sum("x").over(w7))
          .withColumn("n7", count(lit(1)).over(w7))
          .filter(col("n7") === 7)
          .select(
            expr("CAST(dayofweek(d) - 1 AS BIGINT)").as("w"),
            expr("abs(x * 1000 - (s7 * 1000) DIV 7)").as("ar")
          )
          .groupBy("w")
          .agg(sum("ar").as("resid_abs_milli"), count(lit(1)).as("n_resid"))
        daily
          .groupBy(expr("CAST(dayofweek(d) - 1 AS BIGINT)").as("w"))
          .agg(count(lit(1)).as("n_days"), sum("x").as("sxw"))
          .join(broadcast(tot))
          .select(
            col("w"),
            col("n_days"),
            expr("(sxw * nd * 1000000) DIV (n_days * sx)").as("seasonal_ppm"),
            col("sxw")
          )
          .join(resid, Seq("w"), "left")
          .select(
            col("w"),
            col("n_days"),
            col("seasonal_ppm"),
            col("sxw"),
            coalesce(col("resid_abs_milli"), lit(0L)).as("resid_abs_milli"),
            coalesce(col("n_resid"), lit(0L)).as("n_resid")
          )
          .orderBy("w")
      },
      Some("""WITH daily AS (
          SELECT CAST(ts AS DATE) AS d, count(*) AS x FROM events GROUP BY 1),
        tot AS (SELECT CAST(count(*) AS BIGINT) AS nd, CAST(sum(x) AS BIGINT) AS sx
                FROM daily),
        resid AS (
          SELECT dayofweek(d) AS w,
                 CAST(sum(abs(x * 1000 - (s7 * 1000) // 7)) AS BIGINT) AS resid_abs_milli,
                 CAST(count(*) AS BIGINT) AS n_resid
          FROM (
            SELECT d, x,
                   CAST(sum(x) OVER (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS BIGINT) AS s7,
                   count(*) OVER (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS n7
            FROM daily)
          WHERE n7 = 7 GROUP BY 1),
        seas AS (
          SELECT dayofweek(d) AS w, CAST(count(*) AS BIGINT) AS n_days,
                 CAST(sum(x) AS BIGINT) AS sxw
          FROM daily GROUP BY 1),
        sel AS (
          SELECT s.w, s.n_days,
                 CAST((s.sxw * t.nd * 1000000) // (s.n_days * t.sx) AS BIGINT) AS seasonal_ppm,
                 s.sxw
          FROM seas s, tot t)
        SELECT sel.w, sel.n_days, sel.seasonal_ppm, sel.sxw,
               CAST(coalesce(r.resid_abs_milli, 0) AS BIGINT) AS resid_abs_milli,
               CAST(coalesce(r.n_resid, 0) AS BIGINT) AS n_resid
        FROM sel LEFT JOIN resid r ON r.w = sel.w
        ORDER BY sel.w""")
    ),

    // ------------------------------------------------------------------
    // JACKKNIFE SE FOR A RATIO METRIC (round 14): revenue-per-active-
    // user is a RATIO of sums — its naive per-unit variance is wrong
    // (the denominator varies too), and the delete-one jackknife over
    // DAYS is the standard fix (Efron 1982; the experimentation-
    // platform workhorse for ratio metrics). Leave-one-out ratios come
    // from global sums minus each day's sums — one day rollup + one
    // global aggregate, NO resampling loop; the pseudo-value variance
    // folds over the day-ordered list (the HOF float discipline), and
    // the 95% CI reuses q288's critical value. Day-scaled after the
    // rollup. ORACLE-EXACT.
    QueryDef(
      "q308_jackknife_ratio_se",
      (s, dir) => {
        val daily = Tables(s, dir, "events")
          .select(
            to_date(col("ts")).as("d"),
            col("user_id"),
            col("event_type"),
            col("value")
          )
          .groupBy("d")
          .agg(
            sum(
              when(
                col("event_type") === "purchase",
                expr("CAST(round(value * 100) AS BIGINT)")
              ).otherwise(0L)
            ).as("num"),
            countDistinct("user_id").as("den")
          )
        val g = daily.agg(count(lit(1)).as("n"), sum("num").as("snum"), sum("den").as("sden"))
        daily
          .join(broadcast(g))
          .select(
            col("d"),
            col("n"),
            expr("CAST(snum AS DOUBLE) / sden").as("r_all"),
            expr("CAST(snum - num AS DOUBLE) / (sden - den)").as("r_i")
          )
          .groupBy("n", "r_all")
          .agg(sort_array(collect_list(struct(col("d"), col("r_i")))).as("rs"))
          .withColumn(
            "rbar",
            expr("aggregate(rs, CAST(0 AS DOUBLE), (a, e) -> a + e.r_i) / n")
          )
          .withColumn(
            "se",
            expr("""sqrt((CAST(n AS DOUBLE) - 1e0) / n
                    * aggregate(rs, CAST(0 AS DOUBLE),
                                (a, e) -> a + (e.r_i - rbar) * (e.r_i - rbar)))""")
          )
          .select(
            col("n").as("n_days"),
            expr("CAST(floor(r_all * 1000000e0) AS BIGINT)").as("ratio_micros"),
            expr("CAST(floor(se * 1000000e0) AS BIGINT)").as("jk_se_micros"),
            expr("CAST(floor((r_all - 1959964e-6 * se) * 1000000e0) AS BIGINT)").as("ci_lo_micros"),
            expr("CAST(floor((r_all + 1959964e-6 * se) * 1000000e0) AS BIGINT)").as("ci_hi_micros")
          )
      },
      Some("""WITH daily AS (
          SELECT CAST(ts AS DATE) AS d,
                 CAST(sum(CASE WHEN event_type = 'purchase'
                          THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS num,
                 CAST(count(DISTINCT user_id) AS BIGINT) AS den
          FROM events GROUP BY 1),
        g AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(num) AS BIGINT) AS snum,
                     CAST(sum(den) AS BIGINT) AS sden FROM daily),
        loo AS (
          SELECT d, n, CAST(snum AS DOUBLE) / sden AS r_all,
                 CAST(snum - num AS DOUBLE) / (sden - den) AS r_i
          FROM daily, g),
        jk AS (SELECT n, r_all, list(r_i ORDER BY d) AS rs FROM loo GROUP BY 1, 2),
        m AS (SELECT n, r_all, rs,
                     list_reduce(list_prepend(CAST(0 AS DOUBLE), rs), (a, e) -> a + e) / n AS rbar
              FROM jk),
        se AS (SELECT n, r_all,
                      sqrt((CAST(n AS DOUBLE) - 1e0) / n
                        * list_reduce(list_prepend(CAST(0 AS DOUBLE),
                            list_transform(rs, e -> (e - rbar) * (e - rbar))), (a, e) -> a + e)) AS se
               FROM m)
        SELECT n AS n_days,
               CAST(floor(r_all * 1000000e0) AS BIGINT) AS ratio_micros,
               CAST(floor(se * 1000000e0) AS BIGINT) AS jk_se_micros,
               CAST(floor((r_all - 1959964e-6 * se) * 1000000e0) AS BIGINT) AS ci_lo_micros,
               CAST(floor((r_all + 1959964e-6 * se) * 1000000e0) AS BIGINT) AS ci_hi_micros
        FROM se""")
    ),

    // ------------------------------------------------------------------
    // GINI / LORENZ CONCENTRATION (round 14): how concentrated is
    // revenue across users — the Gini coefficient via the rank
    // identity G = 2Σᵢ i·xᵢ / (nΣx) − (n+1)/n over ascending-sorted
    // spend (exact ppm, pure integer arithmetic: i·x products stay
    // far under 2⁶³), plus the top-10% and top-1% Lorenz shares. The
    // deterministic tiebreak (x, user_id) pins equal-spend ranks.
    // Plan (round 15): one user rollup, then ONE exact distributed
    // global rank over the rollup ([[graft.operators.DistributedRank
    // .rowNumber]] — range partition + broadcast prefix offsets; the
    // partition-less rank/count/sum windows this query shipped with
    // are gone, so no user-scaled side ever crosses a single sort
    // task). Σi·x grows QUADRATICALLY with user count, so the scaled
    // products ride DECIMAL(38,0) on the Spark side and HUGEINT in
    // the oracle (the q301 moments discipline — plain BIGINT aborts
    // one scale step above the gated fixtures). ORACLE-EXACT.
    QueryDef(
      "q311_gini_concentration",
      (s, dir) => {
        val per = Tables(s, dir, "events")
          .groupBy("user_id")
          .agg(
            sum(
              when(
                col("event_type") === "purchase",
                expr("CAST(round(value * 100) AS BIGINT)")
              ).otherwise(0L)
            ).as("x")
          )
        val ranked = DistributedRank.rowNumber(per, Seq(col("x"), col("user_id")), "i")
        val n = ranked.total
        ranked.df
          .agg(
            sum("x").as("sx"),
            sum(expr("CAST(i AS DECIMAL(38,0)) * x")).as("six"),
            sum(when(expr(s"i > ${n}L - (${n}L DIV 10)"), col("x")).otherwise(0L)).as("top10"),
            sum(when(expr(s"i > ${n}L - (${n}L DIV 100)"), col("x")).otherwise(0L)).as("top1")
          )
          .select(
            lit(n).as("n"),
            col("sx"),
            expr(
              s"""CAST((2 * six * 1000000) DIV (CAST(${n}L AS DECIMAL(38,0)) * sx)
                  - ((${n}L + 1) * 1000000) DIV ${n}L AS BIGINT)"""
            ).as("gini_ppm"),
            expr("CAST((CAST(top10 AS DECIMAL(38,0)) * 1000000) DIV sx AS BIGINT)")
              .as("top10_share_ppm"),
            expr("CAST((CAST(top1 AS DECIMAL(38,0)) * 1000000) DIV sx AS BIGINT)")
              .as("top1_share_ppm")
          )
      },
      Some("""WITH per AS (
          SELECT user_id,
                 CAST(sum(CASE WHEN event_type = 'purchase'
                          THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS x
          FROM events GROUP BY 1),
        r AS (
          SELECT x, CAST(row_number() OVER (ORDER BY x, user_id) AS BIGINT) AS i,
                 CAST(count(*) OVER () AS BIGINT) AS n,
                 CAST(sum(x) OVER () AS BIGINT) AS sx
          FROM per),
        g AS (
          SELECT n, sx, sum(CAST(i AS HUGEINT) * x) AS six,
                 CAST(sum(CASE WHEN i > n - (n // 10) THEN x ELSE 0 END) AS BIGINT) AS top10,
                 CAST(sum(CASE WHEN i > n - (n // 100) THEN x ELSE 0 END) AS BIGINT) AS top1
          FROM r GROUP BY n, sx)
        SELECT n, sx,
               CAST((2 * six * 1000000) // (CAST(n AS HUGEINT) * sx)
                    - ((n + 1) * 1000000) // n AS BIGINT) AS gini_ppm,
               CAST((CAST(top10 AS HUGEINT) * 1000000) // sx AS BIGINT) AS top10_share_ppm,
               CAST((CAST(top1 AS HUGEINT) * 1000000) // sx AS BIGINT) AS top1_share_ppm
        FROM g""")
    ),

    // ------------------------------------------------------------------
    // EXACT GLOBAL QUANTILES (round 15): the first query any analyst
    // ports — exact (not approximate) percentiles of per-user spend
    // by the NEAREST-RANK definition: value at rank ⌈p·n/100⌉, ranks
    // from [[graft.operators.DistributedRank]] (range partition +
    // broadcast prefix offsets — no partition-less window, no
    // approx_percentile sketch). All integer arithmetic: cents, ranks
    // ⌈p·n/100⌉ = (p·n + 99) DIV 100 spelled identically in both
    // engines, deterministic (x, user_id) tiebreaks. The rank-target
    // probe is a 7-row broadcast join pushed into the ranked frame.
    // ORACLE-EXACT.
    QueryDef(
      "q316_exact_quantiles",
      (s, dir) => exactQuantiles(
        Tables(s, dir, "events")
          .groupBy("user_id")
          .agg(purchaseCents.as("x"))
      ),
      Some(exactQuantilesOracleSql)
    ),

    // ------------------------------------------------------------------
    // ROBUST STATISTICS (round 15): the outlier-resistant summary a
    // spend distribution actually needs — exact median, quartiles,
    // IQR, MAD (median absolute deviation), and outlier censuses by
    // BOTH fences (Tukey 1.5·IQR and 3·MAD). Two composed
    // [[DistributedRank]] passes: rank spend → median/quartiles by
    // nearest-rank probe; rank |x − median| → MAD. Everything is
    // integer cents — the fences (3·(q3−q1)) DIV 2 and 3·MAD are
    // exact in both engines — and every rank target is the shared
    // ⌈p·n/100⌉ arithmetic. The three pass-1 values come back as ONE
    // 3-row collect (scalar metadata, the q285 maxUs discipline).
    // ORACLE-EXACT.
    QueryDef(
      "q319_robust_stats",
      (s, dir) => {
        val per = Tables(s, dir, "events")
          .groupBy("user_id")
          .agg(purchaseCents.as("x"))
        val r1 = DistributedRank.rowNumber(per, Seq(col("x"), col("user_id")), "i")
        val n = r1.total
        def target(p: Long) = (p * n + 99L) / 100L
        val wants = Seq(25L, 50L, 75L).map(target)
        val vals = r1.df
          .filter(col("i").isin(wants: _*))
          .select("i", "x")
          .collect() // ≤3 rows — rank-probe scalars
          .map(r => r.getLong(0) -> r.getLong(1))
          .toMap
        val (q1c, medC, q3c) = (vals(target(25)), vals(target(50)), vals(target(75)))
        val dev = r1.df.select(
          col("user_id"),
          col("x"),
          abs(col("x") - lit(medC)).as("d")
        )
        val r2 = DistributedRank.rowNumber(dev, Seq(col("d"), col("user_id")), "j")
        val madC = r2.df
          .filter(col("j") === target(50))
          .select("d")
          .head()
          .getLong(0)
        val iqr = q3c - q1c
        val tukeyHi = q3c + (3L * iqr) / 2L
        val tukeyLo = q1c - (3L * iqr) / 2L
        r2.df
          .agg(
            count(lit(1)).as("n"),
            sum(when(col("x") < tukeyLo || col("x") > tukeyHi, 1L).otherwise(0L))
              .as("n_outliers_tukey"),
            sum(when(col("d") > 3L * madC, 1L).otherwise(0L)).as("n_outliers_mad")
          )
          .select(
            col("n"),
            lit(medC).as("median_c"),
            lit(q1c).as("q1_c"),
            lit(q3c).as("q3_c"),
            lit(iqr).as("iqr_c"),
            lit(madC).as("mad_c"),
            col("n_outliers_tukey"),
            col("n_outliers_mad")
          )
      },
      Some("""WITH per AS (
          SELECT user_id,
                 CAST(sum(CASE WHEN event_type = 'purchase'
                          THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS x
          FROM events GROUP BY 1),
        r1 AS (
          SELECT user_id, x, CAST(row_number() OVER (ORDER BY x, user_id) AS BIGINT) AS i
          FROM per),
        cnt AS (SELECT CAST(count(*) AS BIGINT) AS n FROM per),
        qs AS (
          SELECT
            (SELECT x FROM r1, cnt WHERE i = (25 * n + 99) // 100) AS q1_c,
            (SELECT x FROM r1, cnt WHERE i = (50 * n + 99) // 100) AS median_c,
            (SELECT x FROM r1, cnt WHERE i = (75 * n + 99) // 100) AS q3_c),
        dev AS (
          SELECT user_id, x, abs(x - (SELECT median_c FROM qs)) AS d FROM per),
        r2 AS (
          SELECT x, d, CAST(row_number() OVER (ORDER BY d, user_id) AS BIGINT) AS j
          FROM dev),
        mad AS (SELECT d AS mad_c FROM r2, cnt WHERE j = (50 * n + 99) // 100),
        fence AS (
          SELECT q1_c, median_c, q3_c, q3_c - q1_c AS iqr_c, mad_c,
                 q3_c + (3 * (q3_c - q1_c)) // 2 AS hi,
                 q1_c - (3 * (q3_c - q1_c)) // 2 AS lo
          FROM qs, mad)
        SELECT n,
               CAST(median_c AS BIGINT) AS median_c,
               CAST(q1_c AS BIGINT) AS q1_c,
               CAST(q3_c AS BIGINT) AS q3_c,
               CAST(iqr_c AS BIGINT) AS iqr_c,
               CAST(mad_c AS BIGINT) AS mad_c,
               CAST((SELECT count(*) FROM r2, fence WHERE x < lo OR x > hi) AS BIGINT)
                 AS n_outliers_tukey,
               CAST((SELECT count(*) FROM r2, fence WHERE d > 3 * mad_c) AS BIGINT)
                 AS n_outliers_mad
        FROM cnt, fence""")
    ),

    // ------------------------------------------------------------------
    // TRIMMED + WINSORIZED MEANS (round 15): q319's companion — the
    // robust location estimates that keep the mean usable under heavy
    // tails: cut ⌊5%·n⌋ ranks from EACH side (trimmed), or clamp
    // beyond the cut values (winsorized). One distributed-rank pass;
    // the two boundary values come back as one 2-row rank probe; the
    // means stay exact integers (sum DIV count in cents — identical
    // truncation in both engines). ORACLE-EXACT.
    QueryDef(
      "q320_trimmed_means",
      (s, dir) => {
        val per = Tables(s, dir, "events")
          .groupBy("user_id")
          .agg(purchaseCents.as("x"))
        val r1 = DistributedRank.rowNumber(per, Seq(col("x"), col("user_id")), "i")
        val n = r1.total
        val k = n / 20L // floor(0.05 * n)
        val bounds = r1.df
          .filter(col("i").isin(k + 1L, n - k))
          .select("i", "x")
          .collect() // 2 rows — rank-probe scalars
          .map(r => r.getLong(0) -> r.getLong(1))
          .toMap
        val (vLo, vHi) = (bounds(k + 1L), bounds(n - k))
        r1.df
          .agg(
            count(lit(1)).as("n"),
            sum("x").as("sum_all_c"),
            sum(when(col("i") > k && col("i") <= n - k, col("x")).otherwise(0L))
              .as("sum_trim_c"),
            sum(
              when(col("x") < vLo, lit(vLo))
                .when(col("x") > vHi, lit(vHi))
                .otherwise(col("x"))
            ).as("sum_wins_c")
          )
          .select(
            col("n"),
            lit(k).as("k_cut"),
            expr("sum_all_c DIV n").as("mean_c"),
            expr(s"sum_trim_c DIV (n - ${2L * k}L)").as("trimmed_mean_c"),
            expr("sum_wins_c DIV n").as("winsorized_mean_c"),
            lit(vLo).as("lo_clamp_c"),
            lit(vHi).as("hi_clamp_c")
          )
      },
      Some("""WITH per AS (
          SELECT user_id,
                 CAST(sum(CASE WHEN event_type = 'purchase'
                          THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS x
          FROM events GROUP BY 1),
        r1 AS (
          SELECT x, CAST(row_number() OVER (ORDER BY x, user_id) AS BIGINT) AS i
          FROM per),
        cnt AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(count(*) // 20 AS BIGINT) AS k
                FROM per),
        b AS (
          SELECT (SELECT x FROM r1, cnt WHERE i = k + 1) AS v_lo,
                 (SELECT x FROM r1, cnt WHERE i = n - k) AS v_hi)
        SELECT n, k AS k_cut,
               CAST(sum(x) // n AS BIGINT) AS mean_c,
               CAST(sum(CASE WHEN i > k AND i <= n - k THEN x ELSE 0 END)
                    // (n - 2 * k) AS BIGINT) AS trimmed_mean_c,
               CAST(sum(CASE WHEN x < v_lo THEN v_lo
                             WHEN x > v_hi THEN v_hi ELSE x END) // n AS BIGINT)
                 AS winsorized_mean_c,
               CAST(v_lo AS BIGINT) AS lo_clamp_c,
               CAST(v_hi AS BIGINT) AS hi_clamp_c
        FROM r1, cnt, b
        GROUP BY n, k, v_lo, v_hi""")
    ),

    // ------------------------------------------------------------------
    // A/B POWER ANALYSIS (round 14): the question asked BEFORE q288's
    // test — how many users per arm to detect a 20% relative lift in
    // the conversion rate at 80% power, 5% two-sided? The closed form
    // n = 2(z_{α/2}+z_β)² p(1−p)/δ² over the observed baseline rate,
    // with both critical values pinned as micros literals (1.959964,
    // 0.841621) and the whole derivation one textually identical
    // double sequence over exact integer counts. One user rollup + a
    // 2-sum aggregate — nothing else. ORACLE-EXACT.
    QueryDef(
      "q312_power_analysis",
      (s, dir) => {
        Tables(s, dir, "events")
          .groupBy("user_id")
          .agg(
            max(
              when(col("event_type") === "purchase" && col("value") > 100, 1L).otherwise(0L)
            ).as("conv")
          )
          .agg(count(lit(1)).as("n"), sum("conv").as("c"))
          .withColumn("p0", expr("CAST(c AS DOUBLE) / n"))
          .select(
            col("n"),
            col("c"),
            expr("CAST(floor(p0 * 1000000e0) AS BIGINT)").as("p0_ppm"),
            expr("""CAST(ceil(2e0 * (1959964e-6 + 841621e-6) * (1959964e-6 + 841621e-6)
                    * p0 * (1e0 - p0) / ((2e-1 * p0) * (2e-1 * p0))) AS BIGINT)""").as("n_per_arm")
          )
      },
      Some("""WITH u AS (
          SELECT user_id, max(CASE WHEN event_type = 'purchase' AND value > 100
                              THEN 1 ELSE 0 END) AS conv
          FROM events GROUP BY 1),
        g AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(conv) AS BIGINT) AS c FROM u),
        p AS (SELECT n, c, CAST(c AS DOUBLE) / n AS p0 FROM g)
        SELECT n, c, CAST(floor(p0 * 1000000e0) AS BIGINT) AS p0_ppm,
               CAST(ceil(2e0 * (1959964e-6 + 841621e-6) * (1959964e-6 + 841621e-6)
                    * p0 * (1e0 - p0) / ((2e-1 * p0) * (2e-1 * p0))) AS BIGINT) AS n_per_arm
        FROM p""")
    )
  )

  /** The Holt fold step, generated once for both engines — `div` is
    * the ONLY difference (Spark `DIV` truncates, DuckDB `//` floors;
    * the offsets keep every operand positive, where the two semantics
    * coincide). State: (level + 2³⁰)·2³² + (trend + 2³⁰) — BOTH fields
    * biased, because a level that transiently dips negative (tiny
    * count series) would otherwise flip the packed word negative and
    * corrupt the unpack (found at sf0.001 by the three-scale gate).
    * Domain: |level|, |trend| < 2³⁰ — daily series under ~$10M/day. */
  /** Per-user purchase spend in exact cents (0 for users with events
    * but no purchases) — the rollup q316 and its live twin rank. */
  private[graft] def purchaseCents: Column =
    sum(
      when(
        col("event_type") === "purchase",
        expr("CAST(round(value * 100) AS BIGINT)")
      ).otherwise(0L)
    )

  /** q316's body, shared with the streaming twin (q318): exact
    * nearest-rank percentiles of the (user_id, x) rollup via
    * [[DistributedRank]] — rank targets ⌈p·n/100⌉ as a 7-row
    * broadcast probe into the ranked frame. */
  private[graft] def exactQuantiles(per: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val ranked = DistributedRank.rowNumber(per, Seq(col("x"), col("user_id")), "i")
    val n = ranked.total
    val sess = per.sparkSession
    import sess.implicits._
    val targets = Seq(1L, 25L, 50L, 75L, 90L, 99L, 100L)
      .map(p => (p, (p * n + 99L) / 100L))
      .toDF("pct", "i")
    ranked.df
      .join(broadcast(targets), Seq("i"))
      .select(col("pct"), col("i").as("rank"), col("x").as("value_cents"))
      .orderBy("pct")
  }

  /** Shared by q316 and its live twin q318 — the drained stream must
    * hash-match the same SQL. (lazy: referenced from `defs`, which
    * initializes FIRST in declaration order — a plain val here is
    * still null when q316's QueryDef captures it, and the oracle map
    * then NPEs at dump time; the holtStep helper documents the same
    * trap.) */
  private[graft] lazy val exactQuantilesOracleSql: String = """WITH per AS (
          SELECT user_id,
                 CAST(sum(CASE WHEN event_type = 'purchase'
                          THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS x
          FROM events GROUP BY 1),
        r AS (
          SELECT x, CAST(row_number() OVER (ORDER BY x, user_id) AS BIGINT) AS i
          FROM per),
        cnt AS (SELECT CAST(count(*) AS BIGINT) AS n FROM per),
        t AS (SELECT CAST(pct AS BIGINT) AS pct,
                     CAST((pct * n + 99) // 100 AS BIGINT) AS rk
              FROM (SELECT unnest([1, 25, 50, 75, 90, 99, 100]) AS pct), cnt)
        SELECT pct, rk AS rank, x AS value_cents
        FROM t JOIN r ON r.i = t.rk
        ORDER BY pct"""

  private def holtStep(div: String): String =
    s"""((((3 * e + 5 * ((a $div 4294967296 - 1073741824) + (a % 4294967296 - 1073741824))
           + 34359738368) $div 8 - 4294967296) + 1073741824) * 4294967296
        + ((((3 * e + 5 * ((a $div 4294967296 - 1073741824) + (a % 4294967296 - 1073741824))
              + 34359738368) $div 8 - 4294967296)
            - (a $div 4294967296 - 1073741824)
            + 3 * (a % 4294967296 - 1073741824)
            + 17179869184) $div 4 - 3221225472))"""

  /** Shared by q177 and its live twin q179 — the drained stream must
    * hash-match the same SQL. (lazy: referenced from `defs`, which
    * initializes before this point in the object body) */
  private[queries] lazy val funnelOracleSql: String =
    """WITH t1 AS (
          SELECT user_id, min(ts) AS t1 FROM events
          WHERE event_type = 'view' GROUP BY 1),
        t2 AS (
          SELECT e.user_id, min(e.ts) AS t2
          FROM events e JOIN t1 ON t1.user_id = e.user_id
          WHERE e.event_type = 'click' AND e.ts > t1.t1 GROUP BY 1),
        t3 AS (
          SELECT e.user_id, min(e.ts) AS t3
          FROM events e JOIN t2 ON t2.user_id = e.user_id
          WHERE e.event_type = 'purchase' AND e.ts > t2.t2 GROUP BY 1),
        n AS (SELECT (SELECT count(*) FROM t1) AS n1,
                     (SELECT count(*) FROM t2) AS n2,
                     (SELECT count(*) FROM t3) AS n3)
        SELECT step, n_users, ppm_of_step1 FROM (
          SELECT '1_view' AS step, CAST(n1 AS BIGINT) AS n_users,
                 CAST(1000000 AS BIGINT) AS ppm_of_step1 FROM n
          UNION ALL
          SELECT '2_click', CAST(n2 AS BIGINT),
                 CASE WHEN n1 = 0 THEN 0 ELSE (n2 * 1000000) // n1 END FROM n
          UNION ALL
          SELECT '3_purchase', CAST(n3 AS BIGINT),
                 CASE WHEN n1 = 0 THEN 0 ELSE (n3 * 1000000) // n1 END FROM n)
        ORDER BY step"""

  /** q177's funnel core, shared with FunnelSpec's fixtures: users at
    * each step under strictly-after first-touch semantics. */
  private[graft] def funnelCounts(ev: org.apache.spark.sql.DataFrame): (Long, Long, Long) = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id")
    val withT1 = ev.withColumn(
      "t1",
      min(when(col("event_type") === "view", col("ts"))).over(w)
    )
    val t2 = withT1
      .filter(col("event_type") === "click" && col("ts") > col("t1"))
      .groupBy("user_id")
      .agg(min("ts").as("t2"))
    val t3 = withT1
      .join(t2, Seq("user_id"))
      .filter(col("event_type") === "purchase" && col("ts") > col("t2"))
      .groupBy("user_id")
      .agg(min("ts").as("t3"))
    val n1 = withT1.filter(col("t1").isNotNull).select("user_id").distinct().count()
    (n1, t2.count(), t3.count())
  }

  /** q257's cohort matrix over any (user_id, ts) frame — shared with
    * the live q274 gate (cohort membership is whole-history: a later
    * batch can move a user's first-activity day EARLIER, retroactively
    * re-attributing every prior cell, so the stream twin stages and
    * recomputes). */
  private[graft] def cohortReport(ev0: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val ev = ev0.select(col("user_id"), to_date(col("ts")).as("d"))
    val first = ev.groupBy("user_id").agg(min("d").as("cohort"))
    ev.join(first, Seq("user_id"))
      .select(
        date_format(col("cohort"), "yyyy-MM-dd").as("cohort"),
        datediff(col("d"), col("cohort")).cast("long").as("day_offset"),
        col("user_id")
      )
      .groupBy("cohort", "day_offset")
      .agg(countDistinct("user_id").as("n_users"))
      .orderBy("cohort", "day_offset")
  }

  /** Shared by q257 and its live twin q274. */
  private[queries] lazy val cohortOracleSql: String =
    """WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS d FROM events),
        first AS (SELECT user_id, min(d) AS cohort FROM ev GROUP BY 1)
        SELECT strftime(cohort, '%Y-%m-%d') AS cohort,
               CAST(date_diff('day', cohort, d) AS BIGINT) AS day_offset,
               CAST(count(DISTINCT ev.user_id) AS BIGINT) AS n_users
        FROM ev JOIN first USING (user_id)
        GROUP BY 1, 2 ORDER BY 1, 2"""

  /** q258's detector over any (event_type, ts) frame — shared with the
    * live q268 gate (CUSUM is a whole-history statistic: the target,
    * the prefix minima, and the alarm all depend on every day seen, so
    * the stream twin stages and recomputes rather than incrementing
    * per batch). */
  private[graft] def cusumReport(ev: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = ev
      .select(col("event_type"), to_date(col("ts")).as("d"))
      .groupBy("event_type", "d")
      .agg(count(lit(1)).as("x"))
    val params = daily
      .groupBy("event_type")
      .agg(expr("sum(x) DIV count(1)").as("target"), count(lit(1)).as("n_days"))
      .withColumn("slack", expr("target DIV 10"))
      .withColumn("h", expr("2 * target"))
    val w = Window.partitionBy("event_type").orderBy("d")
    val cusum = daily
      .join(broadcast(params), Seq("event_type"))
      .withColumn("p", sum(col("x") - col("target") - col("slack")).over(w))
      .withColumn("s", col("p") - least(lit(0L), min("p").over(w)))
    cusum
      .groupBy("event_type")
      .agg(
        max("n_days").as("n_days"),
        max("target").as("target"),
        max("s").as("max_s"),
        min(when(col("s") > col("h"), date_format(col("d"), "yyyy-MM-dd"))).as("first_alarm"),
        sum(when(col("s") > col("h"), 1L).otherwise(0L)).as("n_alarm_days")
      )
      .orderBy("event_type")
  }

  /** Shared by q258 and its live twin q268 — the drained stream must
    * hash-match the same SQL. */
  private[queries] lazy val cusumOracleSql: String = """WITH daily AS (
          SELECT event_type, CAST(ts AS DATE) AS d, count(*) AS x
          FROM events GROUP BY 1, 2),
        params AS (
          SELECT event_type, CAST(sum(x) // count(*) AS BIGINT) AS target,
                 count(*) AS n_days
          FROM daily GROUP BY 1),
        cusum AS (
          SELECT daily.event_type, d, n_days, target,
                 target // 10 AS slack, 2 * target AS h,
                 CAST(sum(x - target - (target // 10))
                   OVER (PARTITION BY daily.event_type ORDER BY d) AS BIGINT) AS p
          FROM daily JOIN params USING (event_type)),
        s AS (
          SELECT *, p - least(0, min(p) OVER
                   (PARTITION BY event_type ORDER BY d)) AS s
          FROM cusum)
        SELECT event_type, CAST(max(n_days) AS BIGINT) AS n_days,
               CAST(max(target) AS BIGINT) AS target, CAST(max(s) AS BIGINT) AS max_s,
               min(CASE WHEN s > h THEN strftime(d, '%Y-%m-%d') END) AS first_alarm,
               CAST(sum(CASE WHEN s > h THEN 1 ELSE 0 END) AS BIGINT) AS n_alarm_days
        FROM s GROUP BY event_type ORDER BY event_type"""
}
