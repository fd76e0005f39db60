package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

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
            round(col("o_totalprice") * 100, 0).cast("long").as("cents")
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
    )
  )
}
