package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Relational operator surface (SURVEY.md §2.3, rows E2–E11) over the
  * driver testdata, each paired with a DuckDB oracle.
  *
  * Oracle-stability rules used throughout (SURVEY.md §5 risk register):
  *
  *  - Money-like doubles in the testdata are fixed-point by construction
  *    (prices/balances 2-decimal, event values 3-decimal — verified
  *    against the parquet). Aggregates sum them as scaled integers
  *    (`round(x*100) :: BIGINT`) so the result is exact and
  *    order-independent; a plain float `sum()` differs between Spark and
  *    DuckDB in the last ulp depending on reduction order. `l_quantity`
  *    is integral-valued, so its double sum is exact as-is.
  *  - Every query ends in a deterministic total ORDER BY with explicit
  *    NULLS LAST (Spark's bare `asc` is nulls-FIRST, DuckDB's default is
  *    nulls-LAST — the SURVEY §2.1 O1 landmine).
  *  - Computed integers are cast to BIGINT on both sides: DuckDB
  *    `sum(BIGINT)` is HUGEINT and `year()`/`row_number()` are BIGINT,
  *    while Spark's are LONG/INT.
  *  - Ratios are computed as ONE division of exactly-determined operands
  *    (IEEE division is correctly rounded, so both engines produce the
  *    identical double).
  */
object Relational {

  // the scaled-int rule lives in ONE place — see Exact's scaladoc
  import Exact.{cents, e6}

  val defs: Seq[QueryDef] = Seq(
    // ------------------------------------------------------------------
    // E2 + E5: filter → hash aggregate (TPC-H Q1 shape). The shipdate
    // filter is pushed to the parquet scan; aggregation is partial
    // (map-side) then final — one shuffle on the 4-distinct group key.
    QueryDef(
      "q01_pricing_summary",
      (s, dir) =>
        Tables(s, dir, "lineitem")
          .filter(col("l_shipdate") <= lit("2000-12-01").cast("timestamp"))
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            sum("l_quantity").as("sum_qty"),
            sum(cents(col("l_extendedprice"))).as("base_cents"),
            sum(e6(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("disc_e6"),
            count(lit(1)).as("n"),
            (sum("l_quantity") / count(lit(1))).as("avg_qty")
          )
          .orderBy("l_returnflag", "l_linestatus"),
      Some("""SELECT l_returnflag, l_linestatus,
        sum(l_quantity) AS sum_qty,
        CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS base_cents,
        CAST(sum(CAST(round(l_extendedprice*(1-l_discount)*1000000) AS BIGINT)) AS BIGINT) AS disc_e6,
        count(*) AS n,
        sum(l_quantity)/count(*) AS avg_qty
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus""")
    ),

    // ------------------------------------------------------------------
    // E2: filter + project. Selective predicates reach the scan as
    // PushedFilters; ReadSchema carries only the 5 projected columns.
    QueryDef(
      "q02_filter_project",
      (s, dir) =>
        Tables(s, dir, "lineitem")
          .filter(
            col("l_quantity") >= 48 && col("l_discount") <= 0.02 &&
              col("l_shipdate").between(
                lit("1997-01-01").cast("timestamp"),
                lit("1997-12-31").cast("timestamp")
              )
          )
          .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_shipdate")
          .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_shipdate
        FROM lineitem
        WHERE l_quantity >= 48 AND l_discount <= 0.02
          AND l_shipdate BETWEEN TIMESTAMP '1997-01-01 00:00:00' AND TIMESTAMP '1997-12-31 00:00:00'
        ORDER BY l_orderkey, l_linenumber""")
    ),

    // ------------------------------------------------------------------
    // E3: equi join + aggregate. No broadcast hint: at 100 TB customer is
    // a fact-sized table, so this must survive as a shuffle join; AQE
    // will still broadcast at small SF.
    QueryDef(
      "q03_join_agg",
      (s, dir) => {
        val o = Tables(s, dir, "orders")
        val c = Tables(s, dir, "customer")
        o.join(c, o("o_custkey") === c("c_custkey"))
          .groupBy("c_mktsegment")
          .agg(
            count(lit(1)).as("order_cnt"),
            sum(cents(col("o_totalprice"))).as("total_cents")
          )
          .orderBy("c_mktsegment")
      },
      Some("""SELECT c_mktsegment, count(*) AS order_cnt,
        CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS total_cents
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment ORDER BY c_mktsegment""")
    ),

    // ------------------------------------------------------------------
    // E3: multi-way join with explicit broadcast of the genuinely small
    // dimensions (nation=25, region=5 rows at ANY scale factor — these
    // stay broadcast-able at 100 TB; customer/orders/lineitem do not).
    QueryDef(
      "q04_join_multi",
      (s, dir) => {
        val l = Tables(s, dir, "lineitem")
        val o = Tables(s, dir, "orders")
        val c = Tables(s, dir, "customer")
        val n = Tables(s, dir, "nation")
        val r = Tables(s, dir, "region")
        l.join(o, l("l_orderkey") === o("o_orderkey"))
          .join(c, o("o_custkey") === c("c_custkey"))
          .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
          .groupBy("r_name", "n_name")
          .agg(
            sum(e6(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("revenue_e6"),
            count(lit(1)).as("n")
          )
          .orderBy("r_name", "n_name")
      },
      Some("""SELECT r_name, n_name,
        CAST(sum(CAST(round(l_extendedprice*(1-l_discount)*1000000) AS BIGINT)) AS BIGINT) AS revenue_e6,
        count(*) AS n
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name ORDER BY r_name, n_name""")
    ),

    // ------------------------------------------------------------------
    // E3: left-semi join (EXISTS). The filter on the build side shrinks
    // it before the join.
    QueryDef(
      "q05_semi_join",
      (s, dir) => {
        val c = Tables(s, dir, "customer")
        val big = Tables(s, dir, "orders").filter(col("o_totalprice") > 400000)
        c.join(big, c("c_custkey") === big("o_custkey"), "left_semi")
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("cnt"))
          .orderBy("c_mktsegment")
      },
      Some("""SELECT c_mktsegment, count(*) AS cnt
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
        GROUP BY c_mktsegment ORDER BY c_mktsegment""")
    ),

    // ------------------------------------------------------------------
    // E3: left-anti join (NOT EXISTS): customers that never emitted an
    // event (events.user_id covers only a prefix of the custkey range).
    QueryDef(
      "q06_anti_join",
      (s, dir) => {
        val c = Tables(s, dir, "customer")
        val e = Tables(s, dir, "events")
        c.join(e, c("c_custkey") === e("user_id"), "left_anti")
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("cnt"))
          .orderBy("c_mktsegment")
      },
      Some("""SELECT c_mktsegment, count(*) AS cnt
        FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM events e WHERE e.user_id = c.c_custkey)
        GROUP BY c_mktsegment ORDER BY c_mktsegment""")
    ),

    // ------------------------------------------------------------------
    // E5: distinct aggregates (expand + two-phase distinct agg in Spark).
    QueryDef(
      "q07_distinct_agg",
      (s, dir) =>
        Tables(s, dir, "lineitem")
          .groupBy("l_returnflag")
          .agg(
            countDistinct(col("l_partkey")).as("nd_part"),
            countDistinct(col("l_suppkey")).as("nd_supp"),
            count(lit(1)).as("n")
          )
          .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag, count(DISTINCT l_partkey) AS nd_part,
        count(DISTINCT l_suppkey) AS nd_supp, count(*) AS n
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")
    ),

    // ------------------------------------------------------------------
    // E8: top-k — planner emits TakeOrderedAndProject (per-partition
    // heap + driver merge of k rows, never a global sort).
    QueryDef(
      "q08_topk",
      (s, dir) =>
        Tables(s, dir, "orders")
          .select("o_orderkey", "o_custkey", "o_totalprice")
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
          .limit(100),
      Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""")
    ),

    // ------------------------------------------------------------------
    // E7: ranking window — top-3 orders per customer. One shuffle on the
    // partition key; the rank filter is pushed below the final sort.
    QueryDef(
      "q09_window_topn",
      (s, dir) => {
        val w = Window
          .partitionBy("o_custkey")
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        Tables(s, dir, "orders")
          .withColumn("rn", row_number().over(w).cast("long"))
          .filter(col("rn") <= 3)
          .select("o_custkey", "rn", "o_orderkey", "o_totalprice")
          .orderBy("o_custkey", "rn")
      },
      Some("""SELECT o_custkey, CAST(rn AS BIGINT) AS rn, o_orderkey, o_totalprice
        FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                     row_number() OVER (PARTITION BY o_custkey
                                        ORDER BY o_totalprice DESC, o_orderkey) AS rn
              FROM orders)
        WHERE rn <= 3 ORDER BY o_custkey, rn""")
    ),

    // ------------------------------------------------------------------
    // E7: running aggregate + lag over an ordered frame.
    QueryDef(
      "q10_window_running",
      (s, dir) => {
        val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
        Tables(s, dir, "orders")
          .select(
            col("o_custkey"),
            col("o_orderkey"),
            sum(cents(col("o_totalprice")))
              .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
              .as("run_cents"),
            lag("o_totalprice", 1).over(w).as("prev_price")
          )
          .orderBy("o_custkey", "o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey,
        CAST(sum(CAST(round(o_totalprice*100) AS BIGINT))
             OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS run_cents,
        lag(o_totalprice, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_price
        FROM orders ORDER BY o_custkey, o_orderkey""")
    ),

    // ------------------------------------------------------------------
    // E9: set operations over two customer slices.
    QueryDef(
      "q11_union",
      (s, dir) => {
        val c = Tables(s, dir, "customer")
        val a = c.filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
        val b = c.filter(col("c_acctbal") > 5000).select("c_custkey")
        a.union(b).distinct().orderBy("c_custkey")
      },
      Some("""SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        UNION
        SELECT c_custkey FROM customer WHERE c_acctbal > 5000
        ORDER BY c_custkey""")
    ),
    QueryDef(
      "q12_intersect",
      (s, dir) => {
        val c = Tables(s, dir, "customer")
        val a = c.filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
        val b = c.filter(col("c_acctbal") > 5000).select("c_custkey")
        a.intersect(b).orderBy("c_custkey")
      },
      Some("""SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        INTERSECT
        SELECT c_custkey FROM customer WHERE c_acctbal > 5000
        ORDER BY c_custkey""")
    ),
    QueryDef(
      "q13_except",
      (s, dir) => {
        val c = Tables(s, dir, "customer")
        val a = c.filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
        val b = c.filter(col("c_acctbal") > 5000).select("c_custkey")
        a.except(b).orderBy("c_custkey")
      },
      Some("""SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        EXCEPT
        SELECT c_custkey FROM customer WHERE c_acctbal > 5000
        ORDER BY c_custkey""")
    ),

    // ------------------------------------------------------------------
    // E6: rollup over the region→nation hierarchy.
    QueryDef(
      "q14_rollup",
      (s, dir) => {
        val c = Tables(s, dir, "customer")
        val n = Tables(s, dir, "nation")
        val r = Tables(s, dir, "region")
        // ROLLUP expressed as its grouping-sets expansion: Spark 4's
        // DetectAmbiguousSelfJoin rule false-positives on
        // join→rollup(String*) (dataset-id metadata meets Expand's
        // re-created grouping attributes); groupingSets on the projected
        // plan produces the identical Expand + partial/final agg.
        c.alias("c")
          .join(broadcast(n.alias("n")), col("c.c_nationkey") === col("n.n_nationkey"))
          .join(broadcast(r.alias("r")), col("n.n_regionkey") === col("r.r_regionkey"))
          .select(col("r.r_name"), col("n.n_name"), col("c.c_acctbal"))
          .groupingSets(
            Seq(Seq(col("r_name"), col("n_name")), Seq(col("r_name")), Seq()),
            col("r_name"),
            col("n_name")
          )
          .agg(count(lit(1)).as("cnt"), sum(cents(col("c_acctbal"))).as("acct_cents"))
          .orderBy(asc_nulls_last("r_name"), asc_nulls_last("n_name"))
      },
      Some("""SELECT r_name, n_name, count(*) AS cnt,
        CAST(sum(CAST(round(c_acctbal*100) AS BIGINT)) AS BIGINT) AS acct_cents
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY ROLLUP(r_name, n_name)
        ORDER BY r_name NULLS LAST, n_name NULLS LAST""")
    ),

    // ------------------------------------------------------------------
    // E6: cube over two independent dimensions.
    QueryDef(
      "q15_cube",
      (s, dir) =>
        Tables(s, dir, "lineitem")
          .cube("l_returnflag", "l_linestatus")
          .agg(sum("l_quantity").as("sum_qty"), count(lit(1)).as("n"))
          .orderBy(asc_nulls_last("l_returnflag"), asc_nulls_last("l_linestatus")),
      Some("""SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty, count(*) AS n
        FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        ORDER BY l_returnflag NULLS LAST, l_linestatus NULLS LAST""")
    ),

    // ------------------------------------------------------------------
    // E6: explicit grouping sets.
    QueryDef(
      "q16_grouping_sets",
      (s, dir) => {
        Tables(s, dir, "customer")
          .groupingSets(
            Seq(Seq(col("c_mktsegment")), Seq(col("c_nationkey")), Seq()),
            col("c_mktsegment"),
            col("c_nationkey")
          )
          .agg(count(lit(1)).as("cnt"))
          .orderBy(asc_nulls_last("c_mktsegment"), asc_nulls_last("c_nationkey"))
      },
      Some("""SELECT c_mktsegment, c_nationkey, count(*) AS cnt
        FROM customer GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
        ORDER BY c_mktsegment NULLS LAST, c_nationkey NULLS LAST""")
    ),

    // ------------------------------------------------------------------
    // E10: JSON scalar extraction from events.props (a JSON string).
    QueryDef(
      "q17_json_scalars",
      (s, dir) =>
        Tables(s, dir, "events")
          .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
          .groupBy("event_type")
          .agg(
            count(lit(1)).as("n"),
            sum("k").as("sum_k"),
            min("k").as("min_k"),
            max("k").as("max_k")
          )
          .orderBy("event_type"),
      Some("""SELECT event_type, count(*) AS n,
        CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
        max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
        FROM events GROUP BY event_type ORDER BY event_type""")
    ),

    // ------------------------------------------------------------------
    // E10: typed JSON parse to a MAP + map functions.
    QueryDef(
      "q18_map_funcs",
      (s, dir) =>
        Tables(s, dir, "events")
          .withColumn("m", from_json(col("props"), org.apache.spark.sql.types.MapType(
            org.apache.spark.sql.types.StringType, org.apache.spark.sql.types.LongType)))
          .select(
            col("event_id"),
            element_at(col("m"), "k").as("k"),
            size(map_keys(col("m"))).cast("long").as("n_keys")
          )
          .orderBy("event_id"),
      Some("""SELECT event_id,
        CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
        CAST(len(json_keys(props)) AS BIGINT) AS n_keys
        FROM events ORDER BY event_id""")
    ),

    // ------------------------------------------------------------------
    // E11: deterministic exact dedup — first event per (user, type) by
    // (ts, event_id). dropDuplicates picks an ARBITRARY survivor, which
    // can't be oracle-checked and is a reproducibility hazard in a real
    // pipeline; the row_number formulation is the scalable deterministic
    // variant (one shuffle on the dedup key).
    QueryDef(
      "q19_dedup_first",
      (s, dir) => {
        val w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
        Tables(s, dir, "events")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select("user_id", "event_type", "event_id", "ts", "value")
          .orderBy("user_id", "event_type")
      },
      Some("""SELECT user_id, event_type, event_id, ts, value
        FROM (SELECT user_id, event_type, event_id, ts, value,
                     row_number() OVER (PARTITION BY user_id, event_type
                                        ORDER BY ts, event_id) AS rn
              FROM events)
        WHERE rn = 1 ORDER BY user_id, event_type""")
    ),

    // ------------------------------------------------------------------
    // E11: projection-distinct (exact dedup of the projected key set).
    QueryDef(
      "q20_distinct",
      (s, dir) =>
        Tables(s, dir, "events")
          .select("user_id", "event_type")
          .distinct()
          .orderBy("user_id", "event_type"),
      Some("""SELECT DISTINCT user_id, event_type FROM events
        ORDER BY user_id, event_type""")
    ),

    // ------------------------------------------------------------------
    // E4: range join against a small banding dimension — broadcast
    // nested-loop with a range predicate; the broadcast keeps it linear
    // in the fact side at any scale.
    QueryDef(
      "q21_range_join",
      (s, dir) => {
        val spark = s
        import spark.implicits._
        val bands = Seq(
          (0.0, 100000.0, "b0"),
          (100000.0, 200000.0, "b1"),
          (200000.0, 300000.0, "b2"),
          (300000.0, 400000.0, "b3"),
          (400000.0, 500000.0, "b4")
        ).toDF("lo", "hi", "band")
        Tables(s, dir, "orders")
          .join(broadcast(bands), col("o_totalprice") >= col("lo") && col("o_totalprice") < col("hi"))
          .groupBy("band")
          .agg(count(lit(1)).as("cnt"), sum(cents(col("o_totalprice"))).as("total_cents"))
          .orderBy("band")
      },
      Some("""SELECT band, count(*) AS cnt,
        CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS total_cents
        FROM orders
        JOIN (VALUES (0.0, 100000.0, 'b0'), (100000.0, 200000.0, 'b1'),
                     (200000.0, 300000.0, 'b2'), (300000.0, 400000.0, 'b3'),
                     (400000.0, 500000.0, 'b4')) b(lo, hi, band)
          ON o_totalprice >= lo AND o_totalprice < hi
        GROUP BY band ORDER BY band""")
    ),

    // ------------------------------------------------------------------
    // E4: as-of join realized the scalable way — for every purchase, the
    // most recent strictly-prior click of the same user, via a single
    // window pass (one shuffle on user_id) instead of an O(n²) non-equi
    // self-join.
    QueryDef(
      "q22_asof_join",
      (s, dir) => {
        val w = Window
          .partitionBy("user_id")
          .orderBy("ts", "event_id")
          .rowsBetween(Window.unboundedPreceding, -1)
        Tables(s, dir, "events")
          .withColumn("last_click_ts", max(when(col("event_type") === "click", col("ts"))).over(w))
          .filter(col("event_type") === "purchase")
          .select("event_id", "user_id", "ts", "last_click_ts")
          .orderBy("event_id")
      },
      Some("""SELECT event_id, user_id, ts, last_click_ts
        FROM (SELECT event_id, user_id, ts, event_type,
                     max(CASE WHEN event_type = 'click' THEN ts END)
                       OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_click_ts
              FROM events)
        WHERE event_type = 'purchase' ORDER BY event_id""")
    ),

    // ------------------------------------------------------------------
    // E4: interval join with BOTH sides fact-scaled (the Flink
    // interval-join / kdb wj shape q21 does not cover — its band
    // table is a broadcastable dimension). Every `error` event opens
    // a 2-hour incident window; for every `purchase`, count the
    // incident windows open at its timestamp. Written naively
    // (`p.ts >= i.ts AND p.ts < i.ts + 2h`) Spark has no equi-key and
    // plans a BroadcastNestedLoopJoin — O(n·m) and a driver OOM the
    // moment neither side broadcasts. The scalable rewrite exploits
    // the BOUNDED span: bin time by the max window width W=2h; an
    // interval overlaps ≤ 2 bins (exploded via sequence — at most 2
    // rows per incident), a point lives in EXACTLY 1 bin, so a plain
    // equi-join on the bin plus a local range refinement finds every
    // pair exactly once (no post-dedup — the pair can only meet in
    // the point's bin). One shuffle on a dense, time-uniform key at
    // any scale; the left join keeps incident-free purchases at
    // count 0. Microsecond epochs from unix_micros keep the binning
    // exact (no sub-second truncation at bin edges).
    QueryDef(
      "q231_interval_join",
      (s, dir) => {
        val W = 2L * 3600L * 1000000L // 2h in µs == the window span
        val ev = Tables(s, dir, "events")
        val inc = ev
          .filter(col("event_type") === "error")
          .select(
            col("event_id").as("inc_id"),
            col("ts").as("lo"),
            (col("ts") + expr("INTERVAL 2 HOURS")).as("hi")
          )
          .withColumn(
            "bin",
            explode(expr(s"sequence(unix_micros(lo) div $W, (unix_micros(lo) + ${W - 1}) div $W)"))
          )
        val pts = ev
          .filter(col("event_type") === "purchase")
          .select(col("event_id"), col("ts"), expr(s"unix_micros(ts) div $W").as("pbin"))
        val out = pts
          .join(
            inc,
            pts("pbin") === inc("bin") && col("lo") <= col("ts") && col("ts") < col("hi"),
            "left"
          )
          .groupBy("event_id")
          .agg(count(col("inc_id")).as("n_open"))
          .orderBy("event_id")
        // the bin key is the contract: a nested-loop plan here means the
        // equi-key was lost and the query is back to O(n·m)
        val plan = out.queryExecution.executedPlan.toString
        require(!plan.contains("NestedLoop"), s"interval join planned as nested loop:\n$plan")
        out
      },
      Some("""SELECT p.event_id, CAST(count(i.event_id) AS BIGINT) AS n_open
        FROM (SELECT event_id, ts FROM events WHERE event_type = 'purchase') p
        LEFT JOIN (SELECT event_id, ts FROM events WHERE event_type = 'error') i
          ON p.ts >= i.ts AND p.ts < i.ts + INTERVAL 2 HOUR
        GROUP BY p.event_id ORDER BY p.event_id""")
    ),

    // ------------------------------------------------------------------
    // E10: string/date/math scalar functions (all codegen built-ins).
    QueryDef(
      "q23_scalar_funcs",
      (s, dir) =>
        Tables(s, dir, "orders")
          .filter(year(col("o_orderdate")) === 1997)
          .select(
            col("o_orderkey"),
            upper(substring(col("o_orderpriority"), 1, 3)).as("pri3"),
            length(col("o_orderpriority")).cast("long").as("pri_len"),
            concat_ws("-", col("o_orderstatus"), col("o_orderpriority")).as("status_pri"),
            year(col("o_orderdate")).cast("long").as("yr"),
            month(col("o_orderdate")).cast("long").as("mo"),
            datediff(col("o_orderdate"), lit("1995-01-01").cast("date")).cast("long").as("days_since"),
            sqrt(col("o_totalprice")).as("price_sqrt"),
            abs(col("o_totalprice") - lit(250000.0)).as("price_dev")
          )
          .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey,
        upper(substring(o_orderpriority, 1, 3)) AS pri3,
        CAST(length(o_orderpriority) AS BIGINT) AS pri_len,
        concat_ws('-', o_orderstatus, o_orderpriority) AS status_pri,
        CAST(year(o_orderdate) AS BIGINT) AS yr,
        CAST(month(o_orderdate) AS BIGINT) AS mo,
        CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since,
        sqrt(o_totalprice) AS price_sqrt,
        abs(o_totalprice - 250000.0) AS price_dev
        FROM orders WHERE year(o_orderdate) = 1997 ORDER BY o_orderkey""")
    ),

    // ------------------------------------------------------------------
    // E10: array functions over the documents corpus.
    QueryDef(
      "q24_array_funcs",
      (s, dir) =>
        Tables(s, dir, "documents")
          .select(
            col("doc_id"),
            size(split(col("text"), " ")).cast("long").as("n_tokens"),
            size(array_distinct(split(col("text"), " "))).cast("long").as("n_distinct"),
            element_at(split(col("text"), " "), 1).as("first_tok"),
            element_at(split(col("text"), " "), -1).as("last_tok"),
            array_contains(split(col("text"), " "), "spark").as("has_spark")
          )
          .orderBy("doc_id"),
      Some("""SELECT doc_id,
        CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct,
        string_split(text, ' ')[1] AS first_tok,
        string_split(text, ' ')[-1] AS last_tok,
        list_contains(string_split(text, ' '), 'spark') AS has_spark
        FROM documents ORDER BY doc_id""")
    ),

    // ------------------------------------------------------------------
    // E15 (batch view): epoch-aligned tumbling window aggregation; the
    // identical groupBy(window(...)) works unchanged on a stream.
    QueryDef(
      "q25_tumbling_window",
      (s, dir) =>
        Tables(s, dir, "events")
          .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
          .agg(
            count(lit(1)).as("n"),
            sum(Exact.milli(col("value"))).as("value_milli"),
            min("value").as("min_v"),
            max("value").as("max_v")
          )
          .select(col("w.start").as("bucket_start"), col("event_type"), col("n"),
            col("value_milli"), col("min_v"), col("max_v"))
          .orderBy("bucket_start", "event_type"),
      Some("""SELECT time_bucket(INTERVAL '1 hour', ts) AS bucket_start, event_type,
        count(*) AS n,
        CAST(sum(CAST(round(value*1000) AS BIGINT)) AS BIGINT) AS value_milli,
        min(value) AS min_v, max(value) AS max_v
        FROM events GROUP BY 1, 2 ORDER BY 1, 2""")
    ),

    // ------------------------------------------------------------------
    // E15 (batch view): session windows (5-minute gap) per user. The
    // DuckDB oracle is the classic gaps-and-islands formulation; Spark's
    // session_window uses the same gap semantics (new session when
    // ts - prev_ts >= gap).
    QueryDef(
      "q26_session_window",
      (s, dir) =>
        Tables(s, dir, "events")
          .groupBy(session_window(col("ts"), "5 minutes").as("w"), col("user_id"))
          .agg(count(lit(1)).as("n"))
          .select(col("user_id"), col("w.start").as("session_start"), col("n"))
          .orderBy("user_id", "session_start"),
      Some("""SELECT user_id, min(ts) AS session_start, count(*) AS n
        FROM (SELECT user_id, ts,
                     sum(CASE WHEN prev_ts IS NULL
                               OR ts - prev_ts >= INTERVAL '5 minutes' THEN 1 ELSE 0 END)
                       OVER (PARTITION BY user_id ORDER BY ts, event_id) AS grp
              FROM (SELECT user_id, ts, event_id,
                           lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
                    FROM events))
        GROUP BY user_id, grp ORDER BY user_id, session_start""")
    ),

    // ------------------------------------------------------------------
    // E3: left outer join with null-side aggregation — events per
    // customer including event-less customers (user_id covers only a
    // prefix of custkeys).
    QueryDef(
      "q28_outer_join",
      (s, dir) => {
        val c = Tables(s, dir, "customer")
        val e = Tables(s, dir, "events")
        c.join(e, c("c_custkey") === e("user_id"), "left_outer")
          .groupBy(c("c_custkey").as("c_custkey"))
          .agg(
            count(e("event_id")).as("n_events"), // count(col) skips nulls
            max(e("ts")).as("last_ts")
          )
          .filter(col("c_custkey") < 300)
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, count(event_id) AS n_events, max(ts) AS last_ts
        FROM customer LEFT OUTER JOIN events ON c_custkey = user_id
        WHERE c_custkey < 300
        GROUP BY c_custkey ORDER BY c_custkey""")
    ),

    // ------------------------------------------------------------------
    // E5: median / percentile. Interpolation of integral-valued doubles
    // ((a+b)/2) is exact, so the oracle matches bit-for-bit.
    QueryDef(
      "q29_median",
      (s, dir) =>
        Tables(s, dir, "lineitem")
          .groupBy("l_returnflag")
          .agg(
            median(col("l_quantity")).as("med_qty"),
            min("l_quantity").as("min_qty"),
            max("l_quantity").as("max_qty")
          )
          .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag, median(l_quantity) AS med_qty,
        min(l_quantity) AS min_qty, max(l_quantity) AS max_qty
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")
    ),

    // ------------------------------------------------------------------
    // E10 (Spark 4): VARIANT ingestion of the JSON props — parse once,
    // extract typed fields lazily. Same oracle as the string-path
    // extraction, demonstrating semantic equivalence.
    QueryDef(
      "q44_variant_json",
      (s, dir) =>
        Tables(s, dir, "events")
          .select(col("event_id"), parse_json(col("props")).as("v"))
          .select(
            col("event_id"),
            expr("variant_get(v, '$.k', 'bigint')").as("k")
          )
          .orderBy("event_id"),
      Some("""SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        FROM events ORDER BY event_id""")
    ),

    // ------------------------------------------------------------------
    // E7: RANGE-frame window — for each order, total cents of the same
    // customer's orders within the preceding 30 days (time-based frame,
    // not row-based).
    QueryDef(
      "q45_window_range_frame",
      (s, dir) => {
        val w = Window
          .partitionBy("o_custkey")
          // parquet NTZ timestamp → UTC instant → epoch seconds
          .orderBy(col("o_orderdate").cast("timestamp").cast("long"))
          .rangeBetween(-30L * 86400, 0L)
        Tables(s, dir, "orders")
          .select(
            col("o_custkey"),
            col("o_orderkey"),
            col("o_orderdate"),
            sum(cents(col("o_totalprice"))).over(w).as("cents_30d")
          )
          .orderBy("o_custkey", "o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey, o_orderdate,
        CAST(sum(CAST(round(o_totalprice*100) AS BIGINT))
             OVER (PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
                   RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW) AS BIGINT) AS cents_30d
        FROM orders ORDER BY o_custkey, o_orderkey""")
    ),

    // ------------------------------------------------------------------
    // E5/E10: ordered string aggregation — sort_array(collect_list(...))
    // gives a deterministic within-group order, mirrored by DuckDB's
    // string_agg(... ORDER BY ...).
    QueryDef(
      "q49_string_agg",
      (s, dir) => {
        val c = Tables(s, dir, "customer")
        val n = Tables(s, dir, "nation")
        c.filter(col("c_acctbal") > 9000)
          .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .groupBy("n_name")
          .agg(
            concat_ws(",", sort_array(collect_list(col("c_name")))).as("rich_customers"),
            count(lit(1)).as("cnt")
          )
          .orderBy("n_name")
      },
      Some("""SELECT n_name,
        string_agg(c_name, ',' ORDER BY c_name) AS rich_customers,
        count(*) AS cnt
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        WHERE c_acctbal > 9000
        GROUP BY n_name ORDER BY n_name""")
    ),

    // ------------------------------------------------------------------
    // E7: navigation window functions — first/last/nth over an explicit
    // full-partition frame (last_value over the default frame is a
    // classic running-value trap; the frame is pinned on both sides).
    QueryDef(
      "q52_window_nav",
      (s, dir) => {
        val w = Window
          .partitionBy("o_custkey")
          .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        Tables(s, dir, "orders")
          .select(
            col("o_custkey"),
            col("o_orderkey"),
            first("o_orderkey").over(w).as("first_ok"),
            last("o_orderkey").over(w).as("last_ok"),
            nth_value(col("o_orderkey"), 2).over(w).as("second_ok")
          )
          .orderBy("o_custkey", "o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey,
        first_value(o_orderkey) OVER w AS first_ok,
        last_value(o_orderkey) OVER w AS last_ok,
        nth_value(o_orderkey, 2) OVER w AS second_ok
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        ORDER BY o_custkey, o_orderkey""")
    ),

    // ------------------------------------------------------------------
    // E2/E3: LIKE-predicate scan pruning + the part/supplier dimensions
    // (completing table coverage): revenue by brand for medium parts
    // from high-balance suppliers.
    QueryDef(
      "q53_part_supplier",
      (s, dir) => {
        val l = Tables(s, dir, "lineitem")
        // '%OM%' selects the PROMO and ECONOMY type families in this
        // corpus (a '%BRASS%'-style TPC-H pattern matches nothing here
        // and made the query vacuously 0-row)
        val p = Tables(s, dir, "part").filter(
          col("p_type").like("%OM%") && col("p_size").between(5, 20)
        )
        val sup = Tables(s, dir, "supplier").filter(col("s_acctbal") > 0)
        l.join(p, l("l_partkey") === p("p_partkey"))
          .join(sup, l("l_suppkey") === sup("s_suppkey"))
          .groupBy("p_brand")
          .agg(
            count(lit(1)).as("n"),
            sum(e6(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("rev_e6"),
            countDistinct(col("s_suppkey")).as("nd_supp")
          )
          .orderBy("p_brand")
      },
      Some("""SELECT p_brand, count(*) AS n,
        CAST(sum(CAST(round(l_extendedprice*(1-l_discount)*1000000) AS BIGINT)) AS BIGINT) AS rev_e6,
        count(DISTINCT s_suppkey) AS nd_supp
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        WHERE p_type LIKE '%OM%' AND p_size BETWEEN 5 AND 20 AND s_acctbal > 0
        GROUP BY p_brand ORDER BY p_brand""")
    ),

    // ------------------------------------------------------------------
    // E6-adjacent: PIVOT — event counts per user spread across one
    // column per event type. Pivot values are pinned explicitly (an
    // unpinned pivot scans the data twice to discover them).
    QueryDef(
      "q54_pivot",
      (s, dir) =>
        Tables(s, dir, "events")
          .groupBy("user_id")
          .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
          .count()
          .na.fill(0L)
          .orderBy("user_id"),
      Some("""SELECT user_id,
        count(*) FILTER (event_type = 'click') AS click,
        count(*) FILTER (event_type = 'error') AS error,
        count(*) FILTER (event_type = 'purchase') AS purchase,
        count(*) FILTER (event_type = 'signup') AS signup,
        count(*) FILTER (event_type = 'view') AS view
        FROM events GROUP BY user_id ORDER BY user_id""")
    ),

    // ------------------------------------------------------------------
    // E6-adjacent: UNPIVOT/melt — wide metric columns to long form.
    QueryDef(
      "q55_unpivot",
      (s, dir) =>
        Tables(s, dir, "lineitem")
          .filter(col("l_orderkey") < 100)
          .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_tax")
          .unpivot(
            Array(col("l_orderkey"), col("l_linenumber")),
            Array(col("l_quantity"), col("l_discount"), col("l_tax")),
            "metric",
            "value"
          )
          .orderBy("l_orderkey", "l_linenumber", "metric"),
      Some("""SELECT l_orderkey, l_linenumber, metric, value FROM (
          SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric, l_quantity AS value
          FROM lineitem WHERE l_orderkey < 100
          UNION ALL
          SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
          FROM lineitem WHERE l_orderkey < 100
          UNION ALL
          SELECT l_orderkey, l_linenumber, 'l_tax', l_tax
          FROM lineitem WHERE l_orderkey < 100)
        ORDER BY l_orderkey, l_linenumber, metric""")
    ),

    // ------------------------------------------------------------------
    // E5: HLL sketch — approx_count_distinct. No oracle (sketch values
    // are implementation-specific); the driver records a rows-only
    // check, and exactness is covered by q07.
    QueryDef(
      "q27_approx_distinct",
      (s, dir) =>
        Tables(s, dir, "lineitem")
          .groupBy("l_returnflag")
          .agg(
            approx_count_distinct(col("l_partkey")).as("apx_part"),
            approx_count_distinct(col("l_suppkey")).as("apx_supp")
          )
          .orderBy("l_returnflag"),
      None
    ),

    // ------------------------------------------------------------------
    // MARKET-BASKET LIFT (association mining, round 13): brand pairs
    // co-appearing in one order, ranked by exact-integer lift
    // (P(ab)/(P(a)P(b)) in ppm: cnt_ab·n_baskets·10⁶ DIV cnt_a·cnt_b)
    // with a support floor. The pair stream is BASKET-BOUNDED (the
    // q194 discipline: per-order sorted brand set, local pair
    // expansion — never an order-keyed self-join whose skew follows
    // the biggest basket), and the brand space is small so the
    // marginals broadcast. The n_baskets scalar rides a 1-row cross
    // join, keeping the whole plan declarative. ORACLE-EXACT.
    QueryDef(
      "q261_basket_lift",
      (s, dir) => {
        val items = Tables(s, dir, "lineitem")
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
          .join(
            broadcast(
              Tables(s, dir, "part").select(col("p_partkey").as("pk"), col("p_brand").as("b"))
            ),
            Seq("pk")
          )
          .select("ok", "b")
          .distinct()
        val nb = items.select(countDistinct("ok").as("n_baskets"))
        val marg = items.groupBy("b").agg(count(lit(1)).as("cb"))
        val pairs = items
          .groupBy("ok")
          .agg(sort_array(collect_set(col("b"))).as("bs"))
          .select(
            explode(
              expr(
                "flatten(transform(bs, (x, i) -> transform(slice(bs, i + 2, size(bs)), y -> struct(x AS b1, y AS b2))))"
              )
            ).as("pr")
          )
          .select(col("pr.b1").as("b1"), col("pr.b2").as("b2"))
          .groupBy("b1", "b2")
          .agg(count(lit(1)).as("cab"))
        pairs
          .join(broadcast(marg.select(col("b").as("b1"), col("cb").as("ca"))), Seq("b1"))
          .join(broadcast(marg.select(col("b").as("b2"), col("cb").as("cb2"))), Seq("b2"))
          .crossJoin(broadcast(nb))
          .filter(col("cab") >= 5)
          .withColumn("lift_ppm", expr("cab * n_baskets * 1000000L DIV (ca * cb2)"))
          .select("b1", "b2", "cab", "lift_ppm")
          .orderBy(desc("lift_ppm"), asc("b1"), asc("b2"))
          .limit(20)
      },
      Some("""WITH items AS (
          SELECT DISTINCT l_orderkey AS ok, p_brand AS b
          FROM lineitem JOIN part ON p_partkey = l_partkey),
        nb AS (SELECT count(DISTINCT ok) AS n_baskets FROM items),
        marg AS (SELECT b, count(*) AS cb FROM items GROUP BY 1),
        pairs AS (
          SELECT a.b AS b1, c.b AS b2, count(*) AS cab
          FROM items a JOIN items c ON a.ok = c.ok AND a.b < c.b
          GROUP BY 1, 2)
        SELECT b1, b2, cab,
               CAST(cab * n_baskets * 1000000 // (ma.cb * mb.cb) AS BIGINT) AS lift_ppm
        FROM pairs
        JOIN marg ma ON ma.b = b1 JOIN marg mb ON mb.b = b2
        CROSS JOIN nb
        WHERE cab >= 5
        ORDER BY lift_ppm DESC, b1, b2 LIMIT 20""")
    ),

    // ------------------------------------------------------------------
    // DATA-QUALITY EXPECTATIONS REPORT (round 13, the Deequ/Great-
    // Expectations shape): one pass of declarative checks — null
    // completeness, key uniqueness, referential integrity (anti-join
    // orphan counts), numeric range bounds, accepted-value domains —
    // each emitting (check, target, n_checked, n_violations, pass).
    // Every check is a partial-aggregating scan or a key-only
    // anti-join; nothing is row-materialized, so the report costs one
    // read of each table at 100 TB. Deterministic integers end to end.
    // ORACLE-EXACT — the report itself is the tested artifact, so a
    // check that under- or over-counts violations breaks the hash.
    QueryDef(
      "q270_quality_expectations",
      (s, dir) => {
        val sess = s
        import sess.implicits._
        val li = Tables(s, dir, "lineitem")
        val o = Tables(s, dir, "orders")
        val c = Tables(s, dir, "customer")
        def row(check: String, target: String, nChecked: Long, nViol: Long) =
          (check, target, nChecked, nViol, nViol == 0L)
        val nullRow = {
          val r = li
            .agg(
              count(lit(1)),
              sum(when(col("l_partkey").isNull || col("l_orderkey").isNull, 1L).otherwise(0L))
            )
            .head()
          row("completeness", "lineitem.keys", r.getLong(0), r.getLong(1))
        }
        val uniqO = {
          val r = o.agg(count(lit(1)), countDistinct(col("o_orderkey"))).head()
          row("uniqueness", "orders.o_orderkey", r.getLong(0), r.getLong(0) - r.getLong(1))
        }
        val uniqLi = {
          val r = li
            .agg(count(lit(1)), countDistinct(col("l_orderkey"), col("l_linenumber")))
            .head()
          row("uniqueness", "lineitem.(okey,line)", r.getLong(0), r.getLong(0) - r.getLong(1))
        }
        val refLiO = row(
          "referential",
          "lineitem.l_orderkey->orders",
          li.count(),
          li.join(o.select("o_orderkey"), col("l_orderkey") === col("o_orderkey"), "left_anti")
            .count()
        )
        val refOC = row(
          "referential",
          "orders.o_custkey->customer",
          o.count(),
          o.join(c.select("c_custkey"), col("o_custkey") === col("c_custkey"), "left_anti")
            .count()
        )
        val range = {
          val r = li
            .agg(
              count(lit(1)),
              sum(when(!col("l_quantity").between(1, 50), 1L).otherwise(0L))
            )
            .head()
          row("range", "lineitem.l_quantity[1,50]", r.getLong(0), r.getLong(1))
        }
        val domain = {
          val r = o
            .agg(
              count(lit(1)),
              sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"), 1L)
                .otherwise(0L))
            )
            .head()
          row("domain", "orders.o_orderpriority", r.getLong(0), r.getLong(1))
        }
        Seq(nullRow, uniqO, uniqLi, refLiO, refOC, range, domain)
          .toDF("check_kind", "target", "n_checked", "n_violations", "pass")
          .orderBy("check_kind", "target")
      },
      Some("""SELECT check_kind, target, n_checked, n_violations,
               n_violations = 0 AS pass FROM (
          SELECT 'completeness' AS check_kind, 'lineitem.keys' AS target,
                 count(*) AS n_checked,
                 CAST(sum(CASE WHEN l_partkey IS NULL OR l_orderkey IS NULL
                          THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
          FROM lineitem
          UNION ALL
          SELECT 'uniqueness', 'orders.o_orderkey', count(*),
                 count(*) - count(DISTINCT o_orderkey) FROM orders
          UNION ALL
          SELECT 'uniqueness', 'lineitem.(okey,line)', count(*),
                 count(*) - count(DISTINCT (l_orderkey, l_linenumber)) FROM lineitem
          UNION ALL
          SELECT 'referential', 'lineitem.l_orderkey->orders',
                 (SELECT count(*) FROM lineitem),
                 (SELECT count(*) FROM lineitem
                  WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders))
          UNION ALL
          SELECT 'referential', 'orders.o_custkey->customer',
                 (SELECT count(*) FROM orders),
                 (SELECT count(*) FROM orders
                  WHERE o_custkey NOT IN (SELECT c_custkey FROM customer))
          UNION ALL
          SELECT 'range', 'lineitem.l_quantity[1,50]', count(*),
                 CAST(sum(CASE WHEN l_quantity NOT BETWEEN 1 AND 50
                          THEN 1 ELSE 0 END) AS BIGINT) FROM lineitem
          UNION ALL
          SELECT 'domain', 'orders.o_orderpriority', count(*),
                 CAST(sum(CASE WHEN o_orderpriority NOT IN
                   ('1-URGENT', '2-HIGH', '3-MEDIUM', '4-NOT SPECIFIED', '5-LOW')
                          THEN 1 ELSE 0 END) AS BIGINT) FROM orders)
        ORDER BY check_kind, target""")
    ),

    // ------------------------------------------------------------------
    // DEPENDENCY PROFILING (round 13): the schema-discovery pass a
    // warehouse runs over unfamiliar data — FUNCTIONAL dependencies
    // (does X determine Y: violating-LHS count = |{x : ndv(y|x) > 1}|,
    // via one (x,y)-distinct aggregate) and INCLUSION dependencies
    // (what fraction of distinct X values appear in Y, in exact ppm,
    // via distinct + anti-join) — the evidence behind declaring q241's
    // RELY constraints. All distinct-scaled exchanges; nothing is
    // row-materialized. ORACLE-EXACT.
    QueryDef(
      "q271_profile_dependencies",
      (s, dir) => {
        val sess = s
        import sess.implicits._
        val li = Tables(s, dir, "lineitem")
        val docs = Tables(s, dir, "documents")
        def fd(df: org.apache.spark.sql.DataFrame, x: String, y: String, tag: String) = {
          val r = df
            .groupBy(col(x))
            .agg(countDistinct(col(y)).as("ndv"))
            .agg(count(lit(1)), sum(when(col("ndv") > 1, 1L).otherwise(0L)))
            .head()
          (s"fd:$tag", r.getLong(0), r.getLong(1), if (r.getLong(0) == 0) 0L else r.getLong(1) * 1000000L / r.getLong(0))
        }
        def incl(
            a: org.apache.spark.sql.DataFrame,
            ax: String,
            b: org.apache.spark.sql.DataFrame,
            bx: String,
            tag: String
        ) = {
          val da = a.select(col(ax).as("v")).distinct()
          val n = da.count()
          val miss = da.join(b.select(col(bx).as("v")).distinct(), Seq("v"), "left_anti").count()
          (s"incl:$tag", n, miss, if (n == 0) 0L else (n - miss) * 1000000L / n)
        }
        Seq(
          fd(li, "l_partkey", "l_suppkey", "l_partkey->l_suppkey"),
          fd(li, "l_orderkey", "l_returnflag", "l_orderkey->l_returnflag"),
          fd(docs, "lang", "source", "lang->source"),
          incl(li, "l_suppkey", Tables(s, dir, "supplier"), "s_suppkey", "l_suppkey<=supplier"),
          incl(Tables(s, dir, "part"), "p_partkey", li, "l_partkey", "p_partkey<=l_partkey")
        ).toDF("dep", "n_lhs", "n_violating", "ratio_ppm")
          .orderBy("dep")
      },
      Some("""SELECT dep, n_lhs, n_violating, ratio_ppm FROM (
          SELECT 'fd:l_partkey->l_suppkey' AS dep, count(*) AS n_lhs,
                 CAST(sum(CASE WHEN ndv > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_violating,
                 CAST(CASE WHEN count(*) = 0 THEN 0
                      ELSE sum(CASE WHEN ndv > 1 THEN 1 ELSE 0 END) * 1000000 // count(*)
                 END AS BIGINT) AS ratio_ppm
          FROM (SELECT l_partkey, count(DISTINCT l_suppkey) AS ndv
                FROM lineitem GROUP BY 1)
          UNION ALL
          SELECT 'fd:l_orderkey->l_returnflag', count(*),
                 CAST(sum(CASE WHEN ndv > 1 THEN 1 ELSE 0 END) AS BIGINT),
                 CAST(CASE WHEN count(*) = 0 THEN 0
                      ELSE sum(CASE WHEN ndv > 1 THEN 1 ELSE 0 END) * 1000000 // count(*)
                 END AS BIGINT)
          FROM (SELECT l_orderkey, count(DISTINCT l_returnflag) AS ndv
                FROM lineitem GROUP BY 1)
          UNION ALL
          SELECT 'fd:lang->source', count(*),
                 CAST(sum(CASE WHEN ndv > 1 THEN 1 ELSE 0 END) AS BIGINT),
                 CAST(CASE WHEN count(*) = 0 THEN 0
                      ELSE sum(CASE WHEN ndv > 1 THEN 1 ELSE 0 END) * 1000000 // count(*)
                 END AS BIGINT)
          FROM (SELECT lang, count(DISTINCT source) AS ndv
                FROM documents GROUP BY 1)
          UNION ALL
          SELECT 'incl:l_suppkey<=supplier', n, miss,
                 CAST(CASE WHEN n = 0 THEN 0 ELSE (n - miss) * 1000000 // n END AS BIGINT)
          FROM (SELECT count(*) AS n,
                       CAST(sum(CASE WHEN s_suppkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS miss
                FROM (SELECT DISTINCT l_suppkey FROM lineitem) a
                LEFT JOIN (SELECT DISTINCT s_suppkey FROM supplier) b
                  ON a.l_suppkey = b.s_suppkey)
          UNION ALL
          SELECT 'incl:p_partkey<=l_partkey', n, miss,
                 CAST(CASE WHEN n = 0 THEN 0 ELSE (n - miss) * 1000000 // n END AS BIGINT)
          FROM (SELECT count(*) AS n,
                       CAST(sum(CASE WHEN lp IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS miss
                FROM (SELECT DISTINCT p_partkey FROM part) a
                LEFT JOIN (SELECT DISTINCT l_partkey AS lp FROM lineitem) b
                  ON a.p_partkey = b.lp))
        ORDER BY dep""")
    )
  )
}
