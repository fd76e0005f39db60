package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Sketch-based frequency estimation (SURVEY.md §2.3 E5 family).
  *
  * A count-min sketch (Cormode & Muthukrishnan 2005) kept RELATIONAL:
  * the d×w counter matrix is an ordinary aggregate over the token
  * stream, so Spark's partial aggregation IS the sketch's mergeability
  * — every map task reduces its partition to ≤ d·w counter cells
  * before the exchange, and the shuffle carries at most d·w rows per
  * partition no matter the corpus size. Nothing here needs custom
  * state: the sketch update rule (increment cell (j, h_j(x))) is a
  * projection + groupBy, and the estimate rule (min_j C[j][h_j(x)])
  * is a broadcast lookup join + min. Hashes are md5-derived, so both
  * engines compute identical buckets and the whole sketch — counters,
  * estimates, overcounts — is ORACLE-EXACT, unusual for a sketch.
  *
  * The same pieces run LIVE in q168 (queries/StreamGate): per-batch
  * partial counter tables append to a staging table and merge by
  * summation — additivity is the mergeability CMS is built on, so the
  * drained stream result is bit-identical to the batch sketch no
  * matter how the source micro-batches.
  */
object Sketches {

  /** d hash rows × w buckets. w is deliberately SMALLER than this
    * corpus's vocabulary (31 token types) so bucket collisions — the
    * case the min-over-d-rows estimator exists for — actually occur
    * at test scale; a production sketch sizes w = ⌈e/ε⌉ for the target
    * error ε·N. The counter table is ≤ d·w = 64 rows — broadcastable
    * by construction at ANY w a sketch would realistically use.
    */
  private[queries] val D = 4
  private[queries] val W = 16

  /** Engine-portable bucket: first 8 md5 hex chars of "j:token" as an
    * integer, mod w. Spark and DuckDB compute identical md5 hex, so
    * bucket assignment is a pure function of (j, token) in both.
    */
  private def bucketExpr(j: String, tok: String): String =
    s"cast(conv(substring(md5(concat($j, ':', $tok)), 1, 8), 16, 10) AS bigint) % $W"

  /** Exact per-token-TYPE counts — the map-side-combined exchange every
    * exact formulation pays; all sketch work downstream is
    * vocabulary-scaled. */
  private[queries] def tokenCounts(docs: DataFrame): DataFrame =
    docs
      .select(explode(split(col("text"), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy("tok")
      .agg(count(lit(1)).as("n"))

  /** The d×w counter matrix over a token-count table. ADDITIVE: counter
    * tables of disjoint corpus slices merge by (j, b) summation into
    * exactly the whole-corpus table — the property q168 exercises per
    * micro-batch. */
  private[queries] def counterTable(tokCounts: DataFrame): DataFrame =
    tokCounts
      .select(col("tok"), col("n"), explode(expr(s"sequence(0, ${D - 1})")).as("j"))
      .withColumn("b", expr(bucketExpr("j", "tok")))
      .groupBy("j", "b")
      .agg(sum("n").as("c"))

  /** CMS estimates (min over d rows) for the 20 most frequent tokens,
    * next to exact counts and the provably-non-negative overcount.
    * Probe keys come from the bounded-heap global top-k, not a global
    * sort; estimates are broadcast lookups against the ≤ d·w counter
    * table. */
  private[queries] def estimateTopK(tokCounts: DataFrame, counters: DataFrame): DataFrame =
    tokCounts
      .groupBy()
      .agg(expr("top_k_structs(struct(-n AS nn, tok), 20)").as("ks"))
      .select(explode(col("ks")).as("k"))
      .select(col("k.tok").as("tok"), (-col("k.nn")).as("n"))
      .select(col("tok"), col("n"), explode(expr(s"sequence(0, ${D - 1})")).as("j"))
      .withColumn("b", expr(bucketExpr("j", "tok")))
      .join(broadcast(counters), Seq("j", "b"))
      .groupBy("tok", "n")
      .agg(min("c").as("cms_est"))
      .select(
        col("tok"),
        col("n").as("exact_n"),
        col("cms_est"),
        (col("cms_est") - col("n")).as("overcount")
      )
      .orderBy(col("exact_n").desc, col("tok"))

  /** Shared oracle: q159's batch sketch and q168's drained streaming
    * sketch produce the identical table. */
  private[queries] val cmsOracle: String =
    s"""WITH toks AS (
          SELECT unnest(string_split(text, ' ')) AS tok FROM documents
        ), tc AS (
          SELECT tok, count(*) AS n FROM toks WHERE len(tok) > 0 GROUP BY tok
        ), js AS (SELECT unnest(range(0, $D)) AS j),
        counters AS (
          SELECT j,
                 CAST(('0x' || substr(md5(concat(j, ':', tok)), 1, 8)) AS BIGINT) % $W AS b,
                 CAST(sum(n) AS BIGINT) AS c
          FROM tc CROSS JOIN js GROUP BY 1, 2
        ), keys AS (
          SELECT tok, n FROM (
            SELECT tok, n, row_number() OVER (ORDER BY n DESC, tok) AS rk FROM tc)
          WHERE rk <= 20
        )
        SELECT k.tok, k.n AS exact_n, min(c.c) AS cms_est,
               min(c.c) - k.n AS overcount
        FROM keys k CROSS JOIN js
        JOIN counters c
          ON c.j = js.j
         AND c.b = CAST(('0x' || substr(md5(concat(js.j, ':', k.tok)), 1, 8)) AS BIGINT) % $W
        GROUP BY k.tok, k.n
        ORDER BY exact_n DESC, tok"""

  // --------------------------------------------------------------------
  // KMV (k-minimum-values) distinct-count sketch — Bar-Yossef et al.
  // 2002 / Beyer et al. SIGMOD 2007. Hash every distinct element to a
  // 60-bit md5-derived integer, keep the k SMALLEST hashes (the
  // engine's bounded-heap aggregate — one O(n log k) scan, partial
  // heaps merged map-side, never a sort), and estimate the cardinality
  // as (k-1) / u_(k) where u_(k) is the k-th minimum normalized to
  // (0,1]. Hashes are md5-derived so both engines compute identical
  // sketches and the whole pipeline — per-group sketches, the merged
  // sketch, the theta-style set-operation estimates — is ORACLE-EXACT,
  // same as the q159 count-min.

  /** Sketch size. Standard error ≈ 1/√(k−2) ≈ 9% at k=128. */
  private[queries] val K = 128

  /** Engine-portable 60-bit element hash (the q148/q166 idiom: first
    * 15 md5 hex chars as an integer; both engines agree digit for
    * digit). */
  private def h60(e: String): String =
    s"cast(conv(substring(md5($e), 1, 15), 16, 10) AS bigint)"

  /** Distinct (scope, h) pairs over the part–supplier pair domain —
    * the one data-scaled exchange (map-side partial distinct); all
    * sketch work downstream is k-scaled. */
  private[queries] def pairHashes(li: DataFrame): DataFrame =
    li.select(
      col("l_returnflag").as("scope"),
      expr(h60("concat(cast(l_partkey AS string), ':', cast(l_suppkey AS string))")).as("h")
    ).distinct()

  /** The KMV estimate from a sketch of size m with k-th minimum kth:
    * a sketch smaller than K holds the whole set (estimate = exact
    * size); otherwise (K−1)·2⁶⁰/kth. The arithmetic is a single IEEE
    * double multiply + divide + floor, written identically in the
    * oracle so both engines round identically. */
  private def kmvEstExpr(m: String, kth: String): String =
    s"CASE WHEN $m < $K THEN cast($m AS bigint) " +
      s"ELSE cast(floor(${K - 1} * pow(2.0D, 60) / greatest($kth, cast(1 AS bigint))) AS bigint) END"

  /** Per-scope bottom-k sketches exploded back to (scope, h) rows —
    * the PERSISTABLE sketch form the streaming gate appends per
    * micro-batch (≤ k rows per scope per batch); partial sketches of
    * corpus slices merge by distinct-union + re-cut, landing on
    * exactly the whole-corpus sketch. */
  private[queries] def kmvSketchRows(dv: DataFrame): DataFrame =
    dv.groupBy("scope")
      .agg(expr(s"top_k_structs(struct(h), $K)").as("ks"))
      .select(col("scope"), explode(col("ks.h")).as("h"))

  /** The sketch-only KMV report from (scope, h) sketch rows: per-scope
    * k-th minimum + estimate, plus the 'MERGED' union-of-scopes row —
    * everything a sketch store can answer WITHOUT the base data (no
    * exact counts here; q192 reports those beside the estimates). */
  private[queries] def kmvReport(rows: DataFrame): DataFrame = {
    val per = rows
      .groupBy("scope")
      .agg(expr(s"top_k_structs(struct(h), $K)").as("ks"))
    val merged = per
      .select(explode(col("ks")).as("e"))
      .select(col("e.h").as("h"))
      .distinct()
      .groupBy()
      .agg(expr(s"top_k_structs(struct(h), $K)").as("ks"))
      .select(lit("MERGED").as("scope"), col("ks"))
    per
      .select(col("scope"), col("ks"))
      .unionByName(merged)
      .select(
        col("scope"),
        expr("element_at(ks.h, size(ks))").as("kth_h60"),
        expr(kmvEstExpr("size(ks)", "element_at(ks.h, size(ks))")).as("est_distinct")
      )
      .orderBy("scope")
  }

  /** Shared oracle for the sketch-only report shape (q199's drained
    * stream): per-scope + MERGED rows, no exact counts. */
  private[queries] lazy val kmvReportOracle: String =
    s"""WITH dv AS (
          SELECT DISTINCT l_returnflag AS scope, $kmvOracleHash AS h FROM lineitem),
        ranked AS (
          SELECT scope, h, row_number() OVER (PARTITION BY scope ORDER BY h) AS rk
          FROM dv),
        per AS (
          SELECT scope, max(h) AS kth_h60, count(*) AS m
          FROM ranked WHERE rk <= $K GROUP BY scope),
        msk AS (SELECT DISTINCT h FROM ranked WHERE rk <= $K),
        mranked AS (SELECT h, row_number() OVER (ORDER BY h) AS rk FROM msk),
        mall AS (
          SELECT 'MERGED' AS scope, max(h) AS kth_h60, count(*) AS m
          FROM mranked WHERE rk <= $K),
        u AS (SELECT * FROM per UNION ALL SELECT * FROM mall)
        SELECT scope, kth_h60, ${kmvOracleEst("m", "kth_h60")} AS est_distinct
        FROM u ORDER BY scope"""

  private val kmvOracleHash =
    "CAST(('0x' || substr(md5(CAST(l_partkey AS VARCHAR) || ':' || CAST(l_suppkey AS VARCHAR)), 1, 15)) AS BIGINT)"

  private def kmvOracleEst(m: String, kth: String): String =
    s"CASE WHEN $m < $K THEN CAST($m AS BIGINT) " +
      s"ELSE CAST(floor(${K - 1} * pow(2.0, 60) / greatest($kth, 1)) AS BIGINT) END"

  val defs: Seq[QueryDef] = Seq(
    // ------------------------------------------------------------------
    // E5 (approximate frequency, mergeable): count-min estimates for
    // the corpus's 20 most frequent tokens. The scale-correct plan:
    // exact per-token-TYPE counts first (map-side combine over the
    // token stream), then the d-way bucket expansion runs over the
    // type stream — vocabulary-scaled, never corpus-scaled — and
    // collapses to ≤ d·w counter rows. At 100 TB the only data-scaled
    // exchange is the one token-count groupBy every exact formulation
    // already pays; the sketch side costs O(|vocab|·d) more.
    QueryDef(
      "q159_count_min",
      (s, dir) => {
        val counts = tokenCounts(Tables(s, dir, "documents"))
        estimateTopK(counts, counterTable(counts))
      },
      Some(cmsOracle)
    ),

    // ------------------------------------------------------------------
    // E5 (approximate distinct, mergeable): KMV distinct-count
    // estimates for the part–supplier pair domain, per return flag
    // plus a direct global sketch ('ALL') AND a sketch MERGED from the
    // per-group sketches ('MERGED') — merging bottom-k sets and
    // re-cutting to k is exactly how per-partition / per-day sketches
    // roll up at 100 TB without touching the data again, and the
    // merged row must land on the same k-th minimum as the direct one
    // (bottom-k of a union is contained in the union of bottom-ks).
    // Plan: one distinct over (flag, pair) — the exchange the exact
    // count pays anyway — then bounded heaps; the merge step is
    // k·groups rows. ORACLE-EXACT, including the estimator arithmetic.
    QueryDef(
      "q192_kmv_distinct",
      (s, dir) => {
        val dv = pairHashes(Tables(s, dir, "lineitem")).cache()
        val per = dv
          .groupBy("scope")
          .agg(
            count(lit(1)).as("n_exact"),
            expr(s"top_k_structs(struct(h), $K)").as("ks")
          )
        val all = dv
          .select("h")
          .distinct()
          .groupBy()
          .agg(count(lit(1)).as("n_exact"), expr(s"top_k_structs(struct(h), $K)").as("ks"))
          .select(lit("ALL").as("scope"), col("n_exact"), col("ks"))
        // the merge path: union of the per-group bottom-k sets, re-cut
        // to k by the same bounded heap — k·groups input rows, and the
        // merged sketch does NOT know the exact count (NULL)
        val merged = per
          .select(explode(col("ks")).as("e"))
          .select(col("e.h").as("h"))
          .distinct()
          .groupBy()
          .agg(expr(s"top_k_structs(struct(h), $K)").as("ks"))
          .select(
            lit("MERGED").as("scope"),
            lit(null).cast("bigint").as("n_exact"),
            col("ks")
          )
        per
          .select(col("scope"), col("n_exact"), col("ks"))
          .unionByName(all)
          .unionByName(merged)
          .select(
            col("scope"),
            col("n_exact"),
            expr("element_at(ks.h, size(ks))").as("kth_h60"),
            expr(kmvEstExpr("size(ks)", "element_at(ks.h, size(ks))")).as("est_distinct")
          )
          .orderBy("scope")
      },
      Some(s"""WITH dv AS (
          SELECT DISTINCT l_returnflag AS scope, $kmvOracleHash AS h FROM lineitem),
        ranked AS (
          SELECT scope, h, row_number() OVER (PARTITION BY scope ORDER BY h) AS rk,
                 count(*) OVER (PARTITION BY scope) AS nx
          FROM dv),
        per AS (
          SELECT scope, CAST(max(nx) AS BIGINT) AS n_exact, max(h) AS kth_h60,
                 count(*) AS m
          FROM ranked WHERE rk <= $K GROUP BY scope),
        gd AS (SELECT DISTINCT h FROM dv),
        granked AS (
          SELECT h, row_number() OVER (ORDER BY h) AS rk, count(*) OVER () AS nx FROM gd),
        gall AS (
          SELECT 'ALL' AS scope, CAST(max(nx) AS BIGINT) AS n_exact, max(h) AS kth_h60,
                 count(*) AS m
          FROM granked WHERE rk <= $K),
        msk AS (SELECT DISTINCT h FROM ranked WHERE rk <= $K),
        mranked AS (SELECT h, row_number() OVER (ORDER BY h) AS rk FROM msk),
        mall AS (
          SELECT 'MERGED' AS scope, CAST(NULL AS BIGINT) AS n_exact, max(h) AS kth_h60,
                 count(*) AS m
          FROM mranked WHERE rk <= $K),
        u AS (SELECT * FROM per UNION ALL SELECT * FROM gall UNION ALL SELECT * FROM mall)
        SELECT scope, n_exact, kth_h60,
               ${kmvOracleEst("m", "kth_h60")} AS est_distinct
        FROM u ORDER BY scope""")
    ),

    // ------------------------------------------------------------------
    // E5 (theta-style set operations over KMV sketches — Beyer et al.
    // 2007 §4): cardinality estimates for A = pairs returned as 'A',
    // B = pairs returned as 'R', their UNION (merge the two sketches,
    // re-cut to k) and their INTERSECTION (the fraction ρ of the union
    // sketch's k minima present in BOTH input sketches scales the
    // union estimate: |A∩B| ≈ ρ·|A∪B|) — the estimator that answers
    // "how much would corpus A add to corpus B" without ever joining
    // the corpora. Plan: one distinct + one aggregate with FILTERed
    // bounded heaps (both sketches in a single exchange-free pass over
    // the distinct pairs); every set operation downstream is pure
    // k-sized array arithmetic on one row. Exact counts ride the same
    // aggregate for side-by-side error reading. ORACLE-EXACT.
    QueryDef(
      "q193_kmv_set_ops",
      (s, dir) => {
        val el = pairHashes(Tables(s, dir, "lineitem"))
          .filter(col("scope").isin("A", "R"))
        val row = el
          .groupBy()
          .agg(
            expr(s"top_k_structs(struct(h), $K) FILTER (WHERE scope = 'A')").as("ka"),
            expr(s"top_k_structs(struct(h), $K) FILTER (WHERE scope = 'R')").as("kb"),
            expr("count(CASE WHEN scope = 'A' THEN 1 END)").as("n_exact_a"),
            expr("count(CASE WHEN scope = 'R' THEN 1 END)").as("n_exact_b"),
            countDistinct(col("h")).as("n_exact_union")
          )
          // merge = union of the two bottom-k sets, re-cut to k; all
          // arrays here are ≤ k elements on a single row
          .withColumn("uh", expr(s"slice(array_sort(array_distinct(concat(ka.h, kb.h))), 1, $K)"))
          .withColumn("kth_u", expr("element_at(uh, size(uh))"))
          .withColumn(
            "n_both",
            expr("size(array_intersect(array_intersect(uh, ka.h), kb.h))")
          )
        row.select(
          col("n_exact_a"),
          col("n_exact_b"),
          col("n_exact_union"),
          (col("n_exact_a") + col("n_exact_b") - col("n_exact_union")).as("n_exact_inter"),
          expr(kmvEstExpr("size(ka)", "element_at(ka.h, size(ka))")).as("est_a"),
          expr(kmvEstExpr("size(kb)", "element_at(kb.h, size(kb))")).as("est_b"),
          expr(kmvEstExpr("size(uh)", "kth_u")).as("est_union"),
          expr(
            s"CASE WHEN size(uh) < $K THEN cast(n_both AS bigint) " +
              s"ELSE cast(floor(n_both * (${K - 1} * pow(2.0D, 60) / greatest(kth_u, cast(1 AS bigint))) / $K) AS bigint) END"
          ).as("est_inter")
        )
      },
      Some(s"""WITH el AS (
          SELECT DISTINCT l_returnflag AS flag, $kmvOracleHash AS h
          FROM lineitem WHERE l_returnflag IN ('A', 'R')),
        ka AS (SELECT h FROM (
                 SELECT h, row_number() OVER (ORDER BY h) AS rk FROM el WHERE flag = 'A')
               WHERE rk <= $K),
        kb AS (SELECT h FROM (
                 SELECT h, row_number() OVER (ORDER BY h) AS rk FROM el WHERE flag = 'R')
               WHERE rk <= $K),
        uh AS (SELECT h FROM (
                 SELECT h, row_number() OVER (ORDER BY h) AS rk
                 FROM (SELECT DISTINCT h FROM (SELECT h FROM ka UNION ALL SELECT h FROM kb)))
               WHERE rk <= $K),
        st AS (SELECT
          (SELECT count(*) FROM el WHERE flag = 'A') AS n_exact_a,
          (SELECT count(*) FROM el WHERE flag = 'R') AS n_exact_b,
          (SELECT count(DISTINCT h) FROM el) AS n_exact_union,
          (SELECT count(*) FROM ka) AS m_a, (SELECT max(h) FROM ka) AS kth_a,
          (SELECT count(*) FROM kb) AS m_b, (SELECT max(h) FROM kb) AS kth_b,
          (SELECT count(*) FROM uh) AS m_u, (SELECT max(h) FROM uh) AS kth_u,
          (SELECT count(*) FROM uh
           WHERE h IN (SELECT h FROM ka) AND h IN (SELECT h FROM kb)) AS n_both)
        SELECT n_exact_a, n_exact_b, n_exact_union,
               n_exact_a + n_exact_b - n_exact_union AS n_exact_inter,
               ${kmvOracleEst("m_a", "kth_a")} AS est_a,
               ${kmvOracleEst("m_b", "kth_b")} AS est_b,
               ${kmvOracleEst("m_u", "kth_u")} AS est_union,
               CASE WHEN m_u < $K THEN CAST(n_both AS BIGINT)
                    ELSE CAST(floor(n_both * (${K - 1} * pow(2.0, 60) / greatest(kth_u, 1)) / $K) AS BIGINT) END
                 AS est_inter
        FROM st""")
    ),

    // ------------------------------------------------------------------
    // MOMENTS SKETCH (round 14, Gan et al. VLDB'18's premise): the
    // power sums Σc^k (k ≤ 4) are the CHEAPEST mergeable distribution
    // summary — per-shard partials merge by plain addition, so the
    // shuffle carries ≤ |types|×|shards| rows of 5 numbers no matter
    // the corpus size, and re-aggregating a 100 TB table into regional
    // sketches then a global one costs one tiny second-level sum (the
    // two-level plan here materializes exactly that merge). Unusually
    // for a sketch, everything is ORACLE-EXACT: cents are integers,
    // the square is the LAST 64-bit product (c³/c⁴ widen through
    // DECIMAL(38,0)/HUGEINT — q56's discipline; ANSI mode makes any
    // violation loud), and the derived shape statistics — mean, stddev,
    // SKEWNESS, EXCESS KURTOSIS, the two moments q56 stops short of —
    // are one textually identical double sequence over those exact
    // integers, floored at milli/micro precision.
    QueryDef(
      "q301_moments_sketch",
      (s, dir) => {
        val typed = Tables(s, dir, "events")
          .select(
            col("event_type"),
            (col("event_id") % 4).as("shard"),
            expr("CAST(round(value * 100) AS BIGINT)").as("c")
          )
        momentStats(momentPartials(typed, Seq(col("event_type"), col("shard"))))
          .orderBy("event_type")
      },
      Some(momentsOracleSql)
    )
  )

  /** Partial power sums over `(event_type, c)` rows — the mergeable
    * sketch state. q301 keys by (event_type, shard) for the explicit
    * two-level merge; the live twin calls it per micro-batch keyed by
    * event_type alone and merges across batch rows instead. */
  private[queries] def momentPartials(
      typed: DataFrame,
      keys: Seq[org.apache.spark.sql.Column]
  ): DataFrame =
    typed
      .groupBy(keys: _*)
      .agg(
        count(lit(1)).as("n"),
        sum("c").as("s1"),
        // widen at c²: c³/c⁴ overflow BIGINT once cents pass ~2×10⁶/55k
        // (the sf0.1 tail already crosses the c⁴ line — caught by the
        // three-scale gate), so the square is the last 64-bit product
        sum(expr("CAST(c * c AS DECIMAL(38,0))")).as("s2"),
        sum(expr("CAST(c * c AS DECIMAL(38,0)) * c")).as("s3"),
        sum(expr("CAST(c * c AS DECIMAL(38,0)) * CAST(c * c AS DECIMAL(38,0))")).as("s4")
      )

  /** Merge partial sketch rows (by addition — the sketch's whole
    * point) and derive the shape statistics with the shared double
    * sequence. */
  private[queries] def momentStats(partials: DataFrame): DataFrame =
    partials
      .groupBy("event_type")
      .agg(
        sum("n").as("n"),
        sum("s1").as("s1"),
        sum("s2").as("s2"),
        sum("s3").as("s3"),
        sum("s4").as("s4")
      )
      .withColumn("m1", expr("CAST(s1 AS DOUBLE) / n"))
      .withColumn("m2", expr("CAST(s2 AS DOUBLE) / n"))
      .withColumn("m3", expr("CAST(s3 AS DOUBLE) / n"))
      .withColumn("m4", expr("CAST(s4 AS DOUBLE) / n"))
      .withColumn("v", expr("m2 - m1 * m1"))
      .withColumn("c3", expr("m3 - 3e0 * m1 * m2 + 2e0 * m1 * m1 * m1"))
      .withColumn(
        "c4",
        expr("m4 - 4e0 * m1 * m3 + 6e0 * m1 * m1 * m2 - 3e0 * m1 * m1 * m1 * m1")
      )
      .select(
        col("event_type"),
        col("n"),
        col("s1"),
        expr("CAST(floor(m1 * 1000e0) AS BIGINT)").as("mean_milli_c"),
        expr("CAST(floor(sqrt(v) * 1000e0) AS BIGINT)").as("std_milli_c"),
        expr("CAST(floor(c3 / power(v, 15e-1) * 1000000e0) AS BIGINT)").as("skew_micros"),
        expr("CAST(floor((c4 / (v * v) - 3e0) * 1000000e0) AS BIGINT)").as("kurt_micros")
      )

  /** Shared by q301 and its live twin q302 — the drained stream's
    * merged sketch must hash-match the same SQL. */
  private[queries] lazy val momentsOracleSql: String =
    """WITH part AS (
        SELECT event_type, event_id % 4 AS shard,
               count(*) AS n,
               sum(CAST(round(value * 100) AS BIGINT)) AS s1,
               sum(CAST(CAST(round(value * 100) AS BIGINT) * CAST(round(value * 100) AS BIGINT) AS HUGEINT)) AS s2,
               sum(CAST(CAST(round(value * 100) AS BIGINT) * CAST(round(value * 100) AS BIGINT) AS HUGEINT) * CAST(round(value * 100) AS BIGINT)) AS s3,
               sum(CAST(CAST(round(value * 100) AS BIGINT) * CAST(round(value * 100) AS BIGINT) AS HUGEINT)
                   * CAST(CAST(round(value * 100) AS BIGINT) * CAST(round(value * 100) AS BIGINT) AS HUGEINT)) AS s4
        FROM events GROUP BY 1, 2),
      m AS (
        SELECT event_type, CAST(sum(n) AS BIGINT) AS n, CAST(sum(s1) AS BIGINT) AS s1,
               sum(s2) AS s2, sum(s3) AS s3, sum(s4) AS s4
        FROM part GROUP BY 1),
      d AS (
        SELECT event_type, n, s1,
               CAST(s1 AS DOUBLE) / n AS m1,
               CAST(s2 AS DOUBLE) / n AS m2,
               CAST(s3 AS DOUBLE) / n AS m3,
               CAST(s4 AS DOUBLE) / n AS m4
        FROM m),
      c AS (
        SELECT event_type, n, s1, m1,
               m2 - m1 * m1 AS v,
               m3 - 3e0 * m1 * m2 + 2e0 * m1 * m1 * m1 AS c3,
               m4 - 4e0 * m1 * m3 + 6e0 * m1 * m1 * m2 - 3e0 * m1 * m1 * m1 * m1 AS c4
        FROM d)
      SELECT event_type, n, s1,
             CAST(floor(m1 * 1000e0) AS BIGINT) AS mean_milli_c,
             CAST(floor(sqrt(v) * 1000e0) AS BIGINT) AS std_milli_c,
             CAST(floor(c3 / power(v, 15e-1) * 1000000e0) AS BIGINT) AS skew_micros,
             CAST(floor((c4 / (v * v) - 3e0) * 1000000e0) AS BIGINT) AS kurt_micros
      FROM c ORDER BY event_type"""
}
