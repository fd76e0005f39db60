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
    )
  )
}
