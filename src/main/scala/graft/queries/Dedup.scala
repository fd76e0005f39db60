package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Near-duplicate detection over `documents` (SURVEY.md §2.3 E11-E12 +
  * the training-data-pipeline brief): exact n-gram Jaccard with
  * candidate pruning, MinHash-LSH, and SimHash. Exact dedup lives in
  * Relational (q19/q20).
  *
  * 100 TB posture shared by all three: NEVER an all-pairs comparison.
  * Candidate pairs come from equi-joins on discriminative keys
  * (rare shingles / LSH band buckets / SimHash bands), so the quadratic
  * blow-up is bounded per key; the document-frequency cap on shingles
  * doubles as hot-key (skew) removal — precisely the keys AQE's skew
  * split would otherwise struggle with.
  *
  * Cache ownership: the `.cache()` calls in these builders exist to
  * dedupe plan BRANCHES within one execution (the shingle index / band
  * table feeds a size filter and both self-join sides). The builders
  * are lazy, so they cannot unpersist after the action; callers that
  * execute these plans in a long-lived session own the cleanup — the
  * Bench/Verify harnesses sweep `catalog.clearCache()` + persistent
  * RDDs between queries, and GraftSession's 1-minute periodic GC
  * bounds anything a caller forgets.
  */
object Dedup {

  /** ≥3-token docs with their word arrays. */
  private def tok(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
      .filter(size(split(col("text"), " ")) >= 3)
      .select(col("doc_id"), split(col("text"), " ").as("ws"))

  /** Distinct word-3-gram shingles, one row per (doc, shingle). */
  private def shingleRows(s: SparkSession, dir: String): DataFrame =
    tok(s, dir)
      .select(
        col("doc_id"),
        explode(
          expr("transform(sequence(1, size(ws)-2), i -> concat_ws(' ', slice(ws, i, 3)))")
        ).as("g")
      )
      .distinct()

  /** Distinct word-5-gram shingles (contamination screening granularity). */
  private def shingle5Rows(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
      .filter(size(split(col("text"), " ")) >= 5)
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .select(
        col("doc_id"),
        explode(
          expr("transform(sequence(1, size(ws)-4), i -> concat_ws(' ', slice(ws, i, 5)))")
        ).as("g")
      )
      .distinct()

  /** The q35 near-dup pair graph (exact Jaccard ≥ threshold over rare
    * 3-gram shingle sets) — shared by the pair query and the cluster
    * query so both stay oracle-reproducible from the same definition.
    */
  private def jaccardPairs(s: SparkSession, dir: String, minJaccard: Double): DataFrame = {
    val sh = shingleRows(s, dir)
    val rare = sh
      .groupBy("g")
      .agg(count(lit(1)).as("df"))
      .filter(col("df") >= 2 && col("df") <= 50)
      .select("g")
    val shr = sh.join(rare, Seq("g")).cache()
    val sz = shr.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val pairs = shr
      .as("a")
      .join(shr.as("b"), col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .agg(count(lit(1)).as("shared"))
    pairs
      .join(sz.as("s1"), col("d1") === col("s1.doc_id"))
      .join(sz.as("s2"), col("d2") === col("s2.doc_id"))
      .select(
        col("d1"),
        col("d2"),
        (col("shared").cast("double") / (col("s1.n") + col("s2.n") - col("shared")))
          .as("jaccard")
      )
      .filter(col("jaccard") >= minJaccard)
  }

  /** The Jaccard threshold shared by the pair query, the cluster query,
    * and (interpolated) both DuckDB oracles — one knob, no drift. */
  private val PairMinJaccard = 0.5

  /** The q35 pair CTE chain as DuckDB SQL — prefix for oracles that
    * consume the pair graph. Threshold interpolated from the same
    * constant the Spark side passes to jaccardPairs. */
  private def pairSql: String = s"""tok AS (
          SELECT doc_id, string_split(text, ' ') AS ws FROM documents
          WHERE len(string_split(text, ' ')) >= 3
        ), sh AS (
          SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS g
          FROM (SELECT doc_id, ws, unnest(range(1, len(ws)-1)) AS i FROM tok)
        ), rare AS (
          SELECT g FROM (SELECT g, count(*) AS df FROM sh GROUP BY g)
          WHERE df >= 2 AND df <= 50
        ), shr AS (
          SELECT sh.doc_id, sh.g FROM sh JOIN rare USING (g)
        ), sz AS (
          SELECT doc_id, count(*) AS n FROM shr GROUP BY doc_id
        ), rawpairs AS (
          SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS shared
          FROM shr a JOIN shr b ON a.g = b.g AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        ), pairs AS (
          SELECT d1, d2,
                 CAST(shared AS DOUBLE) / (s1.n + s2.n - shared) AS jaccard
          FROM rawpairs
          JOIN sz s1 ON s1.doc_id = d1
          JOIN sz s2 ON s2.doc_id = d2
          WHERE CAST(shared AS DOUBLE) / (s1.n + s2.n - shared) >= $PairMinJaccard
        )"""

  /** Per-doc distinct shingle SET as an array column (for verification
    * joins). */
  private def shingleSets(s: SparkSession, dir: String): DataFrame =
    tok(s, dir)
      .select(
        col("doc_id"),
        array_distinct(
          expr("transform(sequence(1, size(ws)-2), i -> concat_ws(' ', slice(ws, i, 3)))")
        ).as("sh")
      )

  val defs: Seq[QueryDef] = Seq(
    // ------------------------------------------------------------------
    // E12 (exact variant): n-gram Jaccard near-dup detection, candidate
    // pairs from a self-join on DISCRIMINATIVE shingles only (document
    // frequency in [2, 50]): df=1 shingles can't produce a pair; df>50
    // shingles are stop-shingle hot keys whose join groups explode
    // quadratically at scale. Jaccard is computed over the same rare-
    // shingle sets, so the DuckDB oracle reproduces it exactly.
    QueryDef(
      "q35_ngram_jaccard",
      // jaccardPairs materializes the filtered shingle index ONCE
      // (narrow doc_id+g rows): it feeds the size table and both sides
      // of the pair self-join — without it the corpus explode re-runs
      // per branch (8 Generate nodes in the static plan)
      (s, dir) => jaccardPairs(s, dir, PairMinJaccard).orderBy("d1", "d2"),
      // ONE DuckDB restatement of the pair definition (pairSql) is
      // shared by this oracle and q67's — the Spark side is shared via
      // jaccardPairs, so the SQL must not fork either
      Some(s"WITH $pairSql SELECT d1, d2, jaccard FROM pairs ORDER BY d1, d2")
    ),

    // ------------------------------------------------------------------
    // E12: MinHash + banded LSH. 32 hashes (xxhash64 seeded per slot),
    // 8 bands × 4 rows; candidates = docs sharing a band bucket;
    // survivors verified with exact Jaccard on the shingle sets. For a
    // pair with true Jaccard j the detection probability is
    // 1-(1-j^4)^8 (≈0.9998 at j=0.9, ≈0.04 at j=0.2) — deterministic
    // here because the hash family is fixed. No SQL oracle (hash family
    // is engine-defined); DedupSpec checks recall against q35's truth.
    //
    // The signature is computed as 32 MIN aggregates over exploded
    // (doc, shingle) rows — one pass, map-side partial aggregation, and
    // the agg boundary materializes the signature so downstream band
    // expressions can't re-inline (a nested transform(array_min(...))
    // formulation gets re-evaluated per band reference by
    // ProjectCollapse: measured 60× slower at sf0.1). Band buckets with
    // >100 docs are dropped — non-discriminative hot keys whose join
    // groups grow quadratically.
    QueryDef(
      "q36_minhash_lsh",
      (s, dir) => {
        val sets = shingleSets(s, dir)
        val slotMins = (0 until 32).map(i =>
          min(xxhash64(concat(lit(s"${i}_"), col("g")))).as(s"h$i")
        )
        val sig = shingleRows(s, dir)
          .groupBy("doc_id")
          .agg(slotMins.head, slotMins.tail: _*)
          .select(col("doc_id"), array((0 until 32).map(i => col(s"h$i")): _*).as("sig"))
        val bands = sig
          .select(
            col("doc_id"),
            explode(
              expr("transform(sequence(0, 7), b -> struct(b AS band, slice(sig, b*4 + 1, 4) AS key))")
            ).as("bucket")
          )
          // one materialization feeds the bucket-size filter and both
          // self-join sides — the 32-aggregate signature pass runs once
          .cache()
        val coldBuckets = bands
          .groupBy("bucket")
          .agg(count(lit(1)).as("bn"))
          .filter(col("bn") <= 100)
          .select("bucket")
        val pruned = bands.join(coldBuckets, Seq("bucket"))
        val cand = pruned
          .as("a")
          .join(
            pruned.as("b"),
            col("a.bucket") === col("b.bucket") && col("a.doc_id") < col("b.doc_id")
          )
          .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
          .distinct()
        cand
          .join(sets.select(col("doc_id").as("d1"), col("sh").as("sh1")), Seq("d1"))
          .join(sets.select(col("doc_id").as("d2"), col("sh").as("sh2")), Seq("d2"))
          // materialize the intersection size once — referencing
          // array_intersect twice in one projection evaluates it twice
          .select(
            col("d1"),
            col("d2"),
            size(col("sh1")).as("n1"),
            size(col("sh2")).as("n2"),
            size(array_intersect(col("sh1"), col("sh2"))).as("inter")
          )
          .select(
            col("d1"),
            col("d2"),
            (col("inter").cast("double") / (col("n1") + col("n2") - col("inter"))).as("jaccard")
          )
          // same near-dup threshold as the exact pair graph, so q36's
          // recall spec compares like against like
          .filter(col("jaccard") >= PairMinJaccard)
          .orderBy("d1", "d2")
      },
      None
    ),

    // ------------------------------------------------------------------
    // E12: SimHash — 64-bit signature from per-token bit votes, banded
    // into 4×16-bit keys for candidate generation, Hamming-distance
    // verified with bit_count(xor).
    //
    // Votes are 64 SUM aggregates over exploded (doc, tokenhash) rows —
    // one pass with map-side partial agg; the agg boundary materializes
    // the votes (the nested aggregate/zip_with formulation was
    // re-evaluated 64× per row by ProjectCollapse — 455s at sf0.1 vs
    // ~2s for this plan). Token-soup corpora produce CORRELATED
    // signatures, so 16-bit band buckets genuinely run hot; buckets
    // with >100 docs are dropped as non-discriminative (same hot-key
    // rule as the shingle df cap).
    QueryDef(
      "q37_simhash_pairs",
      (s, dir) => {
        val toks = Tables(s, dir, "documents")
          .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
          .select(col("doc_id"), xxhash64(col("t")).as("h"))
        val voteCols = (0 until 64).map(i =>
          sum(when(expr(s"shiftright(h, $i) & 1") === 1, 1L).otherwise(-1L)).as(s"v$i")
        )
        val simhash = (0 until 64)
          .map(i => when(col(s"v$i") > 0, lit(1L << i)).otherwise(lit(0L)))
          .reduce(_ bitwiseOR _)
        val sigs = toks
          .groupBy("doc_id")
          .agg(voteCols.head, voteCols.tail: _*)
          .select(col("doc_id"), simhash.as("simhash"))
        val bands = sigs
          .select(
            col("doc_id"),
            col("simhash"),
            explode(
              expr("""transform(sequence(0, 3), b ->
                        struct(b AS band, shiftright(simhash, b * 16) & 65535 AS key))""")
            ).as("bucket")
          )
          // one materialization of the 64-vote signature pass
          .cache()
        val coldBuckets = bands
          .groupBy("bucket")
          .agg(count(lit(1)).as("bn"))
          .filter(col("bn") <= 100)
          .select("bucket")
        val pruned = bands.join(coldBuckets, Seq("bucket"))
        pruned
          .as("a")
          .join(
            pruned.as("b"),
            col("a.bucket") === col("b.bucket") && col("a.doc_id") < col("b.doc_id")
          )
          .select(
            col("a.doc_id").as("d1"),
            col("b.doc_id").as("d2"),
            expr("bit_count(a.simhash ^ b.simhash)").cast("long").as("hamming")
          )
          .distinct()
          .filter(col("hamming") <= 6)
          .orderBy("d1", "d2")
      },
      None
    ),

    // ------------------------------------------------------------------
    // E12 (clustering step): near-dup pairs → duplicate CLUSTERS via
    // connected components (min-label propagation, graft.operators
    // .ConnectedComponents), plus canonical selection — the actual
    // output a dedup pipeline keeps: one representative per cluster.
    // cluster_id = smallest doc_id in the component, is_canonical marks
    // the doc a 100 TB pipeline would retain. Oracle: DuckDB recursive
    // CTE computing min reachable id over the same pair graph.
    QueryDef(
      "q67_dedup_clusters",
      (s, dir) => {
        val pairs = jaccardPairs(s, dir, PairMinJaccard)
        graft.operators.ConnectedComponents
          .label(pairs, "d1", "d2")
          .select(
            col("id").as("doc_id"),
            col("label").as("cluster_id"),
            (col("id") === col("label")).as("is_canonical")
          )
          .orderBy("cluster_id", "doc_id")
      },
      Some(s"""WITH RECURSIVE $pairSql, edges AS (
          SELECT d1 AS a, d2 AS b FROM pairs
          UNION ALL
          SELECT d2 AS a, d1 AS b FROM pairs
        ), reach AS (
          SELECT DISTINCT a AS id, a AS r FROM edges
          UNION
          SELECT reach.id, e.b AS r FROM reach JOIN edges e ON reach.r = e.a
        )
        SELECT id AS doc_id, min(r) AS cluster_id,
               (id = min(r)) AS is_canonical
        FROM reach GROUP BY id
        ORDER BY cluster_id, doc_id""")
    ),

    // ------------------------------------------------------------------
    // Decontamination screen (training-data pipeline): which training
    // docs share a 5-gram with the held-out eval set (doc_id % 20 = 0)?
    // Candidate pairs come from an equi-join on the shared gram — never
    // all-pairs; grams held by > 100 docs are dropped first (boilerplate
    // n-grams, the standard decontamination rule, and exactly the hot
    // join keys that blow up group sizes at scale).
    QueryDef(
      "q68_contamination",
      (s, dir) => {
        val g5 = shingle5Rows(s, dir)
        val keep = g5
          .groupBy("g")
          .agg(count(lit(1)).as("df"))
          .filter(col("df") <= 100)
          .select("g")
        val g5r = g5.join(keep, Seq("g")).cache()
        val evalSide = g5r
          .filter(col("doc_id") % 20 === 0)
          .select(col("g"), col("doc_id").as("eval_id"))
        g5r
          .filter(col("doc_id") % 20 =!= 0)
          .join(evalSide, Seq("g"))
          .groupBy("doc_id")
          .agg(
            countDistinct(col("g")).as("shared_grams"),
            countDistinct(col("eval_id")).as("eval_docs")
          )
          .orderBy("doc_id")
      },
      Some("""WITH tok5 AS (
          SELECT doc_id, string_split(text, ' ') AS ws FROM documents
          WHERE len(string_split(text, ' ')) >= 5
        ), g5 AS (
          SELECT DISTINCT doc_id,
                 ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' || ws[i+4] AS g
          FROM (SELECT doc_id, ws, unnest(range(1, len(ws)-3)) AS i FROM tok5)
        ), keep AS (
          SELECT g FROM (SELECT g, count(*) AS df FROM g5 GROUP BY g) WHERE df <= 100
        ), g5r AS (
          SELECT g5.doc_id, g5.g FROM g5 JOIN keep USING (g)
        )
        SELECT t.doc_id,
               count(DISTINCT t.g) AS shared_grams,
               count(DISTINCT e.doc_id) AS eval_docs
        FROM g5r t
        JOIN g5r e ON t.g = e.g
        WHERE t.doc_id % 20 <> 0 AND e.doc_id % 20 = 0
        GROUP BY t.doc_id
        ORDER BY t.doc_id""")
    )
  )
}
