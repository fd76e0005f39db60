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
  * Materialization ownership: the `.localCheckpoint()` calls in these
  * builders dedupe plan BRANCHES within one execution (the per-shingle
  * doc lists feed the size table and the pair expansion; the SimHash
  * signature table feeds the band explode and both hamming join-backs).
  * They are EAGER on purpose — the downstream exchanges are submitted
  * by AQE as concurrent jobs, and a lazy `.cache()` gets recomputed by
  * every racer before one wins the block store (measured 3× scan cost
  * on q35). The builders cannot unpersist after the action; callers
  * that execute these plans in a long-lived session own the cleanup —
  * the Bench/Verify harnesses sweep persistent RDDs between queries,
  * and GraftSession's 1-minute periodic GC bounds anything a caller
  * forgets.
  */
object Dedup {

  /** Word-3-gram shingle rows, one row per (doc, DISTINCT shingle).
    * Deduplication is LOCAL — inside the `word_shingles` evaluation,
    * before the explode — so it costs no exchange (a global
    * `.distinct()` is a full shuffle of the exploded index) yet still
    * shrinks the stream 2-3× on repetitive corpora before any
    * aggregation sees it (measured: the raw-occurrence stream made q35
    * 2× slower end to end). Every consumer needs per-doc-distinct or
    * duplicate-insensitive semantics (doc lists, MIN-based MinHash
    * slots), so local dedup is both the cheap and the correct
    * granularity. `word_shingles` (graft.functions.WordShingles) is the
    * codegen replacement for the interpreted HOF chain
    * array_distinct(transform(sequence, i -> concat_ws(slice(ws,i,n))))
    * — bit-identical output, one byte-scan per doc (ShinglesSpec pins
    * the equivalence); docs with <3 words yield an empty array, which
    * `explode` drops, so no pre-filter scan is needed. */
  /** The raw doc stream, spread across the session's full parallelism.
    * The explicit round-robin repartition decouples CPU parallelism
    * from FILE layout: a corpus delivered as few (or few large) parquet
    * files scans as few splits, which would run the expensive
    * explode+aggregate stages of the dedup family nearly single-
    * threaded (measured: the whole q35 scan stage on 1 task). The
    * shuffled payload is the narrow (id, text) stream — cheap relative
    * to the CPU it unlocks; on a well-split 100 TB input AQE coalesces
    * the exchange instead of it hurting. */
  private def docsWide(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
      .select(col("doc_id"), col("text"))
      .repartition(s.sparkContext.defaultParallelism)

  private def shingleRows(s: SparkSession, dir: String): DataFrame =
    docsWide(s, dir)
      .select(col("doc_id"), explode(expr("word_shingles(text, 3)")).as("g"))

  /** In-group ordered pair expansion over a sorted `docs` array: all
    * (d1, d2) with d1 < d2 — the replacement for a self-join on the
    * group key once groups are df-capped. */
  private val PairExpand =
    "flatten(transform(docs, (x, i) -> " +
      "transform(slice(docs, i + 2, size(docs)), y -> named_struct('d1', x, 'd2', y))))"

  /** Word-5-gram shingle rows, per-doc-distinct inside the same native
    * `word_shingles` scan (contamination screening granularity). */
  private def shingle5Rows(s: SparkSession, dir: String): DataFrame =
    docsWide(s, dir)
      .select(col("doc_id"), explode(expr("word_shingles(text, 5)")).as("g"))

  /** The q35 near-dup pair graph (exact Jaccard ≥ threshold over rare
    * 3-gram shingle sets) — shared by the pair query and the cluster
    * query so both stay oracle-reproducible from the same definition.
    */
  private def jaccardPairs(s: SparkSession, dir: String, minJaccard: Double): DataFrame = {
    // Per-shingle doc lists in ONE exchange of the (per-doc-distinct)
    // exploded index: `distinct_up_to` (graft.functions.DistinctUpTo)
    // dedups in the aggregation buffer, returns the sorted doc list,
    // and poisons to NULL past 50 distinct docs — so the df ∈ [2, 50]
    // rule costs a single groupBy with O(cap) state per shingle. The r5
    // formulation (global distinct pass + df groupBy + semi join +
    // self-join) paid three full-index exchanges for the same pairs;
    // hot stop-shingles now never materialize their doc groups at all
    // (overflow short-circuits map-side).
    val grouped = shingleRows(s, dir)
      .groupBy("g")
      .agg(expr("distinct_up_to(doc_id, 50)").as("docs"))
      .filter(col("docs").isNotNull && size(col("docs")) >= 2)
      // one EAGER materialization feeds the per-doc size table (read by
      // two join branches) and the pair expansion. A lazy `.cache()` is
      // not enough here: AQE submits those three downstream exchanges as
      // CONCURRENT jobs, and concurrent tasks hitting a cold cache each
      // recompute the partition before one wins the store — the full
      // shingle explode+aggregate ran 3× (measured: stages 57/58/59 all
      // carried the scan's CPU). localCheckpoint materializes once,
      // up front, and every consumer reads the finished blocks.
      .localCheckpoint()
    val sz = grouped
      .select(explode(col("docs")).as("doc_id"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n"))
    val pairs = grouped
      // docs is sorted ascending, so expanding (i, j>i) positions gives
      // exactly the d1 < d2 pairs a self-join condition would produce
      .select(explode(expr(PairExpand)).as("p"))
      .groupBy(col("p.d1").as("d1"), col("p.d2").as("d2"))
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

  /** Incremental near-dup admission: every (new, old) doc pair at the
    * q35 exact-Jaccard definition, computed with the admission-control
    * plan — new-side shingles equi-join only the old side, so per-batch
    * cost is O(batch × df-capped fanout) and the corpus never pairs
    * with itself. The rare-shingle df ∈ [2, 50] rule runs over the
    * UNION so admission agrees with a full q35 re-run
    * (DedupPipelineSpec pins that equivalence). Shared by q146 (batch)
    * and q149 (the same check run live per micro-batch).
    */
  private[graft] def admissionPairs(
      oldDocs: DataFrame,
      newDocs: DataFrame,
      minJaccard: Double
  ): DataFrame = {
    def sh(df: DataFrame, isNew: Boolean) =
      df.select(col("doc_id"), explode(expr("word_shingles(text, 3)")).as("g"))
        .withColumn("is_new", lit(isNew))
    val all = sh(oldDocs, isNew = false).unionByName(sh(newDocs, isNew = true))
    val rare = all
      .groupBy("g")
      .agg(count(lit(1)).as("df"))
      .filter(col("df") >= 2 && col("df") <= 50)
      .select("g")
    // feeds the size table and both join sides — materialize once
    // (jaccardPairs' localCheckpoint rationale)
    val shr = all.join(rare, Seq("g")).localCheckpoint()
    val sz = shr.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val newSide = shr.filter(col("is_new")).select(col("doc_id").as("d_new"), col("g"))
    val oldSide = shr.filter(!col("is_new")).select(col("doc_id").as("d_old"), col("g"))
    newSide
      .join(oldSide, Seq("g"))
      .groupBy("d_new", "d_old")
      .agg(count(lit(1)).as("shared"))
      .join(sz.as("s1"), col("d_new") === col("s1.doc_id"))
      .join(sz.as("s2"), col("d_old") === col("s2.doc_id"))
      .select(
        col("d_new"),
        col("d_old"),
        (col("shared").cast("double") / (col("s1.n") + col("s2.n") - col("shared")))
          .as("jaccard")
      )
      .filter(col("jaccard") >= minJaccard)
      .orderBy("d_new", "d_old")
  }

  /** The Jaccard threshold shared by the pair query, the cluster query,
    * and (interpolated) both DuckDB oracles — one knob, no drift. */
  private[graft] val PairMinJaccard = 0.5

  /** The admission-verdict semantics shared by q146 (from-scratch
    * recompute), q149 (live), and q190 (index-served): new-vs-old
    * pairs of the q35 pair graph. Lazy — declared after `defs` would
    * otherwise capture null at object init. */
  private[queries] lazy val admissionOracle: String =
    s"""WITH $pairSql
        SELECT CASE WHEN d1 % 5 = 4 THEN d1 ELSE d2 END AS d_new,
               CASE WHEN d1 % 5 = 4 THEN d2 ELSE d1 END AS d_old,
               jaccard
        FROM pairs WHERE (d1 % 5 = 4) <> (d2 % 5 = 4)
        ORDER BY d_new, d_old"""

  /** q203's oracle: the admission verdict over the corpus MINUS the
    * erased subjects (index-side %29==3 docs forgotten; the incoming
    * batch is not subject to erasure) — the from-scratch restatement
    * of what the tombstone + negative-df-segment serving path must
    * equal. */
  private[queries] lazy val erasedAdmissionOracle: String =
    s"""WITH corpus AS (
          SELECT * FROM documents WHERE doc_id % 5 = 4 OR doc_id % 29 <> 3
        ), ${pairSqlOver("corpus")}
        SELECT CASE WHEN d1 % 5 = 4 THEN d1 ELSE d2 END AS d_new,
               CASE WHEN d1 % 5 = 4 THEN d2 ELSE d1 END AS d_old,
               jaccard
        FROM pairs WHERE (d1 % 5 = 4) <> (d2 % 5 = 4)
        ORDER BY d_new, d_old"""

  /** The q35 pair CTE chain as DuckDB SQL — prefix for oracles that
    * consume the pair graph. Threshold interpolated from the same
    * constant the Spark side passes to jaccardPairs. */
  private def pairSql: String = pairSqlOver("documents")

  /** Same CTE chain over an arbitrary source relation — q203's erasure
    * oracle restates admission over `documents` MINUS the erased set. */
  private def pairSqlOver(rel: String): String = s"""tok AS (
          SELECT doc_id, string_split(text, ' ') AS ws FROM $rel
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
    Tables(s, dir, "documents")
      .select(col("doc_id"), expr("word_shingles(text, 3)").as("sh"))

  /** The q36 MinHash-LSH candidate chain with exact-Jaccard
    * verification — shared by the pair query and the q130 pipeline so
    * both consume the identical pair graph. Band buckets are capped at
    * 100 docs (hot non-discriminative keys dropped); survivors are
    * verified with exact Jaccard on the full shingle sets, so the
    * output has NO false positives — only (deterministic,
    * hash-family-dependent) misses relative to q35's exact graph.
    */
  private def minhashVerifiedPairs(s: SparkSession, dir: String): DataFrame = {
    // eager materialization: `sets` is joined on BOTH sides of the
    // candidate verification (d1 and d2) — as two lazy plan
    // branches the tokenize+shingle scan would run twice
    val sets = shingleSets(s, dir).localCheckpoint()
    val sig = shingleRows(s, dir)
      .groupBy("doc_id")
      .agg(expr("minhash_sig(xxhash64(g))").as("sig"))
    // candidate pairs in ONE exchange of the band table:
    // distinct_up_to collects each bucket's doc list (sorted, NULL
    // past 100 docs = the hot-bucket cap), and the in-group
    // expansion replaces the bucket-count + semi-join + self-join
    // chain — a straight-line pipeline from signature to pairs
    val cand = sig
      .select(
        col("doc_id"),
        explode(
          expr("transform(sequence(0, 7), b -> struct(b AS band, slice(sig, b*4 + 1, 4) AS key))")
        ).as("bucket")
      )
      .groupBy("bucket")
      .agg(expr("distinct_up_to(doc_id, 100)").as("docs"))
      .filter(col("docs").isNotNull && size(col("docs")) >= 2)
      .select(explode(expr(PairExpand)).as("p"))
      .select(col("p.d1").as("d1"), col("p.d2").as("d2"))
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
  }

  /** End-to-end dedup pipeline, stage 3+4: verified near-dup pairs →
    * connected components (large-star/small-star — diameter-proof round
    * count) → ONE canonical doc per cluster by the shared q32 quality
    * score (tie-break asc doc_id, so the pick is total) → union with
    * the untouched singletons. Output is the KEPT-document set itself —
    * the thing a curation pipeline writes — with provenance: the
    * cluster the doc won (cluster_id = component min-label; the doc's
    * own id for singletons), how many docs it displaced, and its score.
    *
    * 100 TB shape: `labels` is cluster-member-sized (≪ corpus), so both
    * the quality join and the singleton anti-join are broadcast-able by
    * AQE; the canonical pick is one hash exchange on cluster_id + an
    * in-partition window — never a global sort; the quality table is
    * materialized once and read by both branches.
    */
  private[queries] def keepSet(docs: DataFrame, pairs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // one pass over the corpus computes quality; localCheckpoint (not
    // cache) because the two consumers below are concurrent AQE jobs —
    // see the materialization-ownership note in the object scaladoc
    val qual = docs
      .select(col("doc_id"), TextOps.qualityExpr.as("quality"))
      .localCheckpoint()
    val labels = graft.operators.ConnectedComponents
      .labelStar(pairs, "d1", "d2")
      .select(col("id"), col("label").as("cluster_id"))
    val clustered = labels
      .join(qual, labels("id") === qual("doc_id"))
      .select(col("doc_id"), col("cluster_id"), col("quality"))
    val csize = clustered.groupBy("cluster_id").agg(count(lit(1)).as("cluster_size"))
    val canon = clustered
      .withColumn(
        "rn",
        row_number().over(
          Window.partitionBy("cluster_id").orderBy(desc("quality"), asc("doc_id"))
        )
      )
      .filter(col("rn") === 1)
      .join(csize, Seq("cluster_id"))
      .select(col("doc_id"), col("cluster_id"), col("cluster_size"), col("quality"))
    val singles = qual
      .join(labels, qual("doc_id") === labels("id"), "left_anti")
      .select(
        col("doc_id"),
        col("doc_id").as("cluster_id"),
        lit(1L).as("cluster_size"),
        col("quality")
      )
    canon.unionByName(singles).orderBy("doc_id")
  }

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
      // jaccardPairs materializes the per-shingle doc lists ONCE: they
      // feed the size table and the pair expansion — without it the
      // corpus explode re-runs per branch
      (s, dir) => jaccardPairs(s, dir, PairMinJaccard).orderBy("d1", "d2"),
      // ONE DuckDB restatement of the pair definition (pairSql) is
      // shared by this oracle and q67's — the Spark side is shared via
      // jaccardPairs, so the SQL must not fork either
      Some(s"WITH $pairSql SELECT d1, d2, jaccard FROM pairs ORDER BY d1, d2")
    ),

    // ------------------------------------------------------------------
    // E12: MinHash + banded LSH. 32 hash slots, 8 bands × 4 rows;
    // candidates = docs sharing a band bucket; survivors verified with
    // exact Jaccard on the shingle sets. For a pair with true Jaccard j
    // the detection probability is 1-(1-j^4)^8 (≈0.9998 at j=0.9,
    // ≈0.04 at j=0.2) — deterministic here because the hash family is
    // fixed. No SQL oracle (hash family is engine-defined); DedupSpec
    // checks recall against q35's truth.
    //
    // The signature is one native `minhash_sig` aggregate
    // (graft.functions.MinHashSig) over exploded (doc, shingle) rows:
    // one xxhash64 per row + a 5-op mix per slot, single primitive
    // buffer, map-side partial aggregation — replacing 32 separate
    // MIN(xxhash64(concat(...))) aggregate columns that re-hashed the
    // shingle string 32×. The agg boundary materializes the signature
    // so downstream band expressions can't re-inline (a nested
    // transform(array_min(...)) formulation gets re-evaluated per band
    // reference by ProjectCollapse: measured 60× slower at sf0.1).
    // Band buckets with >100 docs are dropped — non-discriminative hot
    // keys whose join groups grow quadratically.
    QueryDef(
      "q36_minhash_lsh",
      (s, dir) => minhashVerifiedPairs(s, dir).orderBy("d1", "d2"),
      None
    ),

    // ------------------------------------------------------------------
    // E12: SimHash — 64-bit signature from per-token bit votes, banded
    // into 4×16-bit keys for candidate generation, Hamming-distance
    // verified with bit_count(xor).
    //
    // The signature is one native `simhash_agg` aggregate
    // (graft.functions.SimHashAgg) over exploded (doc, tokenhash) rows:
    // a 64-counter primitive buffer bumped in a tight loop per row,
    // map-side partial agg — replacing 64 SUM(CASE ...) aggregate
    // columns (bit-identical result: majority vote, ties → 0). The agg
    // boundary still materializes the signature (the nested
    // aggregate/zip_with formulation was re-evaluated 64× per row by
    // ProjectCollapse — 455s at sf0.1 vs ~2s). Token-soup corpora
    // produce CORRELATED signatures, so 16-bit band buckets genuinely
    // run hot; buckets with >100 docs are dropped as non-discriminative
    // (same hot-key rule as the shingle df cap).
    QueryDef(
      "q37_simhash_pairs",
      (s, dir) => {
        val toks = docsWide(s, dir)
          .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
          .select(col("doc_id"), xxhash64(col("t")).as("h"))
        // signature table feeds the band explode AND both hamming
        // join-backs — one EAGER materialization of the signature pass
        // (localCheckpoint, not cache: the three consumers are
        // concurrent AQE stage jobs, and a cold lazy cache is computed
        // by each racer — see jaccardPairs)
        val sigs = toks
          .groupBy("doc_id")
          .agg(expr("simhash_agg(h)").as("simhash"))
          .localCheckpoint()
        // candidate pairs in ONE exchange of the band table (same
        // distinct_up_to shape as q36); hamming re-attaches the two
        // signatures via narrow joins on the tiny per-doc sig table
        val cand = sigs
          .select(
            col("doc_id"),
            explode(
              expr("""transform(sequence(0, 3), b ->
                        struct(b AS band, shiftright(simhash, b * 16) & 65535 AS key))""")
            ).as("bucket")
          )
          .groupBy("bucket")
          .agg(expr("distinct_up_to(doc_id, 100)").as("docs"))
          .filter(col("docs").isNotNull && size(col("docs")) >= 2)
          .select(explode(expr(PairExpand)).as("p"))
          .select(col("p.d1").as("d1"), col("p.d2").as("d2"))
          .distinct()
        cand
          .join(sigs.select(col("doc_id").as("d1"), col("simhash").as("h1")), Seq("d1"))
          .join(sigs.select(col("doc_id").as("d2"), col("simhash").as("h2")), Seq("d2"))
          .select(
            col("d1"),
            col("d2"),
            expr("bit_count(h1 ^ h2)").cast("long").as("hamming")
          )
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
    // E12 (clustering, adversarial-diameter path): the SAME cluster
    // semantics as q67 through ConnectedComponents.labelStar — the
    // alternating large-star/small-star formulation (Kiveris et al.)
    // that converges in O(log²) rounds regardless of component
    // diameter, where q67's min-label propagation needs diameter-many
    // rounds. Identical output ⇒ identical oracle; registering both
    // keeps the gate checking that the two formulations agree on real
    // pair graphs, not just on the spec's synthetic ones.
    QueryDef(
      "q102_dedup_clusters_star",
      (s, dir) => {
        val pairs = jaccardPairs(s, dir, PairMinJaccard)
        graft.operators.ConnectedComponents
          .labelStar(pairs, "d1", "d2")
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
        // ONE exchange of the 5-gram index: distinct_up_to collects each
        // gram's doc list (NULL past 100 docs = the boilerplate cap,
        // enforced map-side), the eval/train split is a LOCAL array
        // partition of that list, and the (gram, train, eval) stream is
        // the in-group expansion — replacing the df groupBy + semi-join
        // + self-join chain that exchanged the full index three times.
        val grouped = shingle5Rows(s, dir)
          .groupBy("g")
          .agg(expr("distinct_up_to(doc_id, 100)").as("docs"))
          .filter(col("docs").isNotNull)
          .select(
            col("g"),
            expr("filter(docs, d -> d % 20 = 0)").as("evals"),
            expr("filter(docs, d -> d % 20 != 0)").as("trains")
          )
          .filter(size(col("evals")) >= 1 && size(col("trains")) >= 1)
        grouped
          .select(col("g"), explode(col("trains")).as("doc_id"), col("evals"))
          .select(col("doc_id"), col("g"), explode(col("evals")).as("eval_id"))
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
    ),

    // ------------------------------------------------------------------
    // E11 (incremental ingest): dedup a NEW batch against the fingerprint
    // index of the corpus already ingested — the shape every rolling
    // crawl pipeline runs (nobody re-dedups 100 TB per batch; the batch
    // anti-joins the index). Here doc_id % 3 == 0 stands in for the new
    // batch, the rest for the indexed corpus; fingerprint = md5(text).
    // A new doc is dropped if its fingerprint is already indexed
    // (dup_old), kept once per fingerprint within the batch (smallest
    // doc_id wins; the rest are dup_new). Per-lang counts partition the
    // batch exactly: n_new = kept + dup_old + dup_new — an oracle-checked
    // conservation law. Plan: the index is a narrow distinct fingerprint
    // column; the batch LEFT-joins it on fp (shuffle or broadcast by
    // size — AQE decides) and a window-min over fp settles within-batch
    // winners. Nothing wide ever shuffles.
    QueryDef(
      "q118_incremental_dedup",
      (s, dir) => {
        val docs = Tables(s, dir, "documents")
          .select(col("doc_id"), col("lang"), md5(col("text")).as("fp"))
        val indexed = docs.filter(col("doc_id") % 3 =!= 0).select("fp").distinct()
        val batch = docs.filter(col("doc_id") % 3 === 0)
        val flagged = batch
          .join(indexed.withColumn("in_index", lit(1)), Seq("fp"), "left")
          .withColumn(
            "min_id",
            min("doc_id").over(org.apache.spark.sql.expressions.Window.partitionBy("fp"))
          )
          .withColumn(
            "status",
            when(col("in_index").isNotNull, "dup_old")
              .when(col("doc_id") =!= col("min_id"), "dup_new")
              .otherwise("kept")
          )
        flagged
          .groupBy("lang")
          .agg(
            count(lit(1)).as("n_new"),
            sum(when(col("status") === "kept", 1L).otherwise(0L)).as("n_kept"),
            sum(when(col("status") === "dup_old", 1L).otherwise(0L)).as("n_dup_old"),
            sum(when(col("status") === "dup_new", 1L).otherwise(0L)).as("n_dup_new")
          )
          .orderBy("lang")
      },
      Some("""WITH docs AS (
          SELECT doc_id, lang, md5(text) AS fp FROM documents
        ), idx AS (
          SELECT DISTINCT fp FROM docs WHERE doc_id % 3 <> 0
        ), batch AS (
          SELECT d.doc_id, d.lang, d.fp,
                 (i.fp IS NOT NULL) AS in_index,
                 min(d.doc_id) OVER (PARTITION BY d.fp) AS min_id
          FROM docs d LEFT JOIN idx i ON d.fp = i.fp
          WHERE d.doc_id % 3 = 0
        )
        SELECT lang, count(*) AS n_new,
               CAST(sum(CASE WHEN NOT in_index AND doc_id = min_id
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
               CAST(sum(CASE WHEN in_index THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_old,
               CAST(sum(CASE WHEN NOT in_index AND doc_id <> min_id
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_new
        FROM batch GROUP BY 1 ORDER BY 1""")
    ),

    // ------------------------------------------------------------------
    // E12 (end-to-end): the dedup pipeline users actually run, as ONE
    // query — MinHash-LSH candidates → exact-Jaccard verification
    // (minhashVerifiedPairs: q36's graph, shared so the two cannot
    // drift) → connected-components clustering (labelStar) → one
    // canonical doc per cluster by the shared q32 quality score →
    // union with the untouched singletons = the KEPT-document set.
    // Rows-only (the MinHash hash family is engine-defined, so the
    // pair graph — hence the clusters — is not SQL-restatable);
    // DedupPipelineSpec pins the composition on a hand-computed
    // fixture and recomputes this corpus result from the registered
    // q36 pairs with a plain-Scala union-find + canonical pick.
    QueryDef(
      "q130_dedup_pipeline",
      (s, dir) => keepSet(docsWide(s, dir), minhashVerifiedPairs(s, dir)),
      None
    ),

    // ------------------------------------------------------------------
    // The SAME pipeline over the exact-Jaccard pair graph (q35's,
    // shared via jaccardPairs) — deterministic all the way down, so the
    // whole chain is oracle-checked: pair graph (pairSql CTEs) →
    // transitive closure (recursive CTE min-reachable-label) → quality
    // (QualitySql) → canonical pick (window) → singleton union. One
    // hash-exact row set certifies candidates, verification,
    // clustering, canonical selection, and the keep/drop partition in
    // a single gate entry.
    QueryDef(
      "q131_dedup_pipeline_exact",
      (s, dir) => keepSet(docsWide(s, dir), jaccardPairs(s, dir, PairMinJaccard)),
      Some(s"""WITH RECURSIVE $pairSql, edges AS (
          SELECT d1 AS a, d2 AS b FROM pairs
          UNION ALL
          SELECT d2 AS a, d1 AS b FROM pairs
        ), reach AS (
          SELECT DISTINCT a AS id, a AS r FROM edges
          UNION
          SELECT reach.id, e.b AS r FROM reach JOIN edges e ON reach.r = e.a
        ), lab AS (
          SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY id
        ), qual AS (
          SELECT doc_id, ${TextOps.QualitySql} AS quality FROM documents
        ), csz AS (
          SELECT cluster_id, count(*) AS cluster_size FROM lab GROUP BY 1
        ), canon AS (
          SELECT l.doc_id, l.cluster_id, c.cluster_size, q.quality,
                 row_number() OVER (PARTITION BY l.cluster_id
                                    ORDER BY q.quality DESC, l.doc_id) AS rn
          FROM lab l
          JOIN qual q ON q.doc_id = l.doc_id
          JOIN csz c ON c.cluster_id = l.cluster_id
        )
        SELECT doc_id, cluster_id, cluster_size, quality
        FROM canon WHERE rn = 1
        UNION ALL
        SELECT q.doc_id, q.doc_id AS cluster_id,
               CAST(1 AS BIGINT) AS cluster_size, q.quality
        FROM qual q LEFT JOIN lab ON lab.doc_id = q.doc_id
        WHERE lab.doc_id IS NULL
        ORDER BY doc_id""")
    ),

    // ------------------------------------------------------------------
    // E12 (incremental near-dup admission — q118's incremental shape
    // for SIMILARITY instead of exact hashes): a new crawl batch
    // (doc_id % 5 == 4) is checked against the EXISTING corpus — for
    // each new doc, its near-duplicate matches among the old docs at
    // the same exact-Jaccard ≥ 0.5 / rare-shingle definition as q35.
    // The plan is the admission-control shape, not a corpus self-join:
    // the shingle-keyed equi-join pairs NEW rows against OLD rows
    // only, so per-batch cost is O(batch × df-capped fanout) — the
    // corpus side never pairs with itself. At 100 TB the old side's
    // (g, doc_id) rows and per-doc sizes ARE the persisted shingle
    // index (recomputed here for a self-contained oracle, exactly as
    // q118 recomputes its fingerprint index); the df ∈ [2, 50] cap is
    // computed over the union so admission agrees with what a full
    // q35 re-run would say — the spec pins that equivalence.
    QueryDef(
      "q146_incremental_neardup",
      (s, dir) => {
        val docs = docsWide(s, dir)
        admissionPairs(
          docs.filter(col("doc_id") % 5 =!= 4),
          docs.filter(col("doc_id") % 5 === 4),
          PairMinJaccard
        )
      },
      Some(admissionOracle)
    ),

    // ------------------------------------------------------------------
    // E12 (persisted near-dup admission index): the production bound
    // for q146/q149's standing caveat — admission re-shingled the
    // corpus per verdict; operators/ShingleIndex pays the text explode
    // ONCE (per-doc distinct 3-shingle rows, bucket-partitioned, plus
    // log-structured df segments that sum to the true document
    // frequency), so a verdict reads compact persisted rows instead.
    // Lifecycle mirrors the other persisted indexes: build → append
    // (O(batch), layout never re-read) → admit → compactDf (checked
    // staged swap folding the segments). SAME ORACLE as q146: the
    // index-served verdicts must be bit-equal to the from-scratch
    // recompute — the df ∈ [2, 50] rare rule runs over the union
    // exactly as admissionPairs defines it, which the shared SQL
    // hash-checks end to end (ShingleIndexSpec additionally pins
    // equality after compaction and on a second appended batch).
    QueryDef(
      "q190_shingle_index_admission",
      (s, dir) => {
        val idx = Similarity.freshIndexDir("shingle_idx")
        val docs = docsWide(s, dir)
        graft.operators.ShingleIndex.build(docs.filter(col("doc_id") % 5 <= 2), idx)
        graft.operators.ShingleIndex.append(docs.filter(col("doc_id") % 5 === 3), idx)
        graft.operators.ShingleIndex.admit(
          s,
          idx,
          docs.filter(col("doc_id") % 5 === 4),
          PairMinJaccard
        )
      },
      Some(admissionOracle)
    ),

    // ------------------------------------------------------------------
    // E12 × governance (erasure-aware admission — closing the one gap
    // q202's right-to-be-forgotten capstone left open: the admission
    // index retained forgotten docs' shingle rows and df counts
    // forever). Lifecycle under erasure: build + append as q190, then
    // FORGET the %29==3 subjects — ShingleIndex.delete writes doc-id
    // tombstones plus a NEGATIVE df segment (the log-structured
    // segments sum, so a minus-count segment decrements document
    // frequency exactly; one rows-scan at erasure cadence, never per
    // verdict) — and admit the new batch BEFORE any compaction: the
    // verdicts must be bit-equal to a from-scratch recompute over
    // `documents` minus the erased set, which is precisely what the
    // oracle states. A forgotten doc surfacing as d_old, or its
    // lingering df counts shifting any shingle in or out of the
    // rare df ∈ [2, 50] band, breaks the hash. ErasureSpec extends
    // this through compact (staged-swap rows rewrite + df rebuild
    // from survivors) and replayed deletes.
    QueryDef(
      "q203_erasure_admission",
      (s, dir) => {
        val idx = Similarity.freshIndexDir("shingle_erasure")
        val docs = docsWide(s, dir)
        graft.operators.ShingleIndex.build(docs.filter(col("doc_id") % 5 <= 2), idx)
        graft.operators.ShingleIndex.append(docs.filter(col("doc_id") % 5 === 3), idx)
        graft.operators.ShingleIndex.delete(
          docs
            .filter(col("doc_id") % 5 =!= 4 && col("doc_id") % 29 === 3)
            .select("doc_id"),
          idx
        )
        graft.operators.ShingleIndex.admit(
          s,
          idx,
          docs.filter(col("doc_id") % 5 === 4),
          PairMinJaccard
        )
      },
      Some(erasedAdmissionOracle)
    ),

    // ------------------------------------------------------------------
    // E12/E14 (benchmark decontamination): flag every training document
    // sharing at least one word 8-gram with a held-out evaluation set —
    // the leakage screen run before any training job (verbatim
    // benchmark text inside the training corpus inflates eval scores;
    // the standard mitigation is exact n-gram overlap removal, e.g.
    // GPT-3 appendix C's 13-gram filter — 8 here to suit the synthetic
    // docs' length). DISTINCT from near-dup admission (q146): a single
    // shared n-gram contaminates regardless of document-level
    // similarity — no df cap, no Jaccard, containment not resemblance.
    // Plan: the benchmark side is tiny BY CONSTRUCTION (benchmarks are
    // fixed eval sets, not corpus-scaled), so its shingles BROADCAST
    // and the training scan streams through one map-side hash join +
    // one partially-aggregated groupBy — at 100 TB the only exchange
    // carries per-doc contamination counters. Oracle-exact: shingle
    // extraction, the equi-join, and the three integer aggregates are
    // all engine-independent.
    QueryDef(
      "q156_decontaminate",
      (s, dir) => {
        val docs = Tables(s, dir, "documents").select("doc_id", "text")
        val bench = docs
          .filter(col("doc_id") % 11 === 0)
          .select(col("doc_id").as("bench_id"), explode(expr("word_shingles(text, 8)")).as("g"))
        docs
          .filter(col("doc_id") % 11 =!= 0)
          .select(col("doc_id"), explode(expr("word_shingles(text, 8)")).as("g"))
          .join(broadcast(bench), Seq("g"))
          .groupBy("doc_id")
          .agg(
            countDistinct("bench_id").as("n_bench_docs"),
            countDistinct("g").as("n_shared_ngrams"),
            min("bench_id").as("first_bench_id")
          )
          .orderBy("doc_id")
      },
      Some("""WITH tok AS (
          SELECT doc_id, string_split(text, ' ') AS ws FROM documents
          WHERE len(string_split(text, ' ')) >= 8
        ), sh AS (
          SELECT DISTINCT doc_id,
                 ws[i]||' '||ws[i+1]||' '||ws[i+2]||' '||ws[i+3]||' '||ws[i+4]||' '||ws[i+5]||' '||ws[i+6]||' '||ws[i+7] AS g
          FROM (SELECT doc_id, ws, unnest(range(1, len(ws)-6)) AS i FROM tok)
        )
        SELECT t.doc_id,
               count(DISTINCT b.doc_id) AS n_bench_docs,
               count(DISTINCT t.g) AS n_shared_ngrams,
               min(b.doc_id) AS first_bench_id
        FROM (SELECT * FROM sh WHERE doc_id % 11 <> 0) t
        JOIN (SELECT * FROM sh WHERE doc_id % 11 = 0) b USING (g)
        GROUP BY t.doc_id ORDER BY t.doc_id""")
    ),

    // ------------------------------------------------------------------
    // E11/E12 (substring-level span dedup — Lee et al. 2022,
    // "Deduplicating Training Data Makes Language Models Better"):
    // find every MAXIMAL character span whose 30-char windows are all
    // duplicated somewhere in the corpus — duplicated regions at
    // ARBITRARY offsets inside otherwise-distinct documents, which
    // doc-level (q30), shingle-set (q36) and fixed-chunk (q94) dedup
    // all miss. The paper's suffix array becomes a relational
    // pipeline: slide 30-char windows over every doc (one explode —
    // O(total chars) rows), count window occurrences corpus-wide
    // (the one corpus-scaled exchange, keyed on the window — at
    // 100 TB the key is the window's 128-bit hash, the same
    // mergeable-count shape as shingle df), flag positions whose
    // window recurs (one shuffle join back on the key), then merge
    // consecutive flagged positions into maximal spans with the
    // gaps-and-islands trick (i − row_number per doc: a PER-DOC
    // window over doc-bounded rows, never a corpus-scaled sort).
    // The fixture plants partial duplicates — doc_id % 50 == 0 docs
    // re-enter under new ids with a unique '[COPY-<id>] ' prefix —
    // so found spans must START PAST the unique prefix: offset
    // sensitivity is exactly the behavior under test, alongside
    // whatever natural repeats the corpus carries. ORACLE-EXACT:
    // spans are integer (doc, start, end) triples the oracle
    // recomputes from substr windows.
    QueryDef(
      "q226_span_dedup",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val docs = Tables(s, dir, "documents").select("doc_id", "text")
        val corpus = docs.unionByName(
          docs
            .filter(col("doc_id") % 50 === 0)
            .select(
              (col("doc_id") + 1000000L).as("doc_id"),
              concat(lit("[COPY-"), col("doc_id"), lit("] "), col("text")).as("text")
            )
        )
        val wins = corpus
          .filter(length(col("text")) >= 30)
          // the corpus arrives as ~one scan task (one small parquet
          // split) but the per-CHARACTER window explode below is the
          // query's whole compute — spread the docs across the
          // scheduler first (guide §2.5 input skew: tiny input, heavy
          // derived work). The count is PINNED to the scheduler width:
          // AQE sizes the exchange from the PRE-explode bytes (~2 MB)
          // and would coalesce an unpinned repartition straight back
          // to one task (measured: the explode stage stayed 1-task)
          .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
          .select(
            col("doc_id"),
            posexplode(
              expr("transform(sequence(1, length(text) - 29), i -> substring(text, i, 30))")
            )
          )
          .select(col("doc_id"), (col("pos") + 1).cast("long").as("i"), col("col").as("win"))
        val dup = wins
          .groupBy("win")
          .agg(count(lit(1)).as("n"))
          .filter(col("n") >= 2)
          .select("win")
        val flagged = wins.join(dup, Seq("win")).select("doc_id", "i")
        flagged
          .withColumn(
            "g",
            col("i") - row_number().over(Window.partitionBy("doc_id").orderBy("i"))
          )
          .groupBy("doc_id", "g")
          .agg(min("i").as("span_start"), (max("i") + 29).as("span_end"))
          .select("doc_id", "span_start", "span_end")
          .orderBy("doc_id", "span_start")
      },
      Some("""WITH corpus AS (
          SELECT doc_id, text FROM documents
          UNION ALL
          SELECT doc_id + 1000000 AS doc_id,
                 '[COPY-' || doc_id || '] ' || text AS text
          FROM documents WHERE doc_id % 50 = 0),
        w AS (
          SELECT doc_id, CAST(i AS BIGINT) AS i,
                 substr(text, CAST(i AS INTEGER), 30) AS win
          FROM corpus, unnest(range(1, len(text) - 28)) AS t(i)
          WHERE len(text) >= 30),
        dup AS (SELECT win FROM w GROUP BY win HAVING count(*) >= 2),
        flagged AS (SELECT w.doc_id, w.i FROM w JOIN dup USING (win)),
        grp AS (
          SELECT doc_id, i,
                 i - row_number() OVER (PARTITION BY doc_id ORDER BY i) AS g
          FROM flagged)
        SELECT doc_id, min(i) AS span_start, max(i) + 29 AS span_end
        FROM grp GROUP BY doc_id, g ORDER BY doc_id, span_start""")
    ),

    // ------------------------------------------------------------------
    // E11/E12 (span REMOVAL — the second half of Lee et al. 2022):
    // q226 finds duplicated spans; this query excises them, keeping
    // exactly the FIRST occurrence (minimal (doc_id, i)) of every
    // duplicated 30-char window and rewriting each document's text
    // with all other occurrences cut out. The canonical occurrence is
    // a per-window argmin — computed as min over ONE packed bigint
    // (doc_id·10⁸ + i; i < 10⁸ holds for any real document, so the
    // packing preserves (doc_id, i) lexicographic order) because a
    // single-word min is a partial-aggregatable, codegen'd fold where
    // a struct-min is not (measured 250× in the oracle engine).
    // Positions whose window recurs elsewhere AND are not canonical
    // are flagged; flagged window-starts merge into maximal runs
    // (gaps-and-islands on i), runs merge into maximal CHARACTER
    // intervals (a run ending within 29 chars of the next overlaps
    // it — one lag comparison per doc, islands are i-disjoint so the
    // char end is monotone), and the complement intervals stitch the
    // surviving text back together via an ordered fold
    // (sort_array ∘ collect_list — segment starts are unique per
    // doc, so the sort is total). 100 TB posture: the window-count
    // exchange is the ONLY corpus-scaled shuffle (key = the window,
    // or its 128-bit hash at scale); islands/intervals/segments are
    // windowed PER DOC over doc-bounded rows; the reconstruction
    // joins touch only docs that lost spans. Docs untouched by
    // removal pass through the final left join unchanged — including
    // the canonical copies, which is the paper's keep-one contract.
    QueryDef(
      "q227_span_removal",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val docs = Tables(s, dir, "documents").select("doc_id", "text")
        val corpus = docs
          .unionByName(
            docs
              .filter(col("doc_id") % 50 === 0)
              .select(
                (col("doc_id") + 1000000L).as("doc_id"),
                concat(lit("[COPY-"), col("doc_id"), lit("] "), col("text")).as("text")
              )
          )
          // two consumers (window slide + final reconstruction join):
          // one materialization, not two scans of the union. The
          // repartition spreads the docs BEFORE the checkpoint so the
          // per-character explode below runs shuffle-wide instead of
          // on the single scan task (guide §2.5 — same fix as q226;
          // the pinned count stops AQE from coalescing the pre-explode
          // ~2 MB exchange back to one task)
          .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
          .localCheckpoint()
        val wins = corpus
          .filter(length(col("text")) >= 30)
          .select(
            col("doc_id"),
            posexplode(
              expr("transform(sequence(1, length(text) - 29), i -> substring(text, i, 30))")
            )
          )
          .select(col("doc_id"), (col("pos") + 1).cast("long").as("i"), col("col").as("win"))
        val pos = col("doc_id") * 100000000L + col("i")
        val dup = wins
          .groupBy("win")
          .agg(min(pos).as("canon"), count(lit(1)).as("n"))
          .filter(col("n") >= 2)
          .select("win", "canon")
        val red = wins
          .join(dup, Seq("win"))
          .filter(pos =!= col("canon"))
          .select("doc_id", "i")
        val byI = Window.partitionBy("doc_id").orderBy("i")
        val isl = red
          .withColumn("g", col("i") - row_number().over(byI))
          .groupBy("doc_id", "g")
          .agg(min("i").as("s"), (max("i") + 29).as("e"))
        val byS = Window.partitionBy("doc_id").orderBy("s")
        val spans = isl
          .withColumn(
            "ng",
            when(col("s") > coalesce(lag("e", 1).over(byS), lit(0L)) + 1, 1).otherwise(0)
          )
          .withColumn("grp", sum("ng").over(byS))
          .groupBy("doc_id", "grp")
          .agg(min("s").as("s"), max("e").as("e"))
          // three consumers (gap segments, tail segment, touched-doc
          // set) of a tiny spans table
          .localCheckpoint()
        val gaps = spans.select(
          col("doc_id"),
          (coalesce(lag("e", 1).over(byS), lit(0L)) + 1).as("ss"),
          (col("s") - 1).as("se")
        )
        val tails = spans
          .groupBy("doc_id")
          .agg((max("e") + 1).as("ss"))
          .join(corpus, Seq("doc_id"))
          .select(col("doc_id"), col("ss"), length(col("text")).cast("long").as("se"))
        val kept = gaps
          .unionByName(tails)
          .filter(col("se") >= col("ss"))
          .join(corpus, Seq("doc_id"))
          .select(
            col("doc_id"),
            struct(
              col("ss"),
              expr("substring(text, CAST(ss AS INT), CAST(se - ss + 1 AS INT))").as("seg")
            ).as("part")
          )
          .groupBy("doc_id")
          .agg(
            array_join(expr("transform(array_sort(collect_list(part)), x -> x.seg)"), "")
              .as("kept_text")
          )
        val touched = spans.select("doc_id").distinct().withColumn("hit", lit(1))
        corpus
          .join(touched, Seq("doc_id"), "left")
          .join(kept, Seq("doc_id"), "left")
          .select(
            col("doc_id"),
            when(col("hit").isNotNull, coalesce(col("kept_text"), lit("")))
              .otherwise(col("text"))
              .as("clean_text")
          )
          .select(
            col("doc_id"),
            length(col("clean_text")).cast("long").as("clean_len"),
            col("clean_text")
          )
          .orderBy("doc_id")
      },
      Some("""WITH corpus AS (
          SELECT doc_id, text FROM documents
          UNION ALL
          SELECT doc_id + 1000000 AS doc_id,
                 '[COPY-' || doc_id || '] ' || text AS text
          FROM documents WHERE doc_id % 50 = 0),
        w AS (
          SELECT doc_id, CAST(i AS BIGINT) AS i,
                 substr(text, CAST(i AS INTEGER), 30) AS win
          FROM corpus, unnest(range(1, len(text) - 28)) AS t(i)
          WHERE len(text) >= 30),
        dup AS (
          SELECT win, min(doc_id * 100000000 + i) AS canon
          FROM w GROUP BY win HAVING count(*) >= 2),
        red AS (
          SELECT w.doc_id, w.i FROM w JOIN dup USING (win)
          WHERE w.doc_id * 100000000 + w.i <> dup.canon),
        isl AS (
          SELECT doc_id, min(i) AS s, max(i) + 29 AS e
          FROM (SELECT doc_id, i,
                       i - row_number() OVER (PARTITION BY doc_id ORDER BY i) AS g
                FROM red)
          GROUP BY doc_id, g),
        m AS (
          SELECT doc_id, s, e,
                 CASE WHEN s > coalesce(lag(e) OVER (PARTITION BY doc_id ORDER BY s), 0) + 1
                      THEN 1 ELSE 0 END AS ng
          FROM isl),
        g2 AS (
          SELECT doc_id, s, e,
                 sum(ng) OVER (PARTITION BY doc_id ORDER BY s) AS grp
          FROM m),
        spans AS (SELECT doc_id, min(s) AS s, max(e) AS e FROM g2 GROUP BY doc_id, grp),
        seg AS (
          SELECT doc_id,
                 coalesce(lag(e) OVER (PARTITION BY doc_id ORDER BY s), 0) + 1 AS ss,
                 s - 1 AS se
          FROM spans
          UNION ALL
          SELECT sp.doc_id, max(sp.e) + 1 AS ss, len(c.text) AS se
          FROM spans sp JOIN corpus c USING (doc_id)
          GROUP BY sp.doc_id, len(c.text)),
        kept AS (
          SELECT s.doc_id,
                 string_agg(substr(c.text, CAST(ss AS INTEGER), CAST(se - ss + 1 AS INTEGER)),
                            '' ORDER BY ss) AS kept_text
          FROM seg s JOIN corpus c USING (doc_id)
          WHERE se >= ss GROUP BY s.doc_id),
        finalt AS (
          SELECT c.doc_id,
                 CASE WHEN sp.doc_id IS NOT NULL THEN coalesce(k.kept_text, '')
                      ELSE c.text END AS clean_text
          FROM corpus c
          LEFT JOIN (SELECT DISTINCT doc_id FROM spans) sp USING (doc_id)
          LEFT JOIN kept k USING (doc_id))
        SELECT doc_id, CAST(len(clean_text) AS BIGINT) AS clean_len, clean_text
        FROM finalt ORDER BY doc_id""")
    ),

    // ------------------------------------------------------------------
    // E11/E12 (content-defined chunking — the LBFS/FastCDC boundary
    // rule): chunk boundaries fall where the hash of the trailing
    // 16-char window ≡ 0 (mod 32), so boundaries are a function of
    // CONTENT, not offset — a prefix insertion shifts every
    // fixed-stride chunk but leaves CDC boundaries beyond it intact.
    // The fixture plants exactly that trap: every 10th document gets
    // a prefix-shifted twin, and the output compares both chunkers on
    // the same corpus: the twins' chars land in duplicated CDC chunks
    // at ~10× the rate of fixed-stride chunks. Everything is
    // doc-bounded after the one corpus-scaled window-hash pass
    // (O(total chars) rows, the q226/q227 shape) and all metrics are
    // integers — ORACLE-EXACT. The unconstrained boundary rule (no
    // min/max chunk clamp) keeps both engines' chunkings identical;
    // production CDC adds clamps for variance, not correctness.
    QueryDef(
      "q248_cdc_chunk_dedup",
      (s, dir) => {
        val base = Tables(s, dir, "documents").select(col("doc_id"), col("text"))
        val corpus = base
          .unionByName(
            base
              .filter(col("doc_id") % 10 === 0)
              .select((col("doc_id") + 100000L).as("doc_id"), concat(lit("zz shifted prefix zz "), col("text")).as("text"))
          )
          .localCheckpoint()
        val h60 = "cast(conv(substring(md5(win), 1, 15), 16, 10) AS bigint)"
        val cuts = corpus
          .select(col("doc_id"), explode(expr("sequence(16, length(text))")).as("i"), col("text"))
          .withColumn("win", expr("substring(text, i - 15, 16)"))
          .filter(expr(s"$h60 % 32 = 0"))
          .groupBy("doc_id")
          .agg(sort_array(collect_list(col("i"))).as("cuts"))
        val cdc = corpus
          .join(cuts, Seq("doc_id"), "left")
          .withColumn(
            "bnds",
            expr("array_distinct(concat(array(0), coalesce(cuts, array()), array(length(text))))")
          )
          .select(
            col("doc_id"),
            explode(
              expr(
                "transform(sequence(1, size(bnds) - 1), " +
                  "j -> substring(text, element_at(bnds, j) + 1, element_at(bnds, j + 1) - element_at(bnds, j)))"
              )
            ).as("chunk")
          )
          .select(lit("cdc").as("method"), col("doc_id"), col("chunk"))
        val fixed = corpus
          .select(col("doc_id"), explode(expr("sequence(1, length(text), 32)")).as("i"), col("text"))
          .select(lit("fixed").as("method"), col("doc_id"), expr("substring(text, i, 32)").as("chunk"))
        val chunks = cdc.unionByName(fixed)
        val counts = chunks.groupBy("method", "chunk").agg(count(lit(1)).as("cnt"))
        chunks
          .join(counts, Seq("method", "chunk"))
          .groupBy("method")
          .agg(
            count(lit(1)).as("n_chunks"),
            countDistinct(col("chunk")).as("n_distinct"),
            sum(when(col("cnt") >= 2, length(col("chunk")).cast("long")).otherwise(0L)).as("dup_chars"),
            expr(
              "CAST(sum(CASE WHEN doc_id >= 100000 AND cnt >= 2 THEN length(chunk) ELSE 0 END) * 1000 " +
                "DIV sum(CASE WHEN doc_id >= 100000 THEN length(chunk) ELSE 0 END) AS bigint)"
            ).as("twin_dup_pm")
          )
          .orderBy("method")
      },
      Some("""WITH base AS (SELECT doc_id, text FROM documents),
        corpus AS (
          SELECT doc_id, text FROM base
          UNION ALL
          SELECT doc_id + 100000, 'zz shifted prefix zz ' || text
          FROM base WHERE doc_id % 10 = 0),
        cuts AS (
          SELECT doc_id, list_sort(list(i)) AS cuts
          FROM (
            SELECT doc_id, i,
                   CAST(('0x' || substr(md5(substring(text, i - 15, 16)), 1, 15)) AS BIGINT) AS h
            FROM (SELECT doc_id, text, unnest(range(16, length(text) + 1)) AS i FROM corpus))
          WHERE h % 32 = 0 GROUP BY doc_id),
        bnds AS (
          SELECT c.doc_id, c.text,
                 list_sort(list_distinct([0] || coalesce(k.cuts, []) || [length(c.text)])) AS b
          FROM corpus c LEFT JOIN cuts k USING (doc_id)),
        cdc AS (
          SELECT 'cdc' AS method, doc_id,
                 substring(text, b[j] + 1, b[j + 1] - b[j]) AS chunk
          FROM (SELECT doc_id, text, b, unnest(range(1, len(b))) AS j FROM bnds)),
        fixed AS (
          SELECT 'fixed' AS method, doc_id, substring(text, i, 32) AS chunk
          FROM (SELECT doc_id, text, unnest(range(1, length(text) + 1, 32)) AS i FROM corpus)),
        chunks AS (SELECT * FROM cdc UNION ALL SELECT * FROM fixed),
        counts AS (SELECT method, chunk, count(*) AS cnt FROM chunks GROUP BY 1, 2)
        SELECT ch.method, count(*) AS n_chunks,
               CAST(count(DISTINCT ch.chunk) AS BIGINT) AS n_distinct,
               CAST(sum(CASE WHEN cnt >= 2 THEN length(ch.chunk) ELSE 0 END) AS BIGINT) AS dup_chars,
               CAST(sum(CASE WHEN ch.doc_id >= 100000 AND cnt >= 2 THEN length(ch.chunk) ELSE 0 END) * 1000
                    // sum(CASE WHEN ch.doc_id >= 100000 THEN length(ch.chunk) ELSE 0 END) AS BIGINT) AS twin_dup_pm
        FROM chunks ch JOIN counts USING (method, chunk)
        GROUP BY ch.method ORDER BY ch.method""")
    )
  )
}
