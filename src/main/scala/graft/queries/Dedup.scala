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
      (s, dir) => {
        val sh = shingleRows(s, dir)
        val rare = sh
          .groupBy("g")
          .agg(count(lit(1)).as("df"))
          .filter(col("df") >= 2 && col("df") <= 50)
          .select("g")
        val shr = sh.join(rare, Seq("g"))
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
          .filter(col("jaccard") >= 0.5)
          .orderBy("d1", "d2")
      },
      Some("""WITH tok AS (
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
        ), pairs AS (
          SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS shared
          FROM shr a JOIN shr b ON a.g = b.g AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        )
        SELECT d1, d2,
               CAST(shared AS DOUBLE) / (s1.n + s2.n - shared) AS jaccard
        FROM pairs
        JOIN sz s1 ON s1.doc_id = d1
        JOIN sz s2 ON s2.doc_id = d2
        WHERE CAST(shared AS DOUBLE) / (s1.n + s2.n - shared) >= 0.5
        ORDER BY d1, d2""")
    ),

    // ------------------------------------------------------------------
    // E12: MinHash + banded LSH. 32 hashes (xxhash64 seeded per slot),
    // 8 bands × 4 rows; candidates = docs sharing a band bucket;
    // survivors verified with exact Jaccard on the shingle sets. For a
    // pair with true Jaccard j the detection probability is
    // 1-(1-j^4)^8 (≈0.9998 at j=0.9, ≈0.04 at j=0.2) — deterministic
    // here because the hash family is fixed. No SQL oracle (hash family
    // is engine-defined); DedupSpec checks recall against q35's truth.
    QueryDef(
      "q36_minhash_lsh",
      (s, dir) => {
        val sets = shingleSets(s, dir)
        val sig = sets.select(
          col("doc_id"),
          col("sh"),
          expr("""transform(sequence(0, 31), i ->
                    array_min(transform(sh, x -> xxhash64(concat(cast(i AS string), '_', x)))))"""
          ).as("sig")
        )
        val bands = sig.select(
          col("doc_id"),
          explode(
            expr("transform(sequence(0, 7), b -> struct(b AS band, slice(sig, b*4 + 1, 4) AS key))")
          ).as("bucket")
        )
        val cand = bands
          .as("a")
          .join(
            bands.as("b"),
            col("a.bucket") === col("b.bucket") && col("a.doc_id") < col("b.doc_id")
          )
          .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
          .distinct()
        cand
          .join(sets.select(col("doc_id").as("d1"), col("sh").as("sh1")), Seq("d1"))
          .join(sets.select(col("doc_id").as("d2"), col("sh").as("sh2")), Seq("d2"))
          .select(
            col("d1"),
            col("d2"),
            (size(array_intersect(col("sh1"), col("sh2"))).cast("double") /
              (size(col("sh1")) + size(col("sh2")) -
                size(array_intersect(col("sh1"), col("sh2"))))).as("jaccard")
          )
          .filter(col("jaccard") >= 0.5)
          .orderBy("d1", "d2")
      },
      None
    ),

    // ------------------------------------------------------------------
    // E12: SimHash — 64-bit signature from per-token bit votes, banded
    // into 4×16-bit keys for candidate generation, Hamming-distance
    // verified with bit_count(xor). All higher-order built-ins, fully
    // codegen'd; one shuffle for the band self-join.
    QueryDef(
      "q37_simhash_pairs",
      (s, dir) => {
        val sigs = Tables(s, dir, "documents")
          .select(col("doc_id"), split(col("text"), " ").as("ws"))
          .select(
            col("doc_id"),
            expr("""aggregate(
                      transform(ws, t -> xxhash64(t)),
                      array_repeat(cast(0 AS bigint), 64),
                      (acc, h) -> zip_with(acc,
                                           transform(sequence(0, 63), i ->
                                             CASE WHEN shiftright(h, i) & 1 = 1
                                                  THEN cast(1 AS bigint)
                                                  ELSE cast(-1 AS bigint) END),
                                           (a, b) -> a + b))""").as("votes")
          )
          .select(
            col("doc_id"),
            expr("""aggregate(
                      transform(sequence(0, 63), i ->
                        IF(element_at(votes, i + 1) > 0, shiftleft(cast(1 AS bigint), i),
                           cast(0 AS bigint))),
                      cast(0 AS bigint), (a, b) -> a | b)""").as("simhash")
          )
        val bands = sigs.select(
          col("doc_id"),
          col("simhash"),
          explode(
            expr("""transform(sequence(0, 3), b ->
                      struct(b AS band, shiftright(simhash, b * 16) & 65535 AS key))""")
          ).as("bucket")
        )
        bands
          .as("a")
          .join(
            bands.as("b"),
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
    )
  )
}
