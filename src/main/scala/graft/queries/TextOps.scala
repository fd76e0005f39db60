package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Text-analysis operators over the `documents` corpus (SURVEY.md §2.3
  * E14 + the training-data-pipeline brief): per-document statistics,
  * quality scoring, regex tokenization, n-gram language ID, and content
  * fingerprinting. Everything is built-in codegen expressions — no UDFs
  * on the hot path; ratios divide exactly-determined integers so the
  * DuckDB oracles match bit-for-bit.
  */
object TextOps {

  /** PII patterns for q70 — restricted to constructs Java regex and RE2
    * share. Referenced by TextOpsSpec so unit coverage can't drift from
    * the production redaction. */
  val EmailRe = "[A-Za-z0-9._]+@[A-Za-z0-9.-]+"
  val PhoneRe = "[0-9]{3}-[0-9]{4}"

  /** The q32 quality score — shared with q117's per-source cap and
    * q130/q131's canonical-doc selection so the consumers can never
    * drift: 0.3·min(tokens/50, 1) + 0.4·(1 − stopword ratio) +
    * 0.3·min(avg token len/8, 1). Both engines execute the identical
    * sequence of correctly-rounded double ops, so the values (and any
    * ordering on them) are bit-identical.
    */
  private[queries] def qualityExpr: org.apache.spark.sql.Column = {
    val nTok = size(split(col("text"), " "))
    val stopCnt =
      size(filter(split(col("text"), " "), t => t.isin("the", "a", "of", "and", "to")))
    val avgLen = length(expr("replace(text, ' ', '')")).cast("double") / nTok
    least(nTok.cast("double") / 50.0, lit(1.0)) * 0.3 +
      (lit(1.0) - stopCnt.cast("double") / nTok) * 0.4 +
      least(avgLen / 8.0, lit(1.0)) * 0.3
  }

  /** The DuckDB restatement of [[qualityExpr]] — single source for the
    * q32, q117, and q131 oracles. */
  private[queries] val QualitySql =
    """least(CAST(len(string_split(text, ' ')) AS DOUBLE) / 50.0, 1.0) * 0.3
        + (1.0 - CAST(len(list_filter(string_split(text, ' '),
                                      x -> x IN ('the', 'a', 'of', 'and', 'to'))) AS DOUBLE)
                 / len(string_split(text, ' '))) * 0.4
        + least((CAST(length(replace(text, ' ', '')) AS DOUBLE)
                 / len(string_split(text, ' '))) / 8.0, 1.0) * 0.3"""

  // ------------------------------------------------------------------
  // BPE machinery shared by q140 (train) and q142 (encode) — one
  // implementation so the tokenizer the corpus is encoded with can
  // never drift from the one training learned.
  // ------------------------------------------------------------------

  /** The BPE working set: word-TYPE histogram (types ≪ tokens —
    * Sennrich et al. 2016 train on exactly this), localCheckpointed
    * once so the merge iterations re-fold a small materialized table
    * instead of re-scanning the corpus per step.
    */
  private def bpeWordHistogram(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
      .select(explode(split(lower(col("text")), "[^a-z]+")).as("w"))
      .filter(length(col("w")) >= 2)
      .groupBy("w")
      .agg(count(lit(1)).as("c"))
      .withColumn("sym", split(col("w"), ""))
      .localCheckpoint()

  /** Within-word adjacent symbol pair counts, weighted by word
    * frequency — map-side explode, one partial-agg'd hash exchange. */
  private def bpePairCounts(df: DataFrame): DataFrame =
    df.filter(size(col("sym")) >= 2) // fully-merged words carry no pairs
      .select(
        col("c"),
        explode(
          expr("transform(sequence(1, size(sym)-1), i -> struct(element_at(sym, i) AS a, element_at(sym, i+1) AS b))")
        ).as("p")
      )
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum("c").as("cnt"))

  /** One training step's top-5 count table; rank 1 is the learned
    * merge. TakeOrdered top-5, then rank over the 5 surviving rows. */
  private def bpeTop5(step: Int, df: DataFrame): DataFrame =
    bpePairCounts(df)
      .orderBy(col("cnt").desc, col("a"), col("b"))
      .limit(5)
      .withColumn("step", lit(step.toLong))
      .withColumn(
        "rk",
        row_number()
          .over(Window.orderBy(col("cnt").desc, col("a"), col("b")))
          .cast("long")
      )

  /** Apply a learned merge greedily left-to-right: a string-accumulator
    * fold — append the next symbol, or splice when the accumulator's
    * LAST symbol is `ma` and the incoming one is `mb`. Because the
    * merged symbol no longer equals `ma`, overlapping runs resolve
    * exactly as canonical greedy BPE ("aaaa" → "aa aa"); DuckDB mirrors
    * the fold with `list_reduce` and an identical CASE. The learned
    * pair enters as a broadcast 1-row cross join, keeping the whole
    * program one DAG with no driver-side data collect.
    */
  private def bpeApplyMerge(df: DataFrame, best: DataFrame): DataFrame =
    df.crossJoin(broadcast(best.filter(col("rk") === 1).select(col("a").as("ma"), col("b").as("mb"))))
      .withColumn(
        "seq",
        expr("""aggregate(slice(sym, 2, size(sym)-1), element_at(sym, 1),
               (acc, x) -> CASE
                 WHEN x = mb AND (acc = ma OR right(acc, length(ma)+1) = concat(' ', ma))
                 THEN concat(left(acc, length(acc)-length(ma)), ma, mb)
                 ELSE concat(acc, ' ', x) END)""")
      )
      .select(col("w"), col("c"), split(col("seq"), " ").as("sym"))

  /** The corpus after all three learned merges are applied, in order. */
  private def bpeEncoded(s: SparkSession, dir: String): DataFrame = {
    val words = bpeWordHistogram(s, dir)
    val s1 = bpeApplyMerge(words, bpeTop5(1, words))
    val s2 = bpeApplyMerge(s1, bpeTop5(2, s1))
    bpeApplyMerge(s2, bpeTop5(3, s2))
  }

  val defs: Seq[QueryDef] = Seq(
    // ------------------------------------------------------------------
    // E14: per-doc token statistics (whitespace tokenization).
    QueryDef(
      "q30_text_stats",
      (s, dir) =>
        Tables(s, dir, "documents")
          .select(
            col("doc_id"),
            length(col("text")).cast("long").as("n_chars_calc"),
            size(split(col("text"), " ")).cast("long").as("n_tokens"),
            (length(expr("replace(text, ' ', '')")).cast("double") /
              size(split(col("text"), " "))).as("avg_tok_len"),
            (size(filter(split(col("text"), " "), t => t.isin("the", "a", "of", "and", "to")))
              .cast("double") / size(split(col("text"), " "))).as("stop_ratio")
          )
          .orderBy("doc_id"),
      Some("""SELECT doc_id,
        CAST(length(text) AS BIGINT) AS n_chars_calc,
        CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        CAST(length(replace(text, ' ', '')) AS DOUBLE) / len(string_split(text, ' ')) AS avg_tok_len,
        CAST(len(list_filter(string_split(text, ' '),
                             x -> x IN ('the', 'a', 'of', 'and', 'to'))) AS DOUBLE)
          / len(string_split(text, ' ')) AS stop_ratio
        FROM documents ORDER BY doc_id""")
    ),

    // ------------------------------------------------------------------
    // E14: BPE-ish regex tokenization — token count + alpha mass.
    QueryDef(
      "q31_token_regex",
      (s, dir) =>
        Tables(s, dir, "documents")
          .select(
            col("doc_id"),
            size(regexp_extract_all(col("text"), lit("[a-z]+"), lit(0))).cast("long")
              .as("n_alpha_tokens"),
            length(regexp_replace(col("text"), "[^a-z]", "")).cast("long").as("n_alpha_chars")
          )
          .orderBy("doc_id"),
      Some("""SELECT doc_id,
        CAST(len(regexp_extract_all(text, '[a-z]+')) AS BIGINT) AS n_alpha_tokens,
        CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS BIGINT) AS n_alpha_chars
        FROM documents ORDER BY doc_id""")
    ),

    // ------------------------------------------------------------------
    // E14: composite quality score from length/stopword/token-shape
    // signals — the standard corpus-filtering heuristic. Arithmetic is
    // ordered identically on both sides so doubles agree exactly.
    QueryDef(
      "q32_quality_score",
      (s, dir) =>
        Tables(s, dir, "documents")
          .select(col("doc_id"), col("lang"), qualityExpr.as("quality"))
          .orderBy("doc_id"),
      Some(s"""SELECT doc_id, lang, $QualitySql AS quality
        FROM documents ORDER BY doc_id""")
    ),

    // ------------------------------------------------------------------
    // E14: language identification via character-bigram profiles learned
    // from the corpus itself (top-40 bigrams per language, rank-weighted)
    // and re-applied per document. Output is the lang × predicted-lang
    // confusion matrix. ORACLE-EXACT despite being multi-stage: the
    // whole pipeline is integer arithmetic (counts, rank weights), so
    // the DuckDB restatement below must be kept in lockstep with any
    // bigram/scoring change — plus PipelineSpec pins per-doc coverage.
    // Scale posture: the profile is tiny → broadcast join; the bigram
    // explode is linear in corpus bytes; integer rank weights keep
    // scores exact.
    QueryDef(
      "q33_lang_id",
      (s, dir) => {
        // round-robin repartition: the bigram explode below is the
        // query's CPU, and a single-file corpus scans as ONE split —
        // spread the narrow (id, lang, text) stream across all cores
        // first (same pattern as Dedup.docsWide)
        val docs = Tables(s, dir, "documents")
          .select(col("doc_id"), col("lang"), lower(col("text")).as("t"))
          .repartition(s.sparkContext.defaultParallelism)
        // adjacent-char pairs via the native `char_ngrams` codegen
        // expression (graft.functions.CharNgrams): one UTF-8 boundary
        // walk per row, bit-identical to the zip_with-over-split chain
        // it replaces (which paid three interpreted split()
        // materializations per row — CharNgramsSpec pins the
        // equivalence, including surrogate pairs).
        val bigrams = docs.select(
          col("doc_id"),
          col("lang"),
          explode(expr("char_ngrams(t, 2)")).as("bg")
        )
        // per-doc bigram counts feed BOTH the profile (re-aggregated per
        // language) and the scoring join; AQE reuses the shared aggregate
        // stage at runtime (measured: an explicit cache() adds write
        // overhead with zero gain). The explicit isNotNull matches the
        // constraint the scoring join infers on its side so both
        // branches canonicalize identically.
        val docbg = bigrams
          .filter(col("bg").isNotNull)
          .groupBy("doc_id", "lang", "bg")
          .agg(count(lit(1)).as("n"))
        val wProfile = Window.partitionBy("p_lang").orderBy(col("cnt").desc, col("bg"))
        val profile = docbg
          .groupBy(col("lang").as("p_lang"), col("bg"))
          .agg(sum(col("n")).as("cnt"))
          .withColumn("rk", row_number().over(wProfile))
          .filter(col("rk") <= 40)
          .select(col("p_lang"), col("bg"), (lit(41) - col("rk")).cast("long").as("w"))
        val scored = docbg
          .join(broadcast(profile), Seq("bg"))
          .groupBy("doc_id", "lang", "p_lang")
          .agg(sum(col("n") * col("w")).as("score"))
        val wBest = Window.partitionBy("doc_id").orderBy(col("score").desc, col("p_lang"))
        scored
          .withColumn("rk", row_number().over(wBest))
          .filter(col("rk") === 1)
          .groupBy(col("lang"), col("p_lang").as("pred_lang"))
          .agg(count(lit(1)).as("cnt"))
          .orderBy("lang", "pred_lang")
      },
      // the whole pipeline is integer arithmetic (counts, rank weights),
      // so even this multi-stage query is oracle-exact
      Some("""WITH docs AS (SELECT doc_id, lang, lower(text) AS t FROM documents),
        bigrams AS (SELECT doc_id, lang, substring(t, i, 2) AS bg
                    FROM (SELECT doc_id, lang, t, unnest(range(1, length(t))) AS i FROM docs)),
        profile AS (
          SELECT p_lang, bg, CAST(41 - rk AS BIGINT) AS w FROM (
            SELECT lang AS p_lang, bg, count(*) AS cnt,
                   row_number() OVER (PARTITION BY lang ORDER BY count(*) DESC, bg) AS rk
            FROM bigrams GROUP BY lang, bg) WHERE rk <= 40),
        docbg AS (SELECT doc_id, lang, bg, count(*) AS n FROM bigrams GROUP BY 1, 2, 3),
        scored AS (SELECT doc_id, lang, p_lang, sum(n * w) AS score
                   FROM docbg JOIN profile USING (bg) GROUP BY 1, 2, 3),
        best AS (SELECT doc_id, lang, p_lang FROM (
          SELECT doc_id, lang, p_lang,
                 row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, p_lang) AS rk
          FROM scored) WHERE rk = 1)
        SELECT lang, p_lang AS pred_lang, count(*) AS cnt
        FROM best GROUP BY 1, 2 ORDER BY 1, 2""")
    ),

    // ------------------------------------------------------------------
    // E14: content fingerprint — polynomial rolling hash over the token
    // stream (order-sensitive, unlike a token-set hash). Per-token hash
    // is the native `rolling_hash` expression; the outer fold is one
    // codegen'd `aggregate` call. Every intermediate stays below 2^63
    // (mod 1e9+7), and the whole computation is engine-agnostic, so the
    // oracle reproduces it with nested list_reduce folds.
    QueryDef(
      "q34_fingerprint",
      (s, dir) =>
        Tables(s, dir, "documents")
          .select(
            col("doc_id"),
            expr(
              """aggregate(split(text, ' '), cast(0 as bigint),
                 (acc, x) -> pmod(acc * 1000003 + rolling_hash(x), 1000000007))"""
            ).as("fp")
          )
          .orderBy("doc_id"),
      Some("""SELECT doc_id,
        list_reduce(
          list_prepend(CAST(0 AS BIGINT),
            list_transform(string_split(text, ' '),
              t -> list_reduce(
                     list_prepend(CAST(0 AS BIGINT),
                       list_transform(range(1, length(t)+1),
                         i -> CAST(ascii(substring(t, i, 1)) AS BIGINT))),
                     (a, b) -> (a*31 + b) % 1000000007))),
          (a, b) -> (a*1000003 + b) % 1000000007) AS fp
        FROM documents ORDER BY doc_id""")
    ),

    // ------------------------------------------------------------------
    // E14: codepoint rolling hash — the ORACLE-CHECKABLE fingerprint
    // variant: a modular polynomial over unicode code points, engine-
    // agnostic (unlike q34's xxhash64-based one). Both sides fold in
    // index order with the same modulus.
    QueryDef(
      "q48_codepoint_fingerprint",
      (s, dir) =>
        Tables(s, dir, "documents")
          .select(
            col("doc_id"),
            // engine-native fused loop (graft.functions.RollingHash) —
            // bit-identical to the HOF formulation
            // aggregate(transform(split(text,''), ascii), 0, pmod(acc*31+c))
            // without its two per-row array materializations
            expr("rolling_hash(text)").as("fp")
          )
          .orderBy("doc_id"),
      Some("""SELECT doc_id,
        list_reduce(
          list_prepend(CAST(0 AS BIGINT),
            list_transform(range(1, length(text)+1),
                           i -> CAST(ascii(substring(text, i, 1)) AS BIGINT))),
          (a, b) -> (a * 31 + b) % 1000000007) AS fp
        FROM documents ORDER BY doc_id""")
    ),

    // ------------------------------------------------------------------
    // E14: TF-IDF with a RATIONAL idf (tf · N/df instead of tf · ln(N/df))
    // so the score is two exactly-rounded float ops over exact integers —
    // bit-identical across engines, hence oracle-checkable (libm `ln`
    // may differ in the last ulp between JVMs and DuckDB). Top-3 terms
    // per document for the first 50 docs. The corpus size joins in as a
    // broadcast scalar — no driver-side count in the plan.
    QueryDef(
      "q38_tfidf_terms",
      (s, dir) => {
        val docs = Tables(s, dir, "documents")
        val toks = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
        val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
        val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
        val nDocs = docs.agg(count(lit(1)).as("n_docs"))
        val w = Window.partitionBy("doc_id").orderBy(col("score").desc, col("term"))
        tf.filter(col("doc_id") < 50)
          .join(dfreq, Seq("term"))
          .crossJoin(broadcast(nDocs))
          .withColumn(
            "score",
            col("tf").cast("double") * (col("n_docs").cast("double") / col("df").cast("double"))
          )
          .withColumn("rk", row_number().over(w).cast("long"))
          .filter(col("rk") <= 3)
          .select("doc_id", "rk", "term", "tf", "df", "score")
          .orderBy("doc_id", "rk")
      },
      Some("""WITH toks AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
        ), tf AS (
          SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2
        ), dfreq AS (
          SELECT term, count(*) AS df FROM tf GROUP BY 1
        ), n AS (SELECT count(*) AS n_docs FROM documents)
        SELECT doc_id, CAST(rk AS BIGINT) AS rk, term, tf, df, score
        FROM (SELECT doc_id, term, tf, df,
                     CAST(tf AS DOUBLE) * (CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE)) AS score,
                     row_number() OVER (PARTITION BY doc_id
                                        ORDER BY CAST(tf AS DOUBLE) * (CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE)) DESC,
                                                 term) AS rk
              FROM tf JOIN dfreq USING (term) CROSS JOIN n
              WHERE doc_id < 50)
        WHERE rk <= 3 ORDER BY doc_id, rk""")
    ),

    // ------------------------------------------------------------------
    // E14: corpus-level n-gram frequency — top-20 word bigrams.
    QueryDef(
      "q39_ngram_freq",
      (s, dir) =>
        Tables(s, dir, "documents")
          .select(split(col("text"), " ").as("ws"))
          .filter(size(col("ws")) >= 2)
          .select(
            explode(
              expr("transform(sequence(1, size(ws)-1), i -> concat_ws(' ', slice(ws, i, 2)))")
            ).as("bigram")
          )
          .groupBy("bigram")
          .agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc, col("bigram"))
          .limit(20),
      Some("""SELECT ws[i] || ' ' || ws[i+1] AS bigram, count(*) AS cnt
        FROM (SELECT ws, unnest(range(1, len(ws))) AS i
              FROM (SELECT string_split(text, ' ') AS ws FROM documents
                    WHERE len(string_split(text, ' ')) >= 2))
        GROUP BY 1 ORDER BY cnt DESC, bigram LIMIT 20""")
    ),

    // ------------------------------------------------------------------
    // Quality-filter FUNNEL (training-data pipeline): the per-stage
    // retention report every corpus-cleaning run produces. Stages
    // compose as a cascade — each count is over rows surviving all
    // previous stages, computed in ONE pass via conditional aggregation
    // (sum of stage predicates), not four scans: at 100 TB the corpus
    // is read once and the funnel falls out of a single map-side
    // aggregate.
    QueryDef(
      "q69_filter_funnel",
      (s, dir) => {
        val ws = split(col("text"), " ")
        val stopRatio = size(filter(ws, t => t.isin("the", "a", "of", "and", "to")))
          .cast("double") / size(ws)
        val p1 = size(ws).between(20, 400)
        val p2 = p1 && col("lang").isin("en", "de", "fr", "es")
        val p3 = p2 && stopRatio < 0.3
        val agg = Tables(s, dir, "documents")
          .agg(
            count(lit(1)).as("c0"),
            sum(when(p1, 1L).otherwise(0L)).as("c1"),
            sum(when(p2, 1L).otherwise(0L)).as("c2"),
            sum(when(p3, 1L).otherwise(0L)).as("c3")
          )
        // unpivot the one aggregate row with stack() — a 4-way union of
        // selects over the same aggregate would put four copies of the
        // scan+agg subtree in the logical plan and lean on exchange
        // reuse to dedupe them; stack keeps the single-pass shape
        // structural, not an optimizer courtesy
        agg
          .selectExpr(
            "stack(4, '0_total', c0, '1_length', c1, '2_lang', c2, '3_stopword', c3) AS (stage, kept)"
          )
          .orderBy("stage")
      },
      Some("""WITH d AS (
          SELECT lang,
                 len(string_split(text, ' ')) AS n_tok,
                 CAST(len(list_filter(string_split(text, ' '),
                      t -> t IN ('the', 'a', 'of', 'and', 'to'))) AS DOUBLE)
                   / len(string_split(text, ' ')) AS stop_ratio
          FROM documents
        ), agg AS (
          SELECT count(*) AS c0,
                 sum(CASE WHEN n_tok BETWEEN 20 AND 400 THEN 1 ELSE 0 END) AS c1,
                 sum(CASE WHEN n_tok BETWEEN 20 AND 400
                           AND lang IN ('en', 'de', 'fr', 'es') THEN 1 ELSE 0 END) AS c2,
                 sum(CASE WHEN n_tok BETWEEN 20 AND 400
                           AND lang IN ('en', 'de', 'fr', 'es')
                           AND stop_ratio < 0.3 THEN 1 ELSE 0 END) AS c3
          FROM d
        )
        SELECT stage, kept FROM (
          SELECT '0_total' AS stage, CAST(c0 AS BIGINT) AS kept FROM agg
          UNION ALL SELECT '1_length', CAST(c1 AS BIGINT) FROM agg
          UNION ALL SELECT '2_lang', CAST(c2 AS BIGINT) FROM agg
          UNION ALL SELECT '3_stopword', CAST(c3 AS BIGINT) FROM agg
        ) ORDER BY stage""")
    ),

    // ------------------------------------------------------------------
    // PII redaction (training-data pipeline). The synthetic corpus holds
    // no PII, so both engines first derive the same contact-bearing text
    // (append a deterministic email + phone per doc), then redact by
    // regex — the patterns are the real thing: emails and NNN-NNNN
    // phones, restricted to constructs Java regex and RE2 share.
    // Redaction count comes from regexp_count on the SAME pattern, so
    // the oracle checks both the rewrite and the match census.
    QueryDef(
      "q70_pii_redact",
      (s, dir) => {
        val contact = concat(
          col("text"),
          lit(" contact user"), col("doc_id"), lit("@example.org or 555-"),
          lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0")
        )
        Tables(s, dir, "documents")
          .select(col("doc_id"), contact.as("raw"))
          .select(
            col("doc_id"),
            (regexp_count(col("raw"), lit(EmailRe)) +
              regexp_count(col("raw"), lit(PhoneRe))).cast("long").as("n_pii"),
            regexp_replace(
              regexp_replace(col("raw"), EmailRe, "<EMAIL>"),
              PhoneRe,
              "<PHONE>"
            ).as("clean")
          )
          .select(
            col("doc_id"),
            col("n_pii"),
            length(col("clean")).cast("long").as("clean_len"),
            substring(col("clean"), -30, 30).as("clean_tail")
          )
          .orderBy("doc_id")
      },
      // patterns interpolated from the SAME constants the Spark side
      // uses — one source of truth for what "PII" means here
      Some(s"""WITH raw AS (
          SELECT doc_id,
                 text || ' contact user' || doc_id || '@example.org or 555-' ||
                   lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS raw
          FROM documents
        ), cleaned AS (
          SELECT doc_id, raw,
                 regexp_replace(regexp_replace(raw,
                   '$EmailRe', '<EMAIL>', 'g'),
                   '$PhoneRe', '<PHONE>', 'g') AS clean
          FROM raw
        )
        SELECT doc_id,
               CAST(len(regexp_extract_all(raw, '$EmailRe')) +
                    len(regexp_extract_all(raw, '$PhoneRe')) AS BIGINT) AS n_pii,
               CAST(len(clean) AS BIGINT) AS clean_len,
               CASE WHEN len(clean) >= 30 THEN right(clean, 30)
                    ELSE clean END AS clean_tail
        FROM cleaned ORDER BY doc_id""")
    ),

    // ------------------------------------------------------------------
    // Per-entity cap — the curation step that stops any single source
    // from dominating the corpus: rank each source's documents by the
    // q32 quality score (shared expression, so the two can't drift)
    // and keep the top 3, emitting the KEPT SET itself (source, rank,
    // doc, quality) rather than a summary — so the oracle pins exactly
    // which documents survive. Deterministic tie-break on doc_id makes
    // the ranking total; both engines compute bit-identical doubles
    // (see qualityExpr). Plan: the bounded `top_k_structs` heap per
    // source — map-side partial heaps, the exchange carries ≤ 3 rows
    // per source — the same scale-correct "N per key" cut as the ANN
    // family (a per-source window sort would hash every document into
    // |sources| partitions and sort each; sources are FEW and HOT by
    // construction, the exact skew the heap exists for). Ranks are
    // recovered by position in the sorted heap output.
    QueryDef(
      "q117_source_cap",
      (s, dir) =>
        Tables(s, dir, "documents")
          .select(col("doc_id"), col("source"), qualityExpr.as("quality"))
          .groupBy("source")
          .agg(expr("top_k_structs(struct(-quality AS nq, doc_id), 3)").as("ks"))
          .select(col("source"), posexplode(col("ks")).as(Seq("pos", "k")))
          .select(
            col("source"),
            (col("pos") + 1).cast("long").as("rn"),
            col("k.doc_id").as("doc_id"),
            (-col("k.nq")).as("quality")
          )
          .orderBy("source", "rn"),
      Some(s"""SELECT source, rn, doc_id, quality FROM (
          SELECT source, doc_id, quality,
                 row_number() OVER (PARTITION BY source
                                    ORDER BY quality DESC, doc_id) AS rn
          FROM (SELECT doc_id, source, $QualitySql AS quality FROM documents))
        WHERE rn <= 3 ORDER BY source, rn""")
    ),

    // ------------------------------------------------------------------
    // BPE merge statistics — the first iteration of byte-pair-encoding
    // tokenizer training (Sennrich et al. 2016), the one corpus scan a
    // tokenizer build runs before anything else: for every within-word
    // adjacent symbol pair, its total occurrence count and the number
    // of distinct word types containing it. The top pair IS the first
    // BPE merge; re-running this scan after each merge is the whole
    // algorithm, so the registered query is the per-iteration workhorse
    // shape. Pairs come from the native `char_ngrams` codegen walk
    // (graft.functions.CharNgrams — no interpreted splits); word
    // tokenization is the same lowercase-alpha split the corpus stats
    // queries use. Plan at 100 TB: explode is map-side; the pair
    // aggregate partial-aggregates before its single hash exchange
    // (count + distinct-word count share one expand); top-40 is
    // TakeOrderedAndProject, never a global sort. All-integer counts
    // with a (cnt DESC, pair) total order keep the oracle hash-exact.
    QueryDef(
      "q136_bpe_pairs",
      (s, dir) => {
        val words = Tables(s, dir, "documents")
          .select(explode(split(lower(col("text")), "[^a-z]+")).as("w"))
          .filter(length(col("w")) >= 2)
        words
          .select(col("w"), explode(expr("char_ngrams(w, 2)")).as("pair"))
          .groupBy("pair")
          .agg(
            count(lit(1)).as("cnt"),
            countDistinct(col("w")).as("n_word_types")
          )
          .orderBy(col("cnt").desc, col("pair"))
          .limit(40)
      },
      Some("""WITH words AS (
          SELECT w FROM (
            SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS w
            FROM documents)
          WHERE length(w) >= 2
        ), pairs AS (
          SELECT w, substring(w, i, 2) AS pair
          FROM (SELECT w, unnest(range(1, length(w))) AS i FROM words)
        )
        SELECT pair, count(*) AS cnt, count(DISTINCT w) AS n_word_types
        FROM pairs GROUP BY 1 ORDER BY cnt DESC, pair LIMIT 40""")
    ),

    // ------------------------------------------------------------------
    // BPE tokenizer training, THREE merge iterations deep — the
    // iterate-on-derived-vocab shape (each round's pair counts depend
    // on the previous round's merge having been APPLIED), the way
    // PageRank exercises iterate-on-rank. Output: each step's top-5
    // pair-count table (rank 1 is the merge learned that step), so the
    // oracle pins not just the chosen merges but the evolving count
    // tables around them.
    //
    // The working set is the word-TYPE histogram (types ≪ tokens —
    // Sennrich et al. 2016 train on exactly this), localCheckpointed
    // once so the three iterations re-fold a small materialized table
    // instead of re-scanning the corpus per step. The greedy
    // left-to-right merge is a string-accumulator fold (`aggregate`):
    // append the next symbol, or — when the accumulator's LAST symbol
    // is `ma` and the incoming one is `mb` — splice them; because the
    // merged symbol no longer equals `ma`, overlapping runs resolve
    // exactly as canonical greedy BPE ("aaaa" → "aa aa"). The chosen
    // pair enters the plan as a broadcast 1-row cross join, so the
    // whole 3-deep program is one DAG — no driver-side collect of
    // anything data-sized. DuckDB mirrors the fold with list_reduce
    // and an identical CASE, making every count integer-exact.
    // Plan at 100 TB: one corpus scan + one hash exchange build the
    // histogram; each iteration is then histogram-sized (map-side fold
    // + one pair-count exchange + TakeOrdered top-5).
    QueryDef(
      "q140_bpe_train",
      (s, dir) => {
        val words = bpeWordHistogram(s, dir)
        val t1 = bpeTop5(1, words)
        val s1 = bpeApplyMerge(words, t1)
        val t2 = bpeTop5(2, s1)
        val s2 = bpeApplyMerge(s1, t2)
        val t3 = bpeTop5(3, s2)
        t1.unionByName(t2)
          .unionByName(t3)
          .select("step", "rk", "a", "b", "cnt")
          .orderBy("step", "rk")
      },
      Some("""WITH words AS (
          SELECT w, count(*) AS c FROM (
            SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS w
            FROM documents)
          WHERE length(w) >= 2 GROUP BY w
        ), s0 AS (SELECT w, c, string_split(w, '') AS sym FROM words),
        pc1 AS (
          SELECT sym[i] AS a, sym[i+1] AS b, CAST(sum(c) AS BIGINT) AS cnt
          FROM (SELECT c, sym, unnest(range(1, len(sym))) AS i FROM s0)
          GROUP BY 1, 2),
        t1 AS (SELECT CAST(1 AS BIGINT) AS step,
                      CAST(row_number() OVER (ORDER BY cnt DESC, a, b) AS BIGINT) AS rk,
                      a, b, cnt
               FROM pc1 ORDER BY cnt DESC, a, b LIMIT 5),
        s1 AS (SELECT w, c,
                      string_split(list_reduce(sym, (acc, x) -> CASE
                        WHEN x = mb AND (acc = ma OR right(acc, length(ma)+1) = ' ' || ma)
                        THEN left(acc, length(acc)-length(ma)) || ma || mb
                        ELSE acc || ' ' || x END), ' ') AS sym
               FROM s0 CROSS JOIN (SELECT a AS ma, b AS mb FROM t1 WHERE rk = 1)),
        pc2 AS (
          SELECT sym[i] AS a, sym[i+1] AS b, CAST(sum(c) AS BIGINT) AS cnt
          FROM (SELECT c, sym, unnest(range(1, len(sym))) AS i FROM s1)
          GROUP BY 1, 2),
        t2 AS (SELECT CAST(2 AS BIGINT) AS step,
                      CAST(row_number() OVER (ORDER BY cnt DESC, a, b) AS BIGINT) AS rk,
                      a, b, cnt
               FROM pc2 ORDER BY cnt DESC, a, b LIMIT 5),
        s2 AS (SELECT w, c,
                      string_split(list_reduce(sym, (acc, x) -> CASE
                        WHEN x = mb AND (acc = ma OR right(acc, length(ma)+1) = ' ' || ma)
                        THEN left(acc, length(acc)-length(ma)) || ma || mb
                        ELSE acc || ' ' || x END), ' ') AS sym
               FROM s1 CROSS JOIN (SELECT a AS ma, b AS mb FROM t2 WHERE rk = 1)),
        pc3 AS (
          SELECT sym[i] AS a, sym[i+1] AS b, CAST(sum(c) AS BIGINT) AS cnt
          FROM (SELECT c, sym, unnest(range(1, len(sym))) AS i FROM s2)
          GROUP BY 1, 2),
        t3 AS (SELECT CAST(3 AS BIGINT) AS step,
                      CAST(row_number() OVER (ORDER BY cnt DESC, a, b) AS BIGINT) AS rk,
                      a, b, cnt
               FROM pc3 ORDER BY cnt DESC, a, b LIMIT 5)
        SELECT step, rk, a, b, cnt
        FROM (SELECT * FROM t1 UNION ALL SELECT * FROM t2 UNION ALL SELECT * FROM t3)
        ORDER BY step, rk""")
    ),

    // ------------------------------------------------------------------
    // Distributional typicality scoring — an INTEGER-EXACT perplexity
    // proxy: score each document by the average corpus frequency of
    // its within-word character bigrams (typical text is made of
    // typical bigrams; boilerplate, mojibake, and language outliers
    // score low). A true LM perplexity needs log-probabilities, whose
    // libm low bits differ across engines — the fixed-point mean
    // frequency ((Σ freq)·10⁶ DIV n) ranks documents the same way and
    // hashes identically. Emits the 25 LEAST typical documents — the
    // review queue a curation pass actually reads. Plan: the bigram
    // occurrence stream is map-side (native char_ngrams walk); corpus
    // counts are one partial-agg'd exchange into a charset²-bounded
    // table that broadcast-joins back onto the stream (the stream is
    // recomputed, not cached — at 100 TB you'd persist the TINY count
    // table, never the occurrences); per-doc sums are one doc-keyed
    // exchange; top-25 is TakeOrdered.
    QueryDef(
      "q144_typicality",
      (s, dir) => {
        def occurrences =
          Tables(s, dir, "documents")
            .select(col("doc_id"), explode(split(lower(col("text")), "[^a-z]+")).as("w"))
            .filter(length(col("w")) >= 2)
            .select(col("doc_id"), explode(expr("char_ngrams(w, 2)")).as("pair"))
        val counts = occurrences.groupBy("pair").agg(count(lit(1)).as("freq"))
        occurrences
          .join(broadcast(counts), Seq("pair"))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_bigrams"), sum("freq").as("sum_freq"))
          // documented headroom bound (same discipline as Int8Quantize's
          // q_sum): the ×10⁶ scaling overflows BIGINT only when a single
          // document's Σ freq exceeds 2^63/10⁶ ≈ 9.2·10¹² — i.e. ~10³
          // bigrams each seen ~10¹⁰ times corpus-wide; raise the scale
          // divisor or drop to ×10³ before a corpus that large
          .withColumn("avg_freq_micros", expr("sum_freq * 1000000L DIV n_bigrams"))
          .orderBy(col("avg_freq_micros").asc, col("doc_id"))
          .limit(25)
          .select("doc_id", "n_bigrams", "sum_freq", "avg_freq_micros")
      },
      Some("""WITH occ AS (
          SELECT doc_id, substring(w, i, 2) AS pair
          FROM (SELECT doc_id, w, unnest(range(1, length(w))) AS i
                FROM (SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z]+')) AS w
                      FROM documents)
                WHERE length(w) >= 2)),
        cnt AS (SELECT pair, count(*) AS freq FROM occ GROUP BY 1),
        scored AS (
          SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
                 CAST(sum(freq) AS BIGINT) AS sum_freq
          FROM occ JOIN cnt USING (pair) GROUP BY 1)
        SELECT doc_id, n_bigrams, sum_freq,
               (sum_freq * 1000000) // n_bigrams AS avg_freq_micros
        FROM scored ORDER BY avg_freq_micros, doc_id LIMIT 25""")
    ),

    // ------------------------------------------------------------------
    // BPE ENCODE — the other half of the tokenizer lifecycle: apply
    // the three merges q140 learned (same shared machinery, so the
    // applied tokenizer can never drift from the trained one) to the
    // whole word histogram and emit the resulting symbol vocabulary —
    // per-symbol corpus frequency and distinct word types, top 30.
    // Merged symbols ("er", "in", …) surface with the counts their
    // constituent pairs had, and single chars keep only their unmerged
    // residue — so the oracle (the q140 CTE extended one apply step
    // and an unnest/count) pins that every merge was applied, in
    // order, with the canonical greedy fold. Encoding is the map-side
    // fold only — at 100 TB this is the per-document tokenize pass;
    // the symbol count here is its auditable corpus-level summary.
    QueryDef(
      "q142_bpe_encode",
      (s, dir) =>
        bpeEncoded(s, dir)
          .select(col("w"), col("c"), explode(col("sym")).as("sym_"))
          .groupBy(col("sym_").as("sym"))
          .agg(sum("c").as("cnt"), countDistinct(col("w")).as("n_word_types"))
          .orderBy(col("cnt").desc, col("sym"))
          .limit(30),
      Some("""WITH words AS (
          SELECT w, count(*) AS c FROM (
            SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS w
            FROM documents)
          WHERE length(w) >= 2 GROUP BY w
        ), s0 AS (SELECT w, c, string_split(w, '') AS sym FROM words),
        pc1 AS (
          SELECT sym[i] AS a, sym[i+1] AS b, CAST(sum(c) AS BIGINT) AS cnt
          FROM (SELECT c, sym, unnest(range(1, len(sym))) AS i FROM s0)
          GROUP BY 1, 2),
        m1 AS (SELECT a AS ma, b AS mb FROM pc1 ORDER BY cnt DESC, a, b LIMIT 1),
        s1 AS (SELECT w, c,
                      string_split(list_reduce(sym, (acc, x) -> CASE
                        WHEN x = mb AND (acc = ma OR right(acc, length(ma)+1) = ' ' || ma)
                        THEN left(acc, length(acc)-length(ma)) || ma || mb
                        ELSE acc || ' ' || x END), ' ') AS sym
               FROM s0 CROSS JOIN m1),
        pc2 AS (
          SELECT sym[i] AS a, sym[i+1] AS b, CAST(sum(c) AS BIGINT) AS cnt
          FROM (SELECT c, sym, unnest(range(1, len(sym))) AS i FROM s1)
          GROUP BY 1, 2),
        m2 AS (SELECT a AS ma, b AS mb FROM pc2 ORDER BY cnt DESC, a, b LIMIT 1),
        s2 AS (SELECT w, c,
                      string_split(list_reduce(sym, (acc, x) -> CASE
                        WHEN x = mb AND (acc = ma OR right(acc, length(ma)+1) = ' ' || ma)
                        THEN left(acc, length(acc)-length(ma)) || ma || mb
                        ELSE acc || ' ' || x END), ' ') AS sym
               FROM s1 CROSS JOIN m2),
        pc3 AS (
          SELECT sym[i] AS a, sym[i+1] AS b, CAST(sum(c) AS BIGINT) AS cnt
          FROM (SELECT c, sym, unnest(range(1, len(sym))) AS i FROM s2)
          GROUP BY 1, 2),
        m3 AS (SELECT a AS ma, b AS mb FROM pc3 ORDER BY cnt DESC, a, b LIMIT 1),
        s3 AS (SELECT w, c,
                      string_split(list_reduce(sym, (acc, x) -> CASE
                        WHEN x = mb AND (acc = ma OR right(acc, length(ma)+1) = ' ' || ma)
                        THEN left(acc, length(acc)-length(ma)) || ma || mb
                        ELSE acc || ' ' || x END), ' ') AS sym
               FROM s2 CROSS JOIN m3)
        SELECT sym, cnt, n_word_types FROM (
          SELECT sym_ AS sym, CAST(sum(c) AS BIGINT) AS cnt,
                 CAST(count(DISTINCT w) AS BIGINT) AS n_word_types
          FROM (SELECT w, c, unnest(sym) AS sym_ FROM s3)
          GROUP BY 1)
        ORDER BY cnt DESC, sym LIMIT 30""")
    ),

    // ------------------------------------------------------------------
    // Held-out language-model scoring — the LEAKAGE-SAFE form of q144's
    // typicality proxy: an add-1-smoothed word-BIGRAM model is trained
    // on an md5-split ~75% of the corpus and scores only the HELD-OUT
    // 25%, so no document is ever scored by statistics it contributed
    // to (the difference between a perplexity FILTER and a perplexity
    // echo chamber). All arithmetic is fixed-point integer — per-bigram
    // probability (c₂+1)·10⁶ DIV (c₁+V), per-doc mean a second DIV —
    // so both engines hash identically; a libm-log perplexity would
    // rank the same but drift in low bits. Headroom: (c₂+1)·10⁶
    // overflows int64 only past ~9.2·10¹² occurrences of one bigram.
    // Plan: bigram pairs are a map-side transform of the word array;
    // model counts are two partial-agg'd exchanges (bigram-type- and
    // vocab-scaled, never corpus-scaled); scoring joins are equi-joins
    // on (w1,w2)/(w1) that AQE broadcasts when the model is small; the
    // per-doc roll-up is one doc-keyed exchange.
    QueryDef(
      "q162_bigram_lm",
      (s, dir) => {
        val docs = Tables(s, dir, "documents")
          .select(
            col("doc_id"),
            expr("filter(split(text, ' '), x -> x <> '')").as("ws"),
            expr(
              "CASE WHEN substring(md5(cast(doc_id AS string)), 1, 1) < 'c' " +
                "THEN 'train' ELSE 'heldout' END"
            ).as("part")
          )
          .filter(size(col("ws")) >= 2)
        val bigrams = docs
          .select(
            col("doc_id"),
            col("part"),
            explode(
              expr(
                "transform(sequence(1, size(ws) - 1), " +
                  "i -> struct(element_at(ws, i) AS w1, element_at(ws, i + 1) AS w2))"
              )
            ).as("bg")
          )
          .select(col("doc_id"), col("part"), col("bg.w1"), col("bg.w2"))
        val train = bigrams.filter(col("part") === "train")
        val c2 = train.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
        val c1 = train.groupBy("w1").agg(count(lit(1)).as("c1"))
        val v = train.agg(countDistinct(col("w2")).as("vv"))
        bigrams
          .filter(col("part") === "heldout")
          .join(c2, Seq("w1", "w2"), "left")
          .join(c1, Seq("w1"), "left")
          .crossJoin(broadcast(v))
          // greatest(vv, 1): with a degenerate EMPTY training split the
          // vocabulary is 0 and the smoothed denominator would divide by
          // zero (ANSI mode: a runtime error); any real corpus has vv ≥ 1,
          // so the guard never changes an oracle-checked result
          .withColumn(
            "pm",
            expr("(coalesce(c2, 0L) + 1) * 1000000L DIV (coalesce(c1, 0L) + greatest(vv, 1L))")
          )
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_bigrams"), sum("pm").as("sum_micros"))
          .withColumn("avg_micros", expr("sum_micros DIV n_bigrams"))
          .orderBy("doc_id")
      },
      Some("""WITH docs AS (
          SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws,
                 CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'c'
                      THEN 'train' ELSE 'heldout' END AS part
          FROM documents),
        bg AS (
          SELECT doc_id, part, ws[i] AS w1, ws[i+1] AS w2
          FROM (SELECT doc_id, part, ws, unnest(range(1, len(ws))) AS i
                FROM docs WHERE len(ws) >= 2)),
        c2 AS (SELECT w1, w2, count(*) AS c2 FROM bg WHERE part = 'train' GROUP BY 1, 2),
        c1 AS (SELECT w1, count(*) AS c1 FROM bg WHERE part = 'train' GROUP BY 1),
        v AS (SELECT count(DISTINCT w2) AS vv FROM bg WHERE part = 'train'),
        scored AS (
          SELECT b.doc_id,
                 (coalesce(c2.c2, 0) + 1) * 1000000 // (coalesce(c1.c1, 0) + v.vv) AS pm
          FROM bg b
          LEFT JOIN c2 ON b.w1 = c2.w1 AND b.w2 = c2.w2
          LEFT JOIN c1 ON b.w1 = c1.w1
          CROSS JOIN v
          WHERE b.part = 'heldout')
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
               CAST(sum(pm) AS BIGINT) AS sum_micros,
               CAST(sum(pm) AS BIGINT) // count(*) AS avg_micros
        FROM scored GROUP BY doc_id ORDER BY doc_id""")
    ),

    // ------------------------------------------------------------------
    // Severity-weighted lexicon screen — the wordlist-driven content
    // filter every corpus pipeline runs before (or instead of) a model
    // classifier: each lexicon term carries a severity weight, a
    // document's score is Σ weight over its matching tokens, and docs
    // at or above the threshold are flagged for exclusion/review. The
    // lexicon here is tiny and synthetic (terms drawn from the test
    // vocabulary); the OPERATOR is the real thing — lexicons are
    // curated small tables (100s–10000s of rows), so the match is a
    // broadcast equi-join the token stream flows through map-side, and
    // the per-doc roll-up is the one doc-keyed exchange. Exact-match
    // tokens, not substrings: "dup" must not flag "dedup" (substring
    // lexicons are a different operator — q70's regex census covers
    // patterns). Integer weights ⇒ oracle-exact.
    QueryDef(
      "q165_lexicon_screen",
      (s, dir) => {
        import s.implicits._
        val lex = Seq(("slow", 4L), ("dup", 5L), ("big", 2L), ("small", 1L))
          .toDF("tok", "weight")
        Tables(s, dir, "documents")
          .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
          .filter(length(col("tok")) > 0)
          .join(broadcast(lex), Seq("tok"))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("hits"), sum("weight").as("score"))
          .withColumn("flagged", col("score") >= 20)
          .orderBy("doc_id")
      },
      Some("""WITH lex(tok, weight) AS (
          VALUES ('slow', 4), ('dup', 5), ('big', 2), ('small', 1)),
        toks AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
        SELECT doc_id, CAST(count(*) AS BIGINT) AS hits,
               CAST(sum(weight) AS BIGINT) AS score,
               CAST(sum(weight) AS BIGINT) >= 20 AS flagged
        FROM toks JOIN lex USING (tok)
        WHERE len(tok) > 0
        GROUP BY doc_id ORDER BY doc_id""")
    ),

    // ------------------------------------------------------------------
    // Unigram-LM tokenizer (operators/UnigramTokenizer) — the OTHER
    // tokenizer family beside BPE (q140/q142): a piece vocabulary is
    // derived from the corpus (top-40 multi-char substrings ≤4 chars
    // by weighted occurrence count, plus every single char so
    // segmentation is total), then every word type Viterbi-segments
    // under the determinized integer objective (fewest pieces →
    // largest score sum → longest-final-piece ties). Emits the
    // segmented corpus's symbol census — per piece: weighted uses and
    // distinct word types, top 30 — q142's output shape, so the two
    // tokenizer families are directly comparable. Plan: vocabulary
    // derivation is word-TYPE-scaled (substring explode over the
    // histogram, one partial-agg'd exchange, bounded-heap top-k); the
    // vocabulary (≤66 entries, model-scaled) broadcasts into a
    // per-word DP — the mapPartitions niche, like the media codecs;
    // the census is one more type-scaled exchange. Rows-only: the DP
    // is not SQL-expressible — UnigramTokenizerSpec pins the full
    // output against an independent plain-Scala pipeline and the DP
    // against brute-force enumeration.
    QueryDef(
      "q174_unigram_segment",
      (s, dir) => {
        import s.implicits._
        val words = Tables(s, dir, "documents")
          .select(explode(split(lower(col("text")), "[^a-z]+")).as("w"))
          .filter(length(col("w")) >= 2)
          .groupBy("w")
          .agg(count(lit(1)).as("c"))
        val pieces = words
          .select(
            col("c"),
            explode(
              expr(
                "flatten(transform(sequence(1, length(w)), st -> " +
                  "transform(sequence(st, least(st + 3, length(w))), " +
                  "en -> substring(w, st, en - st + 1))))"
              )
            ).as("piece")
          )
          .groupBy("piece")
          .agg(sum("c").as("score"))
        val top = pieces
          .filter(length(col("piece")) >= 2)
          .groupBy()
          .agg(expr("top_k_structs(struct(-score AS ns, piece), 40)").as("t"))
          .select(explode(col("t")).as("e"))
          .select(col("e.piece").as("piece"), (-col("e.ns")).as("score"))
        val vocab = top
          .unionByName(pieces.filter(length(col("piece")) === 1))
          .collect()
          .map(r => r.getString(0) -> r.getLong(1))
          .toMap
        val bc = s.sparkContext.broadcast(vocab)
        words
          .as[(String, Long)]
          .mapPartitions { it =>
            val v = bc.value
            it.flatMap { case (w, c) =>
              graft.operators.UnigramTokenizer.segment(w, v, 4).map(p => (w, c, p))
            }
          }
          .toDF("w", "c", "piece")
          .groupBy("piece")
          .agg(sum("c").as("n_uses"), countDistinct(col("w")).as("n_word_types"))
          .orderBy(desc("n_uses"), asc("piece"))
          .limit(30)
      },
      None
    ),

    // ------------------------------------------------------------------
    // E14 (RAKE keyword extraction — Rose et al. 2010): per-document
    // candidate phrases are maximal stopword-free token runs
    // (gaps-and-islands on token position, doc-bounded), word scores
    // are deg/freq over the document's own phrases (deg(w) = sum of
    // lengths of phrases containing each occurrence of w), a phrase
    // scores the sum of its words, and the top-3 phrases per document
    // come from the rank-filtered window that TopKRewrite compiles to
    // the two-phase heap — the engine's own optimization serving its
    // own operator. All scoring is integer micro-units (deg*10^6 DIV
    // freq), so the extraction is oracle-exact. 100 TB posture:
    // every step after the explode is keyed by doc_id (word stats,
    // phrase folds, ranking) — doc-bounded windows, never a corpus
    // sort; phrase reassembly is an in-group ordered fold
    // (sort_array . collect_list over unique positions).
    QueryDef(
      "q240_rake_keywords",
      (s, dir) => {
        val stop = Seq("a", "an", "the", "and", "or", "of", "to", "in", "is")
        val toks = Tables(s, dir, "documents")
          .select(col("doc_id"), posexplode(split(col("text"), " ")))
          .filter(length(col("col")) > 0)
          .select(col("doc_id"), col("pos"), col("col").as("w"))
        val inPhrase = toks
          .filter(!col("w").isin(stop: _*))
          .withColumn(
            "grp",
            col("pos") - row_number().over(Window.partitionBy("doc_id").orderBy("pos"))
          )
        val phrases = inPhrase
          .groupBy("doc_id", "grp")
          .agg(count(lit(1)).as("plen"))
        val wordScore = inPhrase
          .join(phrases, Seq("doc_id", "grp"))
          .groupBy("doc_id", "w")
          .agg((sum("plen") * lit(1000000L)).as("deg6"), count(lit(1)).as("freq"))
          .select(col("doc_id"), col("w"), expr("deg6 DIV freq").as("wscore"))
        val scored = inPhrase
          .join(wordScore, Seq("doc_id", "w"))
          .groupBy("doc_id", "grp")
          .agg(
            sum("wscore").as("score"),
            expr("array_join(transform(sort_array(collect_list(struct(pos, w))), x -> x.w), ' ')")
              .as("phrase")
          )
        val w3 = Window.partitionBy("doc_id").orderBy(desc("score"), asc("phrase"), asc("grp"))
        scored
          .withColumn("rn", row_number().over(w3))
          .filter(col("rn") <= 3)
          .select(col("doc_id"), col("rn").cast("long").as("rn"), col("phrase"), col("score"))
          .orderBy("doc_id", "rn")
      },
      Some("""WITH toks AS (
          SELECT doc_id, i - 1 AS pos, ws[i] AS w
          FROM (SELECT doc_id, string_split(text, ' ') AS ws,
                       unnest(range(1, len(string_split(text, ' ')) + 1)) AS i
                FROM documents)
          WHERE len(ws[i]) > 0),
        ip AS (
          SELECT doc_id, pos, w,
                 pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
          FROM toks
          WHERE w NOT IN ('a', 'an', 'the', 'and', 'or', 'of', 'to', 'in', 'is')),
        ph AS (SELECT doc_id, grp, count(*) AS plen FROM ip GROUP BY 1, 2),
        ws AS (
          SELECT ip.doc_id, ip.w,
                 (sum(ph.plen) * 1000000) // count(*) AS wscore
          FROM ip JOIN ph USING (doc_id, grp) GROUP BY 1, 2),
        scored AS (
          SELECT ip.doc_id, ip.grp,
                 CAST(sum(ws.wscore) AS BIGINT) AS score,
                 string_agg(ip.w, ' ' ORDER BY ip.pos) AS phrase
          FROM ip JOIN ws ON ip.doc_id = ws.doc_id AND ip.w = ws.w
          GROUP BY 1, 2),
        ranked AS (
          SELECT doc_id, phrase, score,
                 row_number() OVER (PARTITION BY doc_id
                                    ORDER BY score DESC, phrase, grp) AS rn
          FROM scored)
        SELECT doc_id, CAST(rn AS BIGINT) AS rn, phrase, score
        FROM ranked WHERE rn <= 3 ORDER BY doc_id, rn""")
    )
  )
}
