package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Corpus-level curation operators for a training-data pipeline
  * (SURVEY.md §2.3 E14 family): repetition/boilerplate signals, the
  * corpus-mix report that drives sampling weights, and chunk-level
  * exact duplication. All outputs are integer-valued, so every query
  * here is DuckDB-oracle-exact.
  */
object Corpus {

  val defs: Seq[QueryDef] = Seq(
    // ------------------------------------------------------------------
    // E14 (repetition filters): per-document n-gram repetition signals —
    // the Gopher/C4-style quality gates ("fraction of duplicated
    // n-grams", "mass of the most frequent n-gram"). Everything except
    // the bigram mode is computed LOCALLY per row (size/array_distinct
    // over the gram arrays — no shuffle); the mode needs per-(doc,gram)
    // counts, one partial-aggregated exchange keyed by (doc_id, g),
    // reduced to doc_id. Outputs stay integers (numerators/denominators,
    // not ratios) so the oracle matches bit-for-bit and downstream
    // thresholds stay exact.
    QueryDef(
      "q91_repetition_stats",
      (s, dir) => {
        // native word_ngrams (codegen, NON-distinct — these are
        // occurrence counts) replaces the interpreted HOF transform
        // chain, and the repartition spreads the per-doc n-gram CPU off
        // the single file split (see Dedup.docsWide); the >= 3 token
        // filter is unchanged so the row set matches the oracle
        val base = Tables(s, dir, "documents")
          .filter(size(split(col("text"), " ")) >= 3)
          .repartition(s.sparkContext.defaultParallelism)
          .select(
            col("doc_id"),
            expr("word_ngrams(text, 2)").as("bgs"),
            expr("word_ngrams(text, 3)").as("tgs")
          )
        // local (shuffle-free) counts: totals and distincts per doc
        val local = base.select(
          col("doc_id"),
          size(col("bgs")).cast("long").as("n_bigrams"),
          size(array_distinct(col("bgs"))).cast("long").as("n_distinct_bigrams"),
          size(col("tgs")).cast("long").as("n_trigrams"),
          size(array_distinct(col("tgs"))).cast("long").as("n_distinct_trigrams")
        )
        // the bigram MODE is the one signal that needs an aggregation
        // (a per-row HOF count-of-each-distinct is O(n²) per doc)
        val top = base
          .select(col("doc_id"), explode(col("bgs")).as("g"))
          .groupBy("doc_id", "g")
          .agg(count(lit(1)).as("n"))
          .groupBy("doc_id")
          .agg(max(col("n")).as("top_bigram_n"))
        local
          .join(top, Seq("doc_id"))
          .select(
            col("doc_id"),
            col("n_bigrams"),
            col("top_bigram_n"),
            col("n_distinct_bigrams"),
            col("n_trigrams"),
            col("n_distinct_trigrams")
          )
          .orderBy("doc_id")
      },
      Some("""WITH tok AS (
          SELECT doc_id, string_split(text, ' ') AS ws FROM documents
          WHERE len(string_split(text, ' ')) >= 3
        ), bg AS (
          SELECT doc_id, ws[i] || ' ' || ws[i+1] AS g
          FROM (SELECT doc_id, ws, unnest(range(1, len(ws))) AS i FROM tok)
        ), bgc AS (
          SELECT doc_id, g, count(*) AS n FROM bg GROUP BY 1, 2
        ), bstat AS (
          SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_bigrams,
                 CAST(max(n) AS BIGINT) AS top_bigram_n,
                 CAST(count(*) AS BIGINT) AS n_distinct_bigrams
          FROM bgc GROUP BY doc_id
        ), tg AS (
          SELECT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS g
          FROM (SELECT doc_id, ws, unnest(range(1, len(ws)-1)) AS i FROM tok)
        ), tstat AS (
          SELECT doc_id, CAST(count(*) AS BIGINT) AS n_trigrams,
                 CAST(count(DISTINCT g) AS BIGINT) AS n_distinct_trigrams
          FROM tg GROUP BY doc_id
        )
        SELECT b.doc_id AS doc_id, n_bigrams, top_bigram_n, n_distinct_bigrams,
               n_trigrams, n_distinct_trigrams
        FROM bstat b JOIN tstat t ON b.doc_id = t.doc_id
        ORDER BY b.doc_id""")
    ),

    // ------------------------------------------------------------------
    // E5/E14 (corpus-mix report): per (lang, source) token mass and its
    // parts-per-million share of the corpus — the table a training-mix
    // sampler is parameterized by. One scan, one small grouped exchange;
    // the grand total re-attaches by broadcast cross join (1 row), the
    // same shape TextOps uses for corpus-level denominators. share_ppm
    // is integer floor division so the oracle is exact.
    QueryDef(
      "q93_corpus_mix",
      (s, dir) => {
        val per = Tables(s, dir, "documents")
          .select(
            col("lang"),
            col("source"),
            size(split(col("text"), " ")).cast("long").as("ntok"),
            length(col("text")).cast("long").as("nch")
          )
          .groupBy("lang", "source")
          .agg(
            count(lit(1)).as("n_docs"),
            sum(col("ntok")).cast("long").as("total_tokens"),
            sum(col("nch")).cast("long").as("total_chars"),
            min(col("ntok")).cast("long").as("min_tokens"),
            max(col("ntok")).cast("long").as("max_tokens")
          )
        val grand = per.agg(sum(col("total_tokens")).as("grand_tokens"))
        per
          .crossJoin(broadcast(grand))
          .select(
            col("lang"),
            col("source"),
            col("n_docs"),
            col("total_tokens"),
            col("total_chars"),
            col("min_tokens"),
            col("max_tokens"),
            expr("total_tokens * 1000000 DIV grand_tokens").as("share_ppm")
          )
          .orderBy("lang", "source")
      },
      Some("""WITH per AS (
          SELECT lang, source, count(*) AS n_docs,
                 CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
                 CAST(sum(length(text)) AS BIGINT) AS total_chars,
                 CAST(min(len(string_split(text, ' '))) AS BIGINT) AS min_tokens,
                 CAST(max(len(string_split(text, ' '))) AS BIGINT) AS max_tokens
          FROM documents GROUP BY 1, 2
        )
        SELECT lang, source, n_docs, total_tokens, total_chars, min_tokens,
               max_tokens,
               CAST(total_tokens * 1000000 // (SELECT sum(total_tokens) FROM per) AS BIGINT)
                 AS share_ppm
        FROM per ORDER BY lang, source""")
    ),

    // ------------------------------------------------------------------
    // E11/E12 (chunk-level exact dedup): fixed 20-token chunks hashed
    // across the corpus; a doc's dup_chunks counts chunk positions whose
    // content appears in ≥2 distinct documents — the within-corpus
    // boilerplate measure used to trim templated spans before training.
    // Candidates come from an equi-join on the chunk content (never
    // all-pairs). At larger scale the join key would be xxhash64(g)
    // (collision-checked) to keep the shuffle narrow; here the string
    // key keeps the oracle exact.
    QueryDef(
      "q94_chunk_dedup",
      (s, dir) => {
        val ch = Tables(s, dir, "documents")
          .filter(size(split(col("text"), " ")) >= 20)
          .select(col("doc_id"), split(col("text"), " ").as("ws"))
          .select(
            col("doc_id"),
            explode(
              expr(
                "transform(sequence(0, size(ws) DIV 20 - 1), i -> concat_ws(' ', slice(ws, i*20 + 1, 20)))"
              )
            ).as("g")
          )
        val df = ch.groupBy("g").agg(countDistinct(col("doc_id")).as("nd"))
        ch.join(df, Seq("g"))
          .groupBy("doc_id")
          .agg(
            count(lit(1)).as("n_chunks"),
            sum(when(col("nd") >= 2, 1L).otherwise(0L)).cast("long").as("dup_chunks")
          )
          .orderBy("doc_id")
      },
      Some("""WITH tok AS (
          SELECT doc_id, string_split(text, ' ') AS ws FROM documents
          WHERE len(string_split(text, ' ')) >= 20
        ), ch AS (
          SELECT doc_id, array_to_string(ws[(i*20+1):(i*20+20)], ' ') AS g
          FROM (SELECT doc_id, ws, unnest(range(len(ws) // 20)) AS i FROM tok)
        ), df AS (
          SELECT g, count(DISTINCT doc_id) AS nd FROM ch GROUP BY g
        )
        SELECT ch.doc_id AS doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
               CAST(sum(CASE WHEN df.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS dup_chunks
        FROM ch JOIN df USING (g)
        GROUP BY ch.doc_id ORDER BY ch.doc_id""")
    ),

    // ------------------------------------------------------------------
    // E14: collocation extraction — the word2vec phrase-merge score
    // (Mikolov et al. 2013, "Distributed Representations of Words and
    // Phrases": score(a,b) = (c_ab − δ)·N / (c_a·c_b), δ = 5) over
    // corpus-wide bigram/unigram counts, deciding which adjacent pairs
    // fuse into phrase tokens before embedding training. The score is
    // emitted ×1e6 under INTEGER division, so both engines truncate
    // identically and the distributed result hash-matches exactly.
    // int64 headroom: the numerator needs (c_ab − 5) · N ≲ 9.2e12, so
    // a bigram with 1e5 occurrences is safe to N ≈ 1e8 tokens — beyond
    // that, widen the numerator to DECIMAL(38,0) in both engines
    // (under ANSI mode the overflow fails loudly, never silently).
    // The unigram and
    // total tables are tiny aggregates — they reach the bigram stream
    // by broadcast, never a shuffle.
    QueryDef(
      "q107_collocations",
      (s, dir) => {
        val docs = Tables(s, dir, "documents")
          .repartition(s.sparkContext.defaultParallelism)
          .select("text")
        val uni = docs
          .select(explode(split(col("text"), " ")).as("w"))
          .groupBy("w")
          .agg(count(lit(1)).as("c"))
        val total = uni.agg(sum("c").as("n"))
        val bi = docs
          .select(explode(expr("word_ngrams(text, 2)")).as("g"))
          .groupBy("g")
          .agg(count(lit(1)).as("c_ab"))
          .filter(col("c_ab") > 5)
          .withColumn("w1", split(col("g"), " ")(0))
          .withColumn("w2", split(col("g"), " ")(1))
        bi.join(broadcast(uni.select(col("w").as("w1"), col("c").as("c_a"))), "w1")
          .join(broadcast(uni.select(col("w").as("w2"), col("c").as("c_b"))), "w2")
          .crossJoin(broadcast(total))
          .select(
            col("g").as("bigram"),
            col("c_ab"),
            expr("((c_ab - 5) * 1000000 * n) div (c_a * c_b)").as("score_e6")
          )
          .orderBy(desc("score_e6"), asc("bigram"))
          .limit(50)
      },
      Some("""WITH docs AS (SELECT string_split(text, ' ') AS ws FROM documents),
        uni AS (SELECT w, count(*) AS c
                FROM (SELECT unnest(ws) AS w FROM docs) GROUP BY 1),
        tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM uni),
        bi AS (SELECT ws[i] || ' ' || ws[i+1] AS g, count(*) AS c_ab
               FROM (SELECT ws, unnest(range(1, len(ws))) AS i FROM docs)
               GROUP BY 1 HAVING count(*) > 5),
        sc AS (SELECT g AS bigram, c_ab,
                 ((c_ab - 5) * 1000000 * n) // (u1.c * u2.c) AS score_e6
               FROM bi CROSS JOIN tot
               JOIN uni u1 ON u1.w = string_split(g, ' ')[1]
               JOIN uni u2 ON u2.w = string_split(g, ' ')[2])
        SELECT bigram, CAST(c_ab AS BIGINT) AS c_ab,
               CAST(score_e6 AS BIGINT) AS score_e6
        FROM sc ORDER BY score_e6 DESC, bigram LIMIT 50""")
    ),

    // ------------------------------------------------------------------
    // E11/E12: repeated-substring screen at STRIDE 1 — every
    // overlapping 20-token window, flagged when its exact text recurs
    // in ≥2 distinct documents. This is the bounded-window
    // approximation of suffix-array exact-substring dedup (Lee et al.
    // 2022, "Deduplicating Training Data Makes Language Models
    // Better"): q94's disjoint chunks catch aligned duplication only;
    // stride-1 windows catch duplicated passages at ANY offset. The
    // window stream comes from the native word_ngrams codegen
    // expression (20-grams are exactly the overlapping windows); the
    // hot-window set (nd ≥ 2) is the only table that joins back, and
    // corpus-wide duplication bounds its size.
    QueryDef(
      "q110_substring_dedup",
      (s, dir) => {
        val wins = Tables(s, dir, "documents")
          .filter(size(split(col("text"), " ")) >= 20)
          .repartition(s.sparkContext.defaultParallelism)
          .select(col("doc_id"), explode(expr("word_ngrams(text, 20)")).as("g"))
        val hot = wins
          .select("doc_id", "g")
          .distinct()
          .groupBy("g")
          .agg(count(lit(1)).as("nd"))
          .filter(col("nd") >= 2)
          .select(col("g"), lit(1L).as("dup"))
        wins
          .join(hot, Seq("g"), "left")
          .groupBy("doc_id")
          .agg(
            count(lit(1)).as("n_windows"),
            sum(coalesce(col("dup"), lit(0L))).as("dup_windows")
          )
          .orderBy("doc_id")
      },
      Some("""WITH tok AS (
          SELECT doc_id, string_split(text, ' ') AS ws FROM documents
          WHERE len(string_split(text, ' ')) >= 20
        ), win AS (
          SELECT doc_id, array_to_string(ws[i:i+19], ' ') AS g
          FROM (SELECT doc_id, ws, unnest(range(1, len(ws) - 18)) AS i FROM tok)
        ), hot AS (
          SELECT g FROM (SELECT g, count(DISTINCT doc_id) AS nd FROM win GROUP BY g)
          WHERE nd >= 2
        )
        SELECT w.doc_id AS doc_id, CAST(count(*) AS BIGINT) AS n_windows,
               CAST(sum(CASE WHEN hot.g IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
                 AS dup_windows
        FROM win w LEFT JOIN hot ON w.g = hot.g
        GROUP BY 1 ORDER BY 1""")
    ),

    // ------------------------------------------------------------------
    // E14 (corpus health report): the per-source go/no-go summary a
    // curation run emits before training — doc counts, exact-dup share,
    // PII incidence, and mean quality — complementing q93's token-mix
    // report (which this deliberately does not repeat). One partial-
    // aggregated exchange keyed by source; the distinct-text count rides
    // the same shuffle as an md5 fingerprint (16-byte key, not the
    // document body — at 100 TB the exchange width is what matters).
    // Quality doubles are summed as exact micros (Exact.e6) so the
    // aggregate is reduction-order independent; ratios are integer ppm.
    QueryDef(
      "q138_corpus_health",
      (s, dir) => {
        val docs = Tables(s, dir, "documents")
          .select(
            col("source"),
            col("lang"),
            md5(col("text")).as("fp"),
            graft.queries.Exact.e6(TextOps.qualityExpr).as("q_e6"),
            when(
              regexp_count(col("text"), lit(TextOps.EmailRe)) +
                regexp_count(col("text"), lit(TextOps.PhoneRe)) > 0,
              1L
            ).otherwise(0L).as("has_pii")
          )
        docs
          .groupBy("source")
          .agg(
            count(lit(1)).as("n_docs"),
            countDistinct(col("fp")).as("n_unique_texts"),
            countDistinct(col("lang")).as("n_langs"),
            sum(col("q_e6")).as("q_sum_e6"),
            sum(col("has_pii")).as("n_pii_docs")
          )
          .select(
            col("source"),
            col("n_docs"),
            col("n_unique_texts"),
            col("n_langs"),
            expr("q_sum_e6 DIV n_docs").as("quality_mean_e6"),
            expr("(n_docs - n_unique_texts) * 1000000 DIV n_docs").as("dup_ppm"),
            expr("n_pii_docs * 1000000 DIV n_docs").as("pii_ppm")
          )
          .orderBy("source")
      },
      Some(s"""WITH per AS (
          SELECT source,
                 count(*) AS n_docs,
                 count(DISTINCT md5(text)) AS n_unique_texts,
                 count(DISTINCT lang) AS n_langs,
                 sum(CAST(round((${TextOps.QualitySql}) * 1000000) AS BIGINT)) AS q_sum_e6,
                 sum(CASE WHEN len(regexp_extract_all(text, '${TextOps.EmailRe}'))
                            + len(regexp_extract_all(text, '${TextOps.PhoneRe}')) > 0
                          THEN 1 ELSE 0 END) AS n_pii_docs
          FROM documents GROUP BY 1
        )
        SELECT source,
               CAST(n_docs AS BIGINT) AS n_docs,
               CAST(n_unique_texts AS BIGINT) AS n_unique_texts,
               CAST(n_langs AS BIGINT) AS n_langs,
               CAST(q_sum_e6 // n_docs AS BIGINT) AS quality_mean_e6,
               CAST((n_docs - n_unique_texts) * 1000000 // n_docs AS BIGINT) AS dup_ppm,
               CAST(n_pii_docs * 1000000 // n_docs AS BIGINT) AS pii_ppm
        FROM per ORDER BY source""")
    ),

    // ------------------------------------------------------------------
    // Per-source distribution divergence — the drift diagnostic behind
    // corpus-mixing decisions: how far each source's within-word
    // char-bigram distribution sits from the corpus-wide one, as TOTAL
    // VARIATION distance. The integer identity
    //   TV(s) = Σ_g |c_sg·n − c_g·n_s| / (2·n_s·n)
    // keeps every term exact (products ≤ n_s·n; the one final division
    // of two exact longs is a single correctly-rounded IEEE op, so the
    // double is bit-identical across engines). int64 headroom, stated
    // like q144's: each |…| term and the per-source sum are bounded by
    // n_s·n, so exactness holds while n_s·n < 2^63 — with balanced
    // sources that is n ≲ 6e9 total bigrams (~tens of GB of text), NOT
    // the full 100 TB posture. Past it, the same identity runs on
    // DECIMAL(38) (Spark and DuckDB both exact to 38 digits, covering
    // any physical corpus) or on per-source-scaled counts; the int64
    // path is kept here because it is the fastest exact kernel at the
    // scales the oracle certifies. Bigrams ABSENT from a
    // source still contribute (|0 − c_g·n_s|) — the per-(source,
    // bigram) grid is built by crossing the source totals with the
    // charset²-bounded global bigram table (broadcast; never
    // data-scaled) and left-joining the observed counts. One corpus
    // scan feeds all three count tables.
    QueryDef(
      "q151_source_divergence",
      (s, dir) => {
        val occ = Tables(s, dir, "documents")
          .select(col("source"), explode(split(lower(col("text")), "[^a-z]+")).as("w"))
          .filter(length(col("w")) >= 2)
          .select(col("source"), explode(expr("char_ngrams(w, 2)")).as("pair"))
          .localCheckpoint()
        val perSrc = occ.groupBy("source", "pair").agg(count(lit(1)).as("c_sg"))
        val global = occ.groupBy("pair").agg(count(lit(1)).as("c_g"))
        val nTot = global.agg(sum("c_g").cast("long").as("n"))
        val nSrc = occ.groupBy("source").agg(count(lit(1)).as("n_s"))
        nSrc
          .crossJoin(broadcast(global))
          .join(perSrc, Seq("source", "pair"), "left")
          .na
          .fill(0L, Seq("c_sg"))
          .crossJoin(broadcast(nTot))
          .withColumn("term", abs(col("c_sg") * col("n") - col("c_g") * col("n_s")))
          .groupBy("source", "n_s", "n")
          .agg(sum("term").as("sum_abs"))
          .select(
            col("source"),
            col("n_s"),
            col("sum_abs"),
            (col("sum_abs").cast("double") / (lit(2.0) * col("n_s") * col("n"))).as("tv")
          )
          .orderBy("source")
      },
      Some("""WITH occ AS (
          SELECT source, substring(w, i, 2) AS pair
          FROM (SELECT source, w, unnest(range(1, length(w))) AS i
                FROM (SELECT source, unnest(string_split_regex(lower(text), '[^a-z]+')) AS w
                      FROM documents)
                WHERE length(w) >= 2)),
        per_src AS (SELECT source, pair, count(*) AS c_sg FROM occ GROUP BY 1, 2),
        gcnt AS (SELECT pair, count(*) AS c_g FROM occ GROUP BY 1),
        n_tot AS (SELECT CAST(sum(c_g) AS BIGINT) AS n FROM gcnt),
        n_src AS (SELECT source, count(*) AS n_s FROM occ GROUP BY 1),
        grid AS (
          SELECT s.source, s.n_s, g.pair, g.c_g, COALESCE(p.c_sg, 0) AS c_sg
          FROM n_src s CROSS JOIN gcnt g
          LEFT JOIN per_src p ON p.source = s.source AND p.pair = g.pair)
        SELECT source,
               CAST(n_s AS BIGINT) AS n_s,
               CAST(sum(abs(c_sg * n - c_g * n_s)) AS BIGINT) AS sum_abs,
               CAST(sum(abs(c_sg * n - c_g * n_s)) AS DOUBLE) / (2.0 * n_s * n) AS tv
        FROM grid, n_tot
        GROUP BY source, n_s, n ORDER BY source""")
    ),

    // ------------------------------------------------------------------
    // k-anonymity screen with a generalization ladder — the release
    // governance check a corpus publisher runs before shipping
    // metadata: treating (lang, source) as the quasi-identifier pair,
    // any combination shared by fewer than k=5 documents risks
    // re-identification. Rather than binary suppress/keep, the
    // standard remedy ladder: a small cell first GENERALIZES to its
    // lang-level group ((lang, *)); only if even that group is under k
    // does it need suppression. Emits per cell: sizes at both levels
    // and the resulting disposition. Plan: two partial-agg'd counts
    // (cell- and lang-keyed) and a lang-keyed join of two tiny tables
    // — nothing corpus-scaled after the first groupBy. Oracle-exact.
    QueryDef(
      "q175_k_anonymity",
      (s, dir) => {
        val docs = Tables(s, dir, "documents")
        val cells = docs.groupBy("lang", "source").agg(count(lit(1)).as("n"))
        val langs = docs.groupBy("lang").agg(count(lit(1)).as("n_lang"))
        cells
          .join(langs, Seq("lang"))
          .withColumn(
            "disposition",
            when(col("n") >= 5, "exact")
              .when(col("n_lang") >= 5, "generalize_lang")
              .otherwise("suppress")
          )
          .orderBy("lang", "source")
      },
      Some("""WITH cells AS (
          SELECT lang, source, count(*) AS n FROM documents GROUP BY 1, 2),
        langs AS (SELECT lang, count(*) AS n_lang FROM documents GROUP BY 1)
        SELECT c.lang, c.source, c.n, l.n_lang,
               CASE WHEN c.n >= 5 THEN 'exact'
                    WHEN l.n_lang >= 5 THEN 'generalize_lang'
                    ELSE 'suppress' END AS disposition
        FROM cells c JOIN langs l ON l.lang = c.lang
        ORDER BY c.lang, c.source""")
    ),

    // ------------------------------------------------------------------
    // E12/E14 (l-diversity — Machanavajjhala et al. 2007, the
    // anonymity check k-anonymity misses): a QI group can be large
    // (k-anonymous) yet leak its members' SENSITIVE attribute when
    // every member shares one value. Quasi-identifiers here are
    // (lang, n_chars÷100 bucket); the sensitive attribute is
    // `source`. Per QI group: size, number of distinct sensitive
    // values (l), the max single-value share in per-mille (the
    // recursive-(c,l) input), and the disposition — `diverse` when
    // l ≥ 3, `homogeneous` when a group is k-anonymous but l-poor
    // (the attack case), `small` otherwise. One grouped aggregate
    // over (QI, sensitive) then a groups-scaled rollup; everything
    // integer. The 100 TB shape is two keyed exchanges, both
    // map-side-combined.
    QueryDef(
      "q247_l_diversity",
      (s, dir) => {
        val cells = Tables(s, dir, "documents")
          .groupBy(
            col("lang"),
            (col("n_chars").cast("long") / 100L).cast("long").as("len_bucket"),
            col("source")
          )
          .agg(count(lit(1)).as("nv"))
        cells
          .groupBy("lang", "len_bucket")
          .agg(
            sum("nv").as("n"),
            count(lit(1)).as("l"),
            expr("(max(nv) * 1000L) DIV sum(nv)").as("top_share_pm")
          )
          .withColumn(
            "disposition",
            when(col("l") >= 3, "diverse")
              .when(col("n") >= 5, "homogeneous")
              .otherwise("small")
          )
          .orderBy("lang", "len_bucket")
      },
      Some("""WITH cells AS (
          SELECT lang, CAST(n_chars AS BIGINT) // 100 AS len_bucket, source,
                 count(*) AS nv
          FROM documents GROUP BY 1, 2, 3)
        SELECT lang, len_bucket, CAST(sum(nv) AS BIGINT) AS n,
               count(*) AS l,
               CAST((max(nv) * 1000) // sum(nv) AS BIGINT) AS top_share_pm,
               CASE WHEN count(*) >= 3 THEN 'diverse'
                    WHEN sum(nv) >= 5 THEN 'homogeneous'
                    ELSE 'small' END AS disposition
        FROM cells GROUP BY 1, 2 ORDER BY lang, len_bucket""")
    ),

    // ------------------------------------------------------------------
    // DIFFERENTIALLY-PRIVATE RELEASE (round 14, Dwork et al. 2006):
    // the aggregate-publication side of the privacy family — noisy
    // per-type user counts plus a noisy clamped event total, each
    // protected by the Laplace mechanism with CONTRIBUTION BOUNDING
    // first (the step practical DP lives or dies on): a user counts
    // at most once per type (so each per-type count has user-
    // sensitivity 1; with ≤5 types a user touches ≤5 releases, and
    // the per-release budget ε/5 gives scale b = 5/ε = 5), and the
    // event total clamps each user to ≤10 events (sensitivity 10,
    // its own ε = 1 budget, b = 10). The noise draw is DETERMINISTIC
    // and engine-reproducible: a per-release md5 seed expands to a
    // 48-bit uniform via the hex-digit polynomial (position() over
    // the hex alphabet — both engines, no conv()), and the Laplace
    // inverse CDF runs as one textually identical double sequence;
    // the released value is the clamped count plus the ROUNDED draw,
    // floored at zero. The true counts and the draw are NOT in the
    // output — only the release and its public scale. Plan: one
    // distinct-rollup per release, noise arithmetic on |types|+1
    // rows. (ln() is the one non-algebraic call; a 1-ulp cross-
    // engine divergence could flip round() only within ~1e-13 of a
    // half-integer — pinned by the three-scale gate like the LM-
    // scoring family.) ORACLE-EXACT.
    QueryDef(
      "q300_dp_release",
      (s, dir) => dpRelease(Tables(s, dir, "events").select("user_id", "event_type")),
      Some(dpOracleSql)
    )
  )

  /** q300's release pipeline over `(user_id, event_type)` rows, shared
    * with the live twin (q309): contribution-bound the counts, draw
    * the deterministic per-release Laplace noise, emit only the
    * release and its public scale. */
  private[queries] def dpRelease(ev: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val perType = ev
      .groupBy("event_type")
      .agg(countDistinct("user_id").as("n"))
      .select(
        col("event_type"),
        col("n"),
        md5(concat(lit("dp14|"), col("event_type"))).as("h"),
        expr("5e0").as("b")
      )
    val total = ev
      .groupBy("user_id")
      .agg(count(lit(1)).as("c"))
      .agg(sum(least(col("c"), lit(10L))).as("n"))
      .select(
        lit("zz_events_total").as("event_type"),
        col("n"),
        md5(lit("dp14|zz_events_total")).as("h"),
        expr("10e0").as("b")
      )
    perType
      .unionByName(total)
      .withColumn("u", expr(s"(CAST($dpHexPoly AS DOUBLE) + 5e-1) / 281474976710656e0"))
      .withColumn("z", expr("-b * sign(u - 5e-1) * ln(1e0 - 2e0 * abs(u - 5e-1))"))
      .select(
        col("event_type"),
        greatest(lit(0L), col("n") + expr("CAST(round(z) AS BIGINT)")).as("released"),
        expr("CAST(b * 1000000e0 AS BIGINT)").as("b_micros")
      )
      .orderBy("event_type")
  }

  /** Shared by q300 and its live twin q309. */
  private[queries] lazy val dpOracleSql: String =
    s"""WITH base AS (
        SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n,
               md5(concat('dp14|', event_type)) AS h, 5e0 AS b
        FROM events GROUP BY 1
        UNION ALL
        SELECT 'zz_events_total',
               CAST(sum(least(c, 10)) AS BIGINT),
               md5(concat('dp14|', 'zz_events_total')), 10e0
        FROM (SELECT user_id, count(*) AS c FROM events GROUP BY 1)),
      u AS (
        SELECT event_type, n, b,
               (CAST($dpHexPoly AS DOUBLE) + 5e-1) / 281474976710656e0 AS u
        FROM base),
      noise AS (
        SELECT event_type, n, b,
               -b * sign(u - 5e-1) * ln(1e0 - 2e0 * abs(u - 5e-1)) AS z
        FROM u)
      SELECT event_type,
             greatest(CAST(0 AS BIGINT), n + CAST(round(z) AS BIGINT)) AS released,
             CAST(b * 1000000e0 AS BIGINT) AS b_micros
      FROM noise ORDER BY event_type"""

  /** The 48-bit uniform seed for q300: twelve md5 hex digits expanded
    * by the positional polynomial — position() over the hex alphabet
    * is the one hex→int path BOTH engines share (no conv() in
    * DuckDB), and generating the text once keeps the Spark expression
    * and the oracle SQL textually identical by construction. */
  private lazy val dpHexPoly: String =
    (1 to 12)
      .map(i =>
        // no `L` suffix: Spark parses big integral literals as BIGINT
        // natively and DuckDB has no suffix syntax — the shared text
        // must satisfy both parsers
        // the digit is cast to BIGINT: mid-size multipliers parse as
        // INT in Spark and 15 * 2^28 overflows 32-bit under ANSI mode
        s"CAST(position(substr(h, $i, 1) IN '0123456789abcdef') - 1 AS BIGINT) * ${1L << (4 * (12 - i))}"
      )
      .mkString("(", " + ", ")")
}
