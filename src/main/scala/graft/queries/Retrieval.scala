package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.operators.InvertedIndex

/** Keyword-serving queries over the persisted inverted index
  * (operators/InvertedIndex) — the lexical complement of the vector
  * indexes behind q153/q157/q158.
  */
object Retrieval {

  /** log2 rank discounts for nDCG@10, ×10⁶ floored — computed once
    * here and embedded as identical literals in BOTH engines' plans
    * (the single irrational ingredient, made engine-independent by
    * construction). Declared before `defs`, which interpolates them
    * into the oracle SQL at object init.
    */
  private val discMicros: Seq[Long] =
    (1 to 10).map(i => (1000000.0 / (math.log(i + 1.0) / math.log(2.0))).toLong)

  /** The same table as a Spark SQL array literal. */
  private def discExprSql: String = s"array(${discMicros.mkString("L, ")}L)"

  val defs: Seq[QueryDef] = Seq(
    // ------------------------------------------------------------------
    // Inverted-index build + conjunctive lookup: postings land
    // partitionBy(term-bucket) once, then an AND-of-terms query reads
    // ONLY the queried buckets (partition pruning) with the term list
    // pushed into the scan, rolls up per doc, and keeps docs matching
    // every term, ranked by summed tf. Lookup cost is O(Σ df(term)) —
    // the serving property an inverted index exists for; q158's
    // keyword channel rescans the corpus per query by comparison.
    // ORACLE-EXACT: integer tf sums and the conjunctive filter are
    // engine-independent, so the oracle restates the lookup straight
    // off the documents table — any index build/layout/pruning defect
    // surfaces as a hash break. InvertedIndexSpec additionally pins
    // the pruned-scan plan shape and equality on multi-bucket queries.
    QueryDef(
      "q170_inverted_lookup",
      (s, dir) => {
        val idx = Similarity.freshIndexDir("inverted_idx")
        InvertedIndex.build(Tables(s, dir, "documents"), idx)
        InvertedIndex
          .conjunctiveQuery(s, idx, Seq("spark", "join"))
          .orderBy(col("score").desc, col("doc_id"))
      },
      Some("""WITH toks AS (
          SELECT doc_id, tok, count(*) AS tf
          FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
          WHERE len(tok) > 0 GROUP BY 1, 2)
        SELECT doc_id, CAST(sum(tf) AS BIGINT) AS score
        FROM toks WHERE tok IN ('spark', 'join')
        GROUP BY doc_id HAVING count(DISTINCT tok) = 2
        ORDER BY score DESC, doc_id""")
    ),

    // ------------------------------------------------------------------
    // BM25-shaped ranked retrieval over the same index — the scoring
    // layer a keyword serving stack puts above raw postings: rational
    // idf (10⁶·N DIV df — ranks like log-idf, hashes exactly), tf
    // saturation 11·tf DIV (5·tf+6) (k1 = 1.2 cleared to integers),
    // three queries ranked at once, top-10 each via the bounded heap.
    // The scan touches only the queried terms' buckets; df comes from
    // the pruned postings themselves. ORACLE-EXACT end to end — rare
    // for a ranking function, and exactly why the integer forms were
    // chosen.
    QueryDef(
      "q173_bm25_rank",
      (s, dir) => {
        val idx = Similarity.freshIndexDir("bm25_idx")
        InvertedIndex.build(Tables(s, dir, "documents"), idx)
        val n = Tables(s, dir, "documents").count()
        InvertedIndex
          .bm25TopK(
            s,
            idx,
            Seq(
              1L -> Seq("spark", "join"),
              2L -> Seq("window", "sort", "merge"),
              3L -> Seq("slow", "dup")
            ),
            nDocs = n,
            topK = 10
          )
          .orderBy("query_id", "rank")
      },
      Some("""WITH toks AS (
          SELECT doc_id, tok, count(*) AS tf
          FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
          WHERE len(tok) > 0 GROUP BY 1, 2),
        n AS (SELECT count(*) AS n FROM documents),
        q(query_id, tok) AS (VALUES (1, 'spark'), (1, 'join'),
                                    (2, 'window'), (2, 'sort'), (2, 'merge'),
                                    (3, 'slow'), (3, 'dup')),
        dfv AS (SELECT tok, count(*) AS dfc FROM toks
                WHERE tok IN (SELECT tok FROM q) GROUP BY 1),
        scored AS (
          SELECT q.query_id, t.doc_id,
                 CAST(sum((((1000000 * n.n) // d.dfc) * 11 * t.tf) // (5 * t.tf + 6))
                      AS BIGINT) AS score
          FROM toks t
          JOIN q ON q.tok = t.tok
          JOIN dfv d ON d.tok = t.tok
          CROSS JOIN n
          GROUP BY 1, 2)
        SELECT CAST(query_id AS BIGINT) AS query_id, CAST(rank AS BIGINT) AS rank,
               doc_id, score
        FROM (SELECT query_id, doc_id, score,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY score DESC, doc_id) AS rank
              FROM scored)
        WHERE rank <= 10 ORDER BY query_id, rank""")
    ),

    // ------------------------------------------------------------------
    // Incremental inverted-index maintenance — lifecycle parity with
    // the vector indexes (IvfIndex append/delete): the index builds on
    // the initial crawl, a later batch APPENDS its postings (cost
    // O(batch tokens) — doc postings are disjoint rows, so no merge,
    // no re-read of the existing layout), and an erasure request
    // tombstones doc ids (one tiny write; lookups anti-join them out,
    // idempotent under replay). COMPACTION then folds the tombstones
    // into the posting layout (checked staged-rewrite swap, same
    // discipline as IvfIndex.compact) so sustained erasure never grows
    // the lookup's anti-join side. The lookup after the full lifecycle
    // carries the SAME oracle semantics as q170 restricted to
    // surviving docs — so build+append+delete+compact correctness is
    // hash-checked end to end, not just spec-asserted.
    QueryDef(
      "q176_inverted_maintain",
      (s, dir) => {
        val idx = Similarity.freshIndexDir("inverted_incr")
        val docs = Tables(s, dir, "documents")
        InvertedIndex.build(docs.filter(col("doc_id") % 5 =!= 4), idx)
        InvertedIndex.append(docs.filter(col("doc_id") % 5 === 4), idx)
        InvertedIndex.delete(
          docs.filter(col("doc_id") % 13 === 0).select("doc_id"),
          idx
        )
        InvertedIndex.compact(s, idx)
        InvertedIndex
          .conjunctiveQuery(s, idx, Seq("spark", "join"))
          .orderBy(col("score").desc, col("doc_id"))
      },
      Some(invertedMaintainOracle)
    ),

    // ------------------------------------------------------------------
    // Retrieval-quality evaluation harness — the monitoring loop above
    // q173's ranker (every serving deployment tracks these): P@10, MRR
    // and nDCG@10 per query, ALL in exact integer arithmetic. Graded
    // relevance is deterministic (how many of the query's terms the
    // doc contains); the log2 rank discounts — the one irrational
    // ingredient of nDCG — are computed ONCE driver-side and embedded
    // as the SAME integer literals in both the Spark plan and the
    // oracle SQL, so the whole evaluation is oracle-exact (single
    // source: `discMicros`). nDCG divides DCG by the ideal ordering of
    // the same relevance multiset (one final DIV). Plan: q173's
    // bucket-pruned ranking, a broadcast term join for relevance, and
    // per-query folds over ≤10 collected rows — nothing beyond the
    // ranker itself is corpus-scaled.
    QueryDef(
      "q181_retrieval_quality",
      (s, dir) => {
        import s.implicits._
        val idx = Similarity.freshIndexDir("rq_idx")
        InvertedIndex.build(Tables(s, dir, "documents"), idx)
        val n = Tables(s, dir, "documents").count()
        val queries = Seq(
          1L -> Seq("spark", "join"),
          2L -> Seq("window", "sort", "merge"),
          3L -> Seq("slow", "dup")
        )
        val ranked = InvertedIndex.bm25TopK(s, idx, queries, nDocs = n, topK = 10)
        val qterms = queries.flatMap { case (q, ts) => ts.map(q -> _) }.toDF("query_id", "tok")
        val docTok = Tables(s, dir, "documents")
          .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
          .filter(length(col("tok")) > 0)
          .distinct()
        val rel = ranked
          .join(broadcast(qterms), Seq("query_id"))
          .join(docTok, Seq("doc_id", "tok"))
          .groupBy("query_id", "doc_id", "rank")
          .agg(countDistinct(col("tok")).as("rel"))
        val graded = ranked
          .join(rel, Seq("query_id", "doc_id", "rank"), "left")
          .withColumn("rel", coalesce(col("rel"), lit(0L)))
        graded
          .groupBy("query_id")
          .agg(
            sum(when(col("rel") > 0, 1L).otherwise(0L)).as("n_rel"),
            min(when(col("rel") > 0, col("rank"))).as("first_rel"),
            sum(expr(s"rel * element_at(${discExprSql}, cast(rank AS int))")).as("dcg_micros"),
            expr("sort_array(collect_list(rel), false)").as("rels")
          )
          .withColumn(
            "idcg_micros",
            expr(
              s"aggregate(zip_with(rels, slice(${discExprSql}, 1, size(rels)), (r, d) -> r * d), 0L, (a, x) -> a + x)"
            )
          )
          .select(
            col("query_id"),
            expr("n_rel * 1000000L DIV 10").as("p10_ppm"),
            coalesce(expr("1000000L DIV first_rel"), lit(0L)).as("mrr_micros"),
            col("dcg_micros"),
            col("idcg_micros"),
            when(col("idcg_micros") > 0, expr("dcg_micros * 1000000L DIV idcg_micros"))
              .otherwise(0L)
              .as("ndcg_ppm")
          )
          .orderBy("query_id")
      },
      Some(s"""WITH toks AS (
          SELECT doc_id, tok, count(*) AS tf
          FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
          WHERE len(tok) > 0 GROUP BY 1, 2),
        n AS (SELECT count(*) AS n FROM documents),
        q(query_id, tok) AS (VALUES (1, 'spark'), (1, 'join'),
                                    (2, 'window'), (2, 'sort'), (2, 'merge'),
                                    (3, 'slow'), (3, 'dup')),
        dfv AS (SELECT tok, count(*) AS dfc FROM toks
                WHERE tok IN (SELECT tok FROM q) GROUP BY 1),
        scored AS (
          SELECT q.query_id, t.doc_id,
                 CAST(sum((((1000000 * n.n) // d.dfc) * 11 * t.tf) // (5 * t.tf + 6))
                      AS BIGINT) AS score
          FROM toks t JOIN q ON q.tok = t.tok JOIN dfv d ON d.tok = t.tok CROSS JOIN n
          GROUP BY 1, 2),
        ranked AS (
          SELECT query_id, doc_id, rank FROM (
            SELECT query_id, doc_id, score,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY score DESC, doc_id) AS rank
            FROM scored) WHERE rank <= 10),
        disc(rank, d) AS (VALUES ${discMicros.zipWithIndex
          .map { case (d, i) => s"(${i + 1}, ${d})" }
          .mkString(", ")}),
        rels AS (
          SELECT r.query_id, r.doc_id, r.rank,
                 (SELECT count(DISTINCT q2.tok) FROM q q2
                  JOIN toks t2 ON t2.tok = q2.tok AND t2.doc_id = r.doc_id
                  WHERE q2.query_id = r.query_id) AS rel
          FROM ranked r),
        agg AS (
          SELECT query_id,
                 CAST(sum(CASE WHEN rel > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_rel,
                 min(CASE WHEN rel > 0 THEN rank END) AS first_rel,
                 CAST(sum(rel * d.d) AS BIGINT) AS dcg_micros
          FROM rels JOIN disc d USING (rank) GROUP BY 1),
        ideal AS (
          SELECT query_id, CAST(sum(rel * d.d) AS BIGINT) AS idcg_micros
          FROM (SELECT query_id, rel,
                       row_number() OVER (PARTITION BY query_id
                                          ORDER BY rel DESC, rank) AS irank
                FROM rels) i
          JOIN disc d ON d.rank = i.irank GROUP BY 1)
        SELECT CAST(a.query_id AS BIGINT) AS query_id,
               (n_rel * 1000000) // 10 AS p10_ppm,
               COALESCE(1000000 // first_rel, 0) AS mrr_micros,
               dcg_micros, idcg_micros,
               CASE WHEN idcg_micros > 0
                    THEN (dcg_micros * 1000000) // idcg_micros ELSE 0 END AS ndcg_ppm
        FROM agg a JOIN ideal USING (query_id)
        ORDER BY query_id""")
    ),

    // ------------------------------------------------------------------
    // EXACT PHRASE SEARCH (round 13): the query the (tok, doc, tf)
    // index structurally cannot answer — "spark join" as ADJACENT
    // tokens, not a conjunctive bag. A positional index (tok, doc,
    // pos) under the house md5 bucketing serves it as the classic
    // positional join: each phrase term contributes a (doc, pos − i)
    // frame, occurrences are the frames' equi-join on (doc, start) —
    // df(term)-scaled, never a text re-scan, pruned to the phrase
    // tokens' buckets. A 2-gram and a 3-gram probe; the oracle
    // re-derives every occurrence count from the raw text with the
    // identical tokenization. ORACLE-EXACT.
    QueryDef(
      "q276_phrase_search",
      (s, dir) => {
        import graft.operators.PositionalIndex
        val idx = Similarity.freshIndexDir("pos_idx")
        PositionalIndex.build(Tables(s, dir, "documents").select("doc_id", "text"), idx)
        def shaped(tag: String, phrase: Seq[String]) =
          PositionalIndex
            .phraseCounts(s, idx, phrase)
            .select(lit(tag).as("phrase"), col("doc_id"), col("n_occurrences"))
        shaped("spark join", Seq("spark", "join"))
          .unionByName(shaped("table value part", Seq("table", "value", "part")))
          .orderBy("phrase", "doc_id")
      },
      Some("""WITH toks AS (
          SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        h2 AS (
          SELECT doc_id, len(list_filter(range(1, len(t)),
                   i -> t[i] = 'spark' AND t[i+1] = 'join')) AS n
          FROM toks),
        h3 AS (
          SELECT doc_id, len(list_filter(range(1, len(t) - 1),
                   i -> t[i] = 'table' AND t[i+1] = 'value' AND t[i+2] = 'part')) AS n
          FROM toks)
        SELECT phrase, doc_id, CAST(n AS BIGINT) AS n_occurrences FROM (
          SELECT 'spark join' AS phrase, doc_id, n FROM h2 WHERE n > 0
          UNION ALL
          SELECT 'table value part', doc_id, n FROM h3 WHERE n > 0)
        ORDER BY phrase, doc_id""")
    ),

    // ------------------------------------------------------------------
    // PREFIX TERM SCAN (round 13): wildcard-style `s*` term statistics
    // from the same positional index. md5 buckets cannot prune a
    // prefix (hashing destroys order), but every bucket file is
    // tok-SORTED, so parquet min/max row-group stats skip within each
    // file — the honest trade vs a term-dictionary layout, documented
    // in the operator. ORACLE-EXACT (df + occurrence totals per
    // matched term).
    QueryDef(
      "q277_prefix_search",
      (s, dir) => {
        import graft.operators.PositionalIndex
        val idx = Similarity.freshIndexDir("pos_idx_pre")
        PositionalIndex.build(Tables(s, dir, "documents").select("doc_id", "text"), idx)
        PositionalIndex
          .prefixStats(s, idx, "s")
          .orderBy("tok")
      },
      Some("""WITH toks AS (
          SELECT doc_id, tok FROM (
            SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
          WHERE len(tok) > 0 AND tok LIKE 's%')
        SELECT tok, CAST(count(DISTINCT doc_id) AS BIGINT) AS df,
               count(*) AS n_occurrences
        FROM toks GROUP BY tok ORDER BY tok""")
    ),

    // ------------------------------------------------------------------
    // KEYWORD-IN-CONTEXT CONCORDANCE (round 14): the classic corpus-
    // linguistics view — every occurrence of a phrase with ±2 tokens of
    // context — served ENTIRELY from the positional index: the find is
    // q276's bucket-pruned frame equi-join, and the render is one
    // postings pass doc-restricted to the df-scaled hit set (positions
    // ARE the layout; no text re-scan, no document store in the plan).
    // The oracle re-derives every context window from raw text with
    // the identical tokenization, including the subtlety that tokens
    // dropped at build time (empty splits) stay dropped in the render.
    // ORACLE-EXACT.
    QueryDef(
      "q310_kwic_concordance",
      (s, dir) => {
        import graft.operators.PositionalIndex
        val idx = Similarity.freshIndexDir("pos_kwic")
        PositionalIndex.build(Tables(s, dir, "documents").select("doc_id", "text"), idx)
        val out = PositionalIndex
          .kwic(s, idx, Seq("spark", "join"), window = 2)
          .select(lit("spark join").as("phrase"), col("doc_id"), col("start"), col("context"))
          .orderBy("doc_id", "start")
        // the q298 pruned-read discipline: the render's forward-layout
        // SCAN selects ONLY the hit docs' buckets (round 15 — the
        // O(corpus)-per-query render scan is gone). Evidence comes
        // from the physical scan's selected partitions — the file set
        // the executor actually opens after partition pruning (a plain
        // inputFiles listing is pre-pruning and would not prove it).
        val hitDbks = PositionalIndex
          .phraseCounts(s, idx, Seq("spark", "join"))
          .select(pmod(col("doc_id"), lit(64)).cast("int"))
          .distinct()
          .collect()
          .map(r => s"dbk=${r.getInt(0)}")
          .toSet
        val fwdScanned = out.queryExecution.sparkPlan
          .collect { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
          .flatMap(_.selectedPartitions.toPartitionArray.map(_.filePath.toString))
          .filter(_.contains("/fwd/"))
        require(fwdScanned.nonEmpty, "kwic render must be served by the forward layout")
        require(
          fwdScanned.forall(f => hitDbks.exists(b => f.contains(s"/$b/"))),
          s"kwic render scans a non-hit bucket: ${fwdScanned.filterNot(f => hitDbks.exists(b => f.contains(s"/$b/"))).take(3).mkString(",")}"
        )
        out
      },
      Some("""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        hits AS (
          SELECT doc_id, i FROM (SELECT doc_id, t, unnest(range(1, len(t))) AS i FROM toks)
          WHERE t[i] = 'spark' AND t[i+1] = 'join'),
        ctx AS (
          SELECT h.doc_id, CAST(h.i - 1 AS BIGINT) AS start,
                 list_aggregate(
                   list_filter(tk.t[CASE WHEN h.i - 2 < 1 THEN 1 ELSE h.i - 2 END : h.i + 3],
                               x -> x <> ''), 'string_agg', ' ') AS context
          FROM hits h JOIN toks tk ON tk.doc_id = h.doc_id)
        SELECT 'spark join' AS phrase, doc_id, start, context
        FROM ctx ORDER BY doc_id, start""")
    ),

    // ------------------------------------------------------------------
    // POSITIONAL-INDEX LIFECYCLE (round 14): q276/q277 built their
    // index once and read it — this walks the full house lifecycle the
    // operator now carries: BUILD on half the corpus, APPEND the other
    // half (a crawl batch — O(batch), existing postings never re-read),
    // ERASE a subject set by doc-id tombstones (idempotent, anti-joined
    // out of every read), then COMPACT by checked staged swap and
    // REQUIRE every phrase and prefix answer bit-identical before and
    // after the fold. The oracle restates phrase occurrences AND prefix
    // term stats over exactly the surviving documents — a posting
    // leaked from the erased set, lost in the append, or duplicated by
    // the compact all break the hash. ORACLE-EXACT.
    QueryDef(
      "q278_positional_lifecycle",
      (s, dir) => {
        import graft.operators.PositionalIndex
        val idx = Similarity.freshIndexDir("pos_life")
        val docs = Tables(s, dir, "documents").select("doc_id", "text")
        PositionalIndex.build(docs.filter(col("doc_id") % 2 === 0), idx)
        PositionalIndex.append(docs.filter(col("doc_id") % 2 === 1), idx)
        PositionalIndex.delete(docs.filter(col("doc_id") % 9 === 2).select("doc_id"), idx)
        // replayed erasure request — tombstones must stay idempotent
        PositionalIndex.delete(docs.filter(col("doc_id") % 9 === 2).select("doc_id"), idx)
        def probes() = {
          val ph = PositionalIndex
            .phraseCounts(s, idx, Seq("spark", "join"))
            .select(
              lit("phrase:spark join").as("probe"),
              col("doc_id").cast("string").as("k"),
              col("n_occurrences").as("n")
            )
          val pre = PositionalIndex.prefixStats(s, idx, "st")
          val occ = pre.select(
            lit("prefix_occ:st").as("probe"),
            col("tok").as("k"),
            col("n_occurrences").as("n")
          )
          val df = pre.select(lit("prefix_df:st").as("probe"), col("tok").as("k"), col("df").as("n"))
          ph.unionByName(occ).unionByName(df)
        }
        val before = probes().collect().toSet
        PositionalIndex.compact(s, idx)
        val after = probes()
        require(after.collect().toSet == before, "compaction changed an answer")
        after.orderBy("probe", "k")
      },
      Some("""WITH live AS (
          SELECT doc_id, text FROM documents WHERE doc_id % 9 <> 2),
        toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM live),
        ph AS (
          SELECT doc_id, len(list_filter(range(1, len(t)),
                   i -> t[i] = 'spark' AND t[i+1] = 'join')) AS n
          FROM toks),
        tok1 AS (
          SELECT doc_id, tok FROM (
            SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM live)
          WHERE len(tok) > 0 AND tok LIKE 'st%'),
        pre AS (
          SELECT tok, CAST(count(DISTINCT doc_id) AS BIGINT) AS df,
                 count(*) AS occ
          FROM tok1 GROUP BY tok)
        SELECT probe, k, n FROM (
          SELECT 'phrase:spark join' AS probe, CAST(doc_id AS VARCHAR) AS k,
                 CAST(n AS BIGINT) AS n
          FROM ph WHERE n > 0
          UNION ALL SELECT 'prefix_occ:st', tok, occ FROM pre
          UNION ALL SELECT 'prefix_df:st', tok, df FROM pre)
        ORDER BY probe, k""")
    )
  )

  /** The post-lifecycle lookup semantics shared by batch q176 and the
    * live q184 gate: conjunctive ('spark' AND 'join') tf-ranked lookup
    * over the corpus minus the erased (doc_id % 13 = 0) documents. */
  private[queries] lazy val invertedMaintainOracle: String =
    """WITH toks AS (
          SELECT doc_id, tok, count(*) AS tf
          FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
          WHERE len(tok) > 0 AND doc_id % 13 <> 0 GROUP BY 1, 2)
        SELECT doc_id, CAST(sum(tf) AS BIGINT) AS score
        FROM toks WHERE tok IN ('spark', 'join')
        GROUP BY doc_id HAVING count(DISTINCT tok) = 2
        ORDER BY score DESC, doc_id"""
}
