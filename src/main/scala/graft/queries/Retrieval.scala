package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.operators.InvertedIndex

/** Keyword-serving queries over the persisted inverted index
  * (operators/InvertedIndex) — the lexical complement of the vector
  * indexes behind q153/q157/q158.
  */
object Retrieval {

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
    // idempotent under replay). The lookup after the full lifecycle
    // carries the SAME oracle semantics as q170 restricted to
    // surviving docs — so build+append+delete correctness is
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
        InvertedIndex
          .conjunctiveQuery(s, idx, Seq("spark", "join"))
          .orderBy(col("score").desc, col("doc_id"))
      },
      Some("""WITH toks AS (
          SELECT doc_id, tok, count(*) AS tf
          FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
          WHERE len(tok) > 0 AND doc_id % 13 <> 0 GROUP BY 1, 2)
        SELECT doc_id, CAST(sum(tf) AS BIGINT) AS score
        FROM toks WHERE tok IN ('spark', 'join')
        GROUP BY doc_id HAVING count(DISTINCT tok) = 2
        ORDER BY score DESC, doc_id""")
    )
  )
}
