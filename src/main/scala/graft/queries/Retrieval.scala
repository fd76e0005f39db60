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
    )
  )
}
