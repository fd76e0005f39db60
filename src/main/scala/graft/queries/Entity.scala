package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.operators.FuzzyJoin

/** Entity-resolution queries (SURVEY.md §2.3 — training-pipeline
  * extensions): linking near-identical entity strings before
  * per-entity aggregation, caps, or dedup.
  */
object Entity {

  val defs: Seq[QueryDef] = Seq(
    // ------------------------------------------------------------------
    // Fuzzy self-join within Levenshtein distance 1 over supplier
    // names via FastSS deletion-neighborhood blocking
    // (operators/FuzzyJoin): candidates from a bounded equi-join on
    // deletion keys, exact levenshtein verification per candidate. The
    // DuckDB oracle is the brute-force all-pairs restatement — only
    // viable BECAUSE it is the oracle at test scale; the engine plan is
    // the one that survives a 100M-name corpus.
    QueryDef(
      "q105_fuzzy_join",
      (s, dir) =>
        FuzzyJoin
          .editDistance1Pairs(Tables(s, dir, "supplier"), "s_name")
          .orderBy("name_a", "name_b"),
      Some("""WITH names AS (SELECT DISTINCT s_name AS name FROM supplier)
          SELECT a.name AS name_a, b.name AS name_b,
                 CAST(levenshtein(a.name, b.name) AS BIGINT) AS dist
          FROM names a JOIN names b ON a.name < b.name
          WHERE levenshtein(a.name, b.name) <= 1
          ORDER BY 1, 2""")
    )
  )
}
