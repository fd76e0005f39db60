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
    ),

    // ------------------------------------------------------------------
    // The same resolution at radius 2 — full FastSS, not the d=1
    // special case: depth-2 deletion neighborhoods (keys ≈ C(L,2) per
    // string) block candidates, exact levenshtein verifies. The query
    // runs over every 4th supplier: templated ids are the adversarial
    // low-entropy corpus for depth-2 blocking (names sharing all but
    // the deleted digit positions make keys hot, and candidates grow
    // as Σ C(df, 2)) — the subset keeps the demonstration exact AND
    // bounded, and `maxKeyDf` is the documented control when a full
    // low-entropy corpus must be processed (at the stated recall
    // trade). Emits per-name NEIGHBOR COUNTS by distance —
    // cardinality-per-name pins the same information as the pair set
    // at a fraction of the compare cost. Oracle = brute force, viable
    // only because it is the oracle at test scale.
    QueryDef(
      "q127_fuzzy_join_d2",
      (s, dir) => {
        val pairs = FuzzyJoin
          .editDistancePairs(
            Tables(s, dir, "supplier").filter(col("s_suppkey") % 4 === 0),
            "s_name",
            maxDist = 2
          )
        pairs
          .select(col("name_a").as("name"), col("dist"))
          .unionByName(pairs.select(col("name_b").as("name"), col("dist")))
          .groupBy("name")
          .agg(
            sum(when(col("dist") === 1L, 1L).otherwise(0L)).as("n_d1"),
            sum(when(col("dist") === 2L, 1L).otherwise(0L)).as("n_d2")
          )
          .orderBy("name")
      },
      Some("""WITH names AS (SELECT DISTINCT s_name AS name FROM supplier
                             WHERE s_suppkey % 4 = 0),
          pairs AS (
            SELECT a.name AS na, levenshtein(a.name, b.name) AS d
            FROM names a JOIN names b ON a.name <> b.name
            WHERE levenshtein(a.name, b.name) <= 2)
          SELECT na AS name,
                 CAST(sum(CASE WHEN d = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_d1,
                 CAST(sum(CASE WHEN d = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_d2
          FROM pairs GROUP BY 1 ORDER BY 1""")
    )
  )
}
