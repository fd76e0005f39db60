package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fuzzy self-join on string keys within Levenshtein distance 1 —
  * entity resolution for near-identical names/ids (the record-linkage
  * step of corpus curation: merging variant spellings of the same
  * source, author, or domain before per-entity caps and dedup).
  *
  * Blocking: the FastSS deletion neighborhood (Bocek et al., "Fast
  * Similarity Search in Large Dictionaries"). For each string emit the
  * string itself plus every single-character deletion; two strings are
  * within edit distance 1 iff they share a neighborhood key
  * (substitution at i → both delete i; insertion/deletion → the shorter
  * string IS a deletion of the longer; equality → the string itself).
  * Candidates are therefore a bounded equi-join on the key — never
  * all-pairs — and each candidate is verified with the exact
  * `levenshtein` before it is emitted, so blocking only prunes, it
  * never decides.
  *
  * 100 TB posture: keys per string = length+1 (explode factor ~L), and
  * key multiplicity for high-entropy strings is near 1, so the
  * candidate stream stays linear in input; the equi-join shuffles on
  * the key like any hash join. Pathologically hot keys (millions of
  * strings one deletion apart) would need the same document-frequency
  * cap the n-gram dedup family applies (queries/Dedup df∈[2,50]) — at
  * the cost of the exactness guarantee, which is why this operator
  * does not apply one by default.
  */
object FuzzyJoin {

  /** All unordered pairs of distinct values of `column` within
    * Levenshtein distance 1, exactly.
    *
    * @return (name_a, name_b, dist) with name_a < name_b
    */
  def editDistance1Pairs(df: DataFrame, column: String): DataFrame = {
    val names = df.select(col(column).cast("string").as("name")).distinct()
    // D0 ∪ D1: the string plus each single-code-point deletion
    // (substring is code-point based in Spark, so astral-plane text
    // deletes whole characters, matching levenshtein's unit)
    val keyed = names.select(
      col("name"),
      explode(
        array_distinct(
          concat(
            array(col("name")),
            expr(
              "transform(sequence(1, length(name)), " +
                "i -> concat(substring(name, 1, i - 1), substring(name, i + 1, length(name))))"
            )
          )
        )
      ).as("k")
    )
    val a = keyed.as("a")
    val b = keyed.as("b")
    a.join(b, col("a.k") === col("b.k") && col("a.name") < col("b.name"))
      .select(col("a.name").as("name_a"), col("b.name").as("name_b"))
      .distinct() // two strings can share several keys; one verdict per pair
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")).cast("long"))
      .filter(col("dist") <= 1)
  }
}
