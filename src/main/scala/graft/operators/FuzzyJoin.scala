package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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
  * strings one deletion apart) explode the self-join quadratically —
  * for those inputs use `editDistance1Pairs(df, col, maxKeyDf = …)`,
  * which drops keys whose multiplicity exceeds the cap before the join
  * (the same document-frequency cap the n-gram dedup family applies,
  * queries/Dedup df∈[2,50]). The cap bounds candidates per key at
  * C(cap,2) at the cost of the exactness guarantee: a pair whose EVERY
  * shared key is hot is missed (for distance-1 pairs that means ≥
  * `maxKeyDf` strings one edit from both — already a merge-cluster, not
  * a pair, at that density). The default applies no cap and stays
  * exact.
  */
object FuzzyJoin {

  /** All unordered pairs of distinct values of `column` within
    * Levenshtein distance 1 — exactly when `maxKeyDf` is None; minus
    * pairs all of whose shared deletion keys exceed the cap otherwise.
    *
    * @param maxKeyDf optional hot-key guard: deletion keys shared by
    *                 more than this many distinct strings are excluded
    *                 from candidate generation (see class doc)
    * @return (name_a, name_b, dist) with name_a < name_b
    */
  /** D0 ∪ D1 neighborhood of a `name` column: the string plus each
    * single-code-point deletion, one (name, k) row per key. (substring
    * is code-point based in Spark, so astral-plane text deletes whole
    * characters, matching levenshtein's unit.) Package-visible so specs
    * can assert key-multiplicity bounds on skewed fixtures.
    */
  private[graft] def deletionNeighborhood(names: DataFrame): DataFrame =
    names.select(
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

  def editDistance1Pairs(
      df: DataFrame,
      column: String,
      maxKeyDf: Option[Int] = None
  ): DataFrame = {
    val names = df.select(col(column).cast("string").as("name")).distinct()
    val keyed = deletionNeighborhood(names)
    // Hot-key guard: count key multiplicity with a window over the same
    // hash layout the join shuffles on (one exchange, no extra join)
    // and drop rows carrying a hot key. The hot rows still shuffle once
    // — what the cap removes is the quadratic pair expansion.
    val pruned = maxKeyDf match {
      case Some(cap) =>
        keyed
          .withColumn("kdf", count(lit(1)).over(Window.partitionBy("k")))
          .filter(col("kdf") <= cap)
          .drop("kdf")
      case None => keyed
    }
    val a = pruned.as("a")
    val b = pruned.as("b")
    a.join(b, col("a.k") === col("b.k") && col("a.name") < col("b.name"))
      .select(col("a.name").as("name_a"), col("b.name").as("name_b"))
      .distinct() // two strings can share several keys; one verdict per pair
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")).cast("long"))
      .filter(col("dist") <= 1)
  }
}
