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
  /** The single-deletion transform over a string-typed SQL expression
    * (code-point based: `substring` counts code points in Spark, so
    * astral-plane text deletes whole characters, matching levenshtein's
    * unit). */
  private def d1Of(e: String): String =
    s"transform(sequence(1, length($e)), " +
      s"i -> concat(substring($e, 1, i - 1), substring($e, i + 1, length($e))))"

  /** D0 ∪ … ∪ D`depth` neighborhood of a `name` column, one (name, k)
    * row per distinct key. depth 1 is classic FastSS-1; depth 2 adds
    * every two-deletion variant (keys per string ≈ 1 + L + C(L, 2)).
    * Package-visible so specs can assert key-multiplicity bounds on
    * skewed fixtures.
    */
  private[graft] def deletionNeighborhood(names: DataFrame, depth: Int = 1): DataFrame = {
    require(depth == 1 || depth == 2, s"deletion depth must be 1 or 2, got $depth")
    val parts = Seq(
      "array(name)",
      d1Of("name")
    ) ++ (if (depth == 2) Seq(s"flatten(transform(${d1Of("name")}, s -> ${d1Of("s")}))")
          else Nil)
    names.select(
      col("name"),
      explode(expr(s"array_distinct(concat(${parts.mkString(", ")}))")).as("k")
    )
  }

  def editDistance1Pairs(
      df: DataFrame,
      column: String,
      maxKeyDf: Option[Int] = None
  ): DataFrame = editDistancePairs(df, column, maxDist = 1, maxKeyDf)

  /** All unordered pairs of distinct values of `column` within
    * Levenshtein distance `maxDist` (1 or 2) — FastSS at deletion depth
    * `maxDist`: ed(s₁, s₂) ≤ k ⟹ the depth-k deletion neighborhoods
    * intersect (Bocek et al.; only the forward implication holds — e.g.
    * "ab"/"ba" share depth-1 keys {a, b} yet ed = 2), so the key
    * equi-join is a complete SUPERSET blocking and the exact
    * `levenshtein` verification is REQUIRED for correctness, not just a
    * prune. Depth 2 multiplies keys per string
    * (≈ C(L, 2)) and key multiplicities, so the d2 variant is where
    * `maxKeyDf` earns its keep on low-entropy corpora.
    *
    * @return (name_a, name_b, dist) with name_a < name_b
    */
  def editDistancePairs(
      df: DataFrame,
      column: String,
      maxDist: Int,
      maxKeyDf: Option[Int] = None
  ): DataFrame = {
    val names = df.select(col(column).cast("string").as("name")).distinct()
    val keyed = deletionNeighborhood(names, depth = maxDist)
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
      .filter(col("dist") <= maxDist)
  }
}
