package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys (the manual fallback when AQE's
  * skew-join split isn't available or the skew is in a non-shuffle-join
  * context).
  *
  * The skewed (large) side gets a uniform salt in [0, salts); the small
  * side is replicated `salts` times; joining on (key, salt) spreads
  * each hot key over `salts` reducer partitions. The salt hashes
  * `monotonically_increasing_id()` (row position), NOT row content: the
  * archetypal skew workload is millions of BYTE-IDENTICAL rows on one
  * hot key, and a content fingerprint would give them all the same salt
  * — leaving the join exactly as skewed as before. Position-derived
  * salt spreads duplicates uniformly and stays deterministic for a
  * fixed input layout (same file splits ⇒ same ids), which is the same
  * reproducibility rand(seed) offers, without depending on content.
  *
  * Cost model: replication multiplies the small side by `salts`, so use
  * it when |small| × salts ≪ |large-side hot-key partitions|. For
  * aggregation skew prefer two-phase aggregation (partial agg on
  * (key, salt), final on key) — see saltedCount.
  */
object SkewJoin {

  /** Position-derived salt in [0, salts) — see the class doc for why
    * this must not be a content fingerprint. Package-visible so specs
    * can assert the spread on duplicate-heavy input. */
  private[graft] def saltCol(salts: Int) =
    pmod(xxhash64(monotonically_increasing_id()), lit(salts)).cast("int")

  /** Equi-join `large ⋈ small` on `largeKey == smallKey`, salted. */
  def saltedJoin(
      large: DataFrame,
      small: DataFrame,
      largeKey: String,
      smallKey: String,
      salts: Int
  ): DataFrame = {
    val saltedLarge = large.withColumn("_salt", saltCol(salts))
    val replicatedSmall = small.withColumn(
      "_salt",
      explode(expr(s"sequence(0, ${salts - 1})"))
    )
    saltedLarge
      .join(
        replicatedSmall,
        saltedLarge(largeKey) === replicatedSmall(smallKey) &&
          saltedLarge("_salt") === replicatedSmall("_salt")
      )
      .drop("_salt")
  }

  /** Two-phase (salted) count aggregation for a skewed group key:
    * partial count on (key, salt) — spreading hot keys across
    * partitions — then final sum on key. Equivalent to groupBy(key)
    * .count() but with bounded per-partition group size.
    */
  def saltedCount(df: DataFrame, key: String, salts: Int): DataFrame =
    df.withColumn("_salt", saltCol(salts))
      .groupBy(col(key), col("_salt"))
      .agg(count(lit(1)).as("_partial"))
      .groupBy(col(key))
      .agg(sum("_partial").as("cnt"))
}
