package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys (the manual fallback when AQE's
  * skew-join split isn't available or the skew is in a non-shuffle-join
  * context).
  *
  * The skewed (large) side gets a uniform random-ish salt in [0, salts);
  * the small side is replicated `salts` times; joining on (key, salt)
  * spreads each hot key over `salts` reducer partitions. The salt here
  * is derived deterministically from a per-row fingerprint rather than
  * rand() so results — and tests — are reproducible.
  *
  * Cost model: replication multiplies the small side by `salts`, so use
  * it when |small| × salts ≪ |large-side hot-key partitions|. For
  * aggregation skew prefer two-phase aggregation (partial agg on
  * (key, salt), final on key) — see saltedCount.
  */
object SkewJoin {

  /** Equi-join `large ⋈ small` on `largeKey == smallKey`, salted. */
  def saltedJoin(
      large: DataFrame,
      small: DataFrame,
      largeKey: String,
      smallKey: String,
      salts: Int
  ): DataFrame = {
    // deterministic salt from the row's whole content fingerprint
    val saltedLarge = large.withColumn(
      "_salt",
      pmod(xxhash64(struct(large.columns.map(col).toSeq: _*)), lit(salts)).cast("int")
    )
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
    df.withColumn(
      "_salt",
      pmod(xxhash64(struct(df.columns.map(col).toSeq: _*)), lit(salts)).cast("int")
    ).groupBy(col(key), col("_salt"))
      .agg(count(lit(1)).as("_partial"))
      .groupBy(col(key))
      .agg(sum("_partial").as("cnt"))
}
