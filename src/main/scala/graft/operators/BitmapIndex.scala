package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Relational BITMAP INDEX over a low-cardinality column — the
  * classic OLAP point/AND/OR accelerator (Oracle bitmap indexes,
  * Druid, Pinot; roaring-bitmap systems keep the same keyed-word
  * layout), built as plain parquet: one row per (value, word) where
  * `word = row_key DIV 64` and `bits` packs the 64 membership flags
  * as one BIGINT (`bit_or(1 << (key % 64))` — an ordinary partial-
  * aggregated groupBy, so construction is one exchange and the
  * result is mergeable by further OR). Everything downstream is
  * integer algebra the engine codegens:
  *
  *   COUNT(value)        = Σ bit_count(bits)
  *   COUNT(a AND b)      = Σ bit_count(bitsA & bitsB)   (word equi-join)
  *   COUNT(a OR b)       = Σ bit_count(bitsA | bitsB)   (full-outer OR)
  *
  * — set algebra on |keys|/64 words per value, never a row-level
  * join of the fact table. At 100 TB: the index is
  * O(cardinality × keyspace/64) words, word-partitioned so the AND/OR
  * joins are co-partitioned and the per-value slices prune by the
  * value predicate at scan time; sparse key ranges simply have no
  * word rows (absence = empty word). Distinct from the bloom index
  * (probabilistic point SKIPPING) — a bitmap answers exact COUNTS and
  * composes with AND/OR without touching data.
  */
object BitmapIndex {

  /** Build the bitmap for `valueCol` keyed by the non-negative
    * integer `keyCol`, under `dir/col=<valueCol>/`. */
  def build(df: DataFrame, keyCol: String, valueCol: String, dir: String): Unit =
    df.select(col(valueCol).cast("string").as("value"), col(keyCol).cast("long").as("k"))
      .filter(col("k") >= 0)
      .groupBy(col("value"), expr("k DIV 64").as("word"))
      .agg(expr("bit_or(shiftleft(1L, CAST(k % 64 AS INT)))").as("bits"))
      .repartition(col("word"))
      .write
      .mode("overwrite")
      .parquet(s"$dir/col=$valueCol")

  private def read(s: SparkSession, dir: String, valueCol: String, value: String): DataFrame =
    s.read
      .parquet(s"$dir/col=$valueCol")
      .filter(col("value") === value)
      .select("word", "bits")

  /** Exact member count of one value — Σ bit_count over its words. */
  def count(s: SparkSession, dir: String, valueCol: String, value: String): Long =
    read(s, dir, valueCol, value)
      .agg(coalesce(sum(bit_count(col("bits"))), lit(0L)))
      .head()
      .getLong(0)

  /** Exact |a ∩ b| across two (possibly different-column) values —
    * word-aligned AND. */
  def intersectCount(
      s: SparkSession,
      dir: String,
      colA: String,
      valueA: String,
      colB: String,
      valueB: String
  ): Long =
    read(s, dir, colA, valueA)
      .withColumnRenamed("bits", "ba")
      .join(read(s, dir, colB, valueB).withColumnRenamed("bits", "bb"), Seq("word"))
      .agg(coalesce(sum(bit_count(col("ba").bitwiseAND(col("bb")))), lit(0L)))
      .head()
      .getLong(0)

  /** Exact |a ∪ b| — full-outer word OR (absent word = 0). */
  def unionCount(
      s: SparkSession,
      dir: String,
      colA: String,
      valueA: String,
      colB: String,
      valueB: String
  ): Long =
    read(s, dir, colA, valueA)
      .withColumnRenamed("bits", "ba")
      .join(read(s, dir, colB, valueB).withColumnRenamed("bits", "bb"), Seq("word"), "full_outer")
      .agg(
        coalesce(
          sum(bit_count(coalesce(col("ba"), lit(0L)).bitwiseOR(coalesce(col("bb"), lit(0L))))),
          lit(0L)
        )
      )
      .head()
      .getLong(0)

  /** The same counts as ONE DataFrame for registered-query use: every
    * distinct value's cardinality from its bitmap alone. */
  def valueCounts(s: SparkSession, dir: String, valueCol: String): DataFrame =
    s.read
      .parquet(s"$dir/col=$valueCol")
      .groupBy("value")
      .agg(sum(bit_count(col("bits"))).as("n"))
}
