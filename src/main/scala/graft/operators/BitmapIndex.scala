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

  /** The packed words of `df`: one row per (value, word). */
  private def packed(df: DataFrame, keyCol: String, valueCol: String): DataFrame =
    df.select(col(valueCol).cast("string").as("value"), col(keyCol).cast("long").as("k"))
      .filter(col("k") >= 0)
      .groupBy(col("value"), expr("k DIV 64").as("word"))
      .agg(expr("bit_or(shiftleft(1L, CAST(k % 64 AS INT)))").as("bits"))

  /** Build the bitmap for `valueCol` keyed by the non-negative
    * integer `keyCol`, as segment 0 under `dir/col=<valueCol>/`. */
  def build(df: DataFrame, keyCol: String, valueCol: String, dir: String): Unit =
    packed(df, keyCol, valueCol)
      .repartition(col("word"))
      .write
      .mode("overwrite")
      .parquet(s"$dir/col=$valueCol/seg=0")

  private def segments(s: SparkSession, dir: String, valueCol: String): Seq[Int] = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/col=$valueCol")
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else
      fs.listStatus(p)
        .toSeq
        .map(_.getPath.getName)
        .collect { case n if n.startsWith("seg=") => n.stripPrefix("seg=").toInt }
        .sorted
  }

  /** INCREMENTAL APPEND: new rows land as one more OR-mergeable
    * segment — O(batch) cost, the existing segments are never read
    * (the same log-structured contract as the shingle index's df
    * segments). Reads fold segments by `bit_or` per (value, word). */
  def append(df: DataFrame, keyCol: String, valueCol: String, dir: String): Unit = {
    val s = df.sparkSession
    val next = (segments(s, dir, valueCol) :+ -1).max + 1
    packed(df, keyCol, valueCol)
      .repartition(col("word"))
      .write
      .mode("errorifexists")
      .parquet(s"$dir/col=$valueCol/seg=$next")
  }

  /** ERASURE: deleted keys land as one NEGATIVE mask segment under
    * `del/` — value-agnostic (a forgotten key leaves EVERY value's
    * bitmap), request-scaled, idempotent (re-deleting ORs the same
    * bits). Reads AND-NOT the folded delete mask per word. */
  def delete(keys: DataFrame, keyCol: String, dir: String): Unit = {
    val s = keys.sparkSession
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(s.sparkContext.hadoopConfiguration)
    val existing =
      if (!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/del"))) Seq.empty[Int]
      else
        fs.listStatus(new org.apache.hadoop.fs.Path(s"$dir/del"))
          .toSeq
          .map(_.getPath.getName)
          .collect { case n if n.startsWith("seg=") => n.stripPrefix("seg=").toInt }
    val next = (existing :+ -1).max + 1
    keys
      .select(col(keyCol).cast("long").as("k"))
      .filter(col("k") >= 0)
      .groupBy(expr("k DIV 64").as("word"))
      .agg(expr("bit_or(shiftleft(1L, CAST(k % 64 AS INT)))").as("dbits"))
      .coalesce(1)
      .write
      .mode("errorifexists")
      .parquet(s"$dir/del/seg=$next")
  }

  private def delMask(s: SparkSession, dir: String): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/del")
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else
      Some(
        s.read
          .option("recursiveFileLookup", "true")
          .parquet(s"$dir/del")
          .groupBy("word")
          .agg(expr("bit_or(dbits)").as("dbits"))
      )
  }

  /** COMPACT: fold every segment and the delete mask into one base
    * segment (zero words dropped), clear the tombstones — the same
    * checked staged-swap discipline as the other persisted indexes. */
  def compact(s: SparkSession, dir: String, valueCol: String): Unit = {
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(s.sparkContext.hadoopConfiguration)
    val staged = new org.apache.hadoop.fs.Path(s"$dir/col=$valueCol.compacting")
    folded(s, dir, valueCol)
      .filter(col("bits") =!= 0L)
      .repartition(col("word"))
      .write
      .mode("overwrite")
      .parquet(s"$staged/seg=0")
    val live = new org.apache.hadoop.fs.Path(s"$dir/col=$valueCol")
    if (!fs.delete(live, true))
      throw new java.io.IOException(s"bitmap compact: failed to remove $live")
    if (!fs.rename(staged, live))
      throw new java.io.IOException(s"bitmap compact: failed to swap $staged")
    val del = new org.apache.hadoop.fs.Path(s"$dir/del")
    if (fs.exists(del) && !fs.delete(del, true))
      throw new java.io.IOException(s"bitmap compact: failed to clear $del")
  }

  /** All segments OR-folded per (value, word), delete mask applied. */
  private def folded(s: SparkSession, dir: String, valueCol: String): DataFrame = {
    val segs = s.read
      .option("recursiveFileLookup", "true")
      .parquet(s"$dir/col=$valueCol")
      .groupBy("value", "word")
      .agg(expr("bit_or(bits)").as("bits"))
    delMask(s, dir) match {
      case None => segs
      case Some(d) =>
        segs
          .join(broadcast(d), Seq("word"), "left_outer")
          .withColumn("bits", col("bits").bitwiseAND(expr("~coalesce(dbits, 0L)")))
          .select("value", "word", "bits")
    }
  }

  private def read(s: SparkSession, dir: String, valueCol: String, value: String): DataFrame =
    folded(s, dir, valueCol)
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
    folded(s, dir, valueCol)
      .groupBy("value")
      .agg(sum(bit_count(col("bits"))).as("n"))
}
