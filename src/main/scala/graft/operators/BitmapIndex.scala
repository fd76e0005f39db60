package graft.operators

import org.apache.hadoop.fs.Path
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
  *
  * Delete masks are SEGMENT-VERSIONED (round 14): each `del/seg=N`
  * carries an `_asof` sidecar recording, per indexed column, the
  * highest data segment that existed when the erasure landed, and
  * reads apply the mask only to data segments at or below that
  * watermark. A key erased and later legitimately RE-APPENDED (a
  * user deleted and re-created — doc-id reuse) therefore survives:
  * its bits live in a younger segment the mask never touches. A del
  * segment whose sidecar is missing (torn write) fails CLOSED — it
  * masks every segment, over-erasing rather than leaking.
  */
object BitmapIndex {

  /** The packed words of `df`: one row per (value, word). */
  private def packed(df: DataFrame, keyCol: String, valueCol: String): DataFrame =
    df.select(col(valueCol).cast("string").as("value"), col(keyCol).cast("long").as("k"))
      .filter(col("k") >= 0)
      .groupBy(col("value"), expr("k DIV 64").as("word"))
      .agg(expr("bit_or(shiftleft(1L, CAST(k % 64 AS INT)))").as("bits"))

  private def fsOf(s: SparkSession, dir: String) =
    new Path(dir).getFileSystem(s.sparkContext.hadoopConfiguration)

  private def numberedChildren(s: SparkSession, path: String, prefix: String): Seq[Int] = {
    val p = new Path(path)
    val fs = fsOf(s, path)
    if (!fs.exists(p)) Seq.empty
    else
      fs.listStatus(p)
        .toSeq
        .map(_.getPath.getName)
        .collect { case n if n.startsWith(prefix) => n.stripPrefix(prefix).toInt }
        .sorted
  }

  /** Build the bitmap for `valueCol` keyed by the non-negative
    * integer `keyCol`, as segment 0 under `dir/col=<valueCol>/`. */
  def build(df: DataFrame, keyCol: String, valueCol: String, dir: String): Unit =
    packed(df, keyCol, valueCol)
      .repartition(col("word"))
      .write
      .mode("overwrite")
      .parquet(s"$dir/col=$valueCol/seg=0")

  private def segments(s: SparkSession, dir: String, valueCol: String): Seq[Int] =
    numberedChildren(s, s"$dir/col=$valueCol", "seg=")

  /** Every indexed column under `dir` (live layouts only — a
    * `.compacting` staging dir is not a column). */
  private def columns(s: SparkSession, dir: String): Seq[String] = {
    val p = new Path(dir)
    val fs = fsOf(s, dir)
    if (!fs.exists(p)) Seq.empty
    else
      fs.listStatus(p)
        .toSeq
        .map(_.getPath.getName)
        .collect {
          case n if n.startsWith("col=") && !n.endsWith(".compacting") => n.stripPrefix("col=")
        }
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
    * bits). The `_asof` sidecar (written AFTER the mask data, so a
    * torn delete fails closed) pins the mask to the data segments
    * that existed when it landed: reads AND-NOT it out of those
    * segments only, and a later re-append of the same key is not
    * retro-erased. */
  def delete(keys: DataFrame, keyCol: String, dir: String): Unit = {
    val s = keys.sparkSession
    val fs = fsOf(s, dir)
    val next = (numberedChildren(s, s"$dir/del", "seg=") :+ -1).max + 1
    val asof = columns(s, dir).map(c => c -> (segments(s, dir, c) :+ -1).max)
    keys
      .select(col(keyCol).cast("long").as("k"))
      .filter(col("k") >= 0)
      .groupBy(expr("k DIV 64").as("word"))
      .agg(expr("bit_or(shiftleft(1L, CAST(k % 64 AS INT)))").as("dbits"))
      .coalesce(1)
      .write
      .mode("errorifexists")
      .parquet(s"$dir/del/seg=$next")
    // sidecar LAST: data-without-sidecar = torn delete = mask applies
    // to every segment (over-erase, never leak). Underscore name keeps
    // it invisible to the parquet reader above.
    val out = fs.create(new Path(s"$dir/del/seg=$next/_asof"), /* overwrite = */ true)
    try out.write(asof.map { case (c, m) => s"$c\t$m" }.mkString("\n").getBytes("UTF-8"))
    finally out.close()
  }

  /** The delete-mask rows relevant to `valueCol`: (word, dbits, asof)
    * per del segment, `asof` the highest data segment the mask covers
    * (Long.MaxValue when the sidecar is missing or predates the
    * column — fail closed). */
  private def delMask(s: SparkSession, dir: String, valueCol: String): Option[DataFrame] = {
    val segs = numberedChildren(s, s"$dir/del", "seg=")
    if (segs.isEmpty) return None
    val fs = fsOf(s, dir)
    Some(segs.map { n =>
      val sidecar = new Path(s"$dir/del/seg=$n/_asof")
      val asof: Long =
        if (!fs.exists(sidecar)) Long.MaxValue
        else {
          val in = fs.open(sidecar)
          val text =
            try new String(in.readAllBytes(), "UTF-8")
            finally in.close()
          text.linesIterator
            .map(_.split('\t'))
            .collectFirst { case Array(c, m) if c == valueCol => m.toLong }
            .getOrElse(Long.MaxValue)
        }
      s.read
        .parquet(s"$dir/del/seg=$n")
        .select(col("word").as("dword"), col("dbits"), lit(asof).as("asof"))
    }.reduce(_ unionByName _))
  }

  /** All of `valueCol`'s segments OR-folded per (value, word), each
    * del mask AND-NOTed out of the segments it covers (seg ≤ asof). */
  private def folded(s: SparkSession, dir: String, valueCol: String): DataFrame = {
    // hive-style seg=N children: plain partition inference yields the
    // seg column the mask watermarks compare against
    val data = s.read
      .parquet(s"$dir/col=$valueCol")
      .select(col("value"), col("word"), col("bits"), col("seg").cast("long").as("seg"))
    delMask(s, dir, valueCol) match {
      case None =>
        data.groupBy("value", "word").agg(expr("bit_or(bits)").as("bits"))
      case Some(d) =>
        data
          .join(
            broadcast(d),
            data("word") === d("dword") && d("asof") >= data("seg"),
            "left_outer"
          )
          .withColumn("dbits0", coalesce(col("dbits"), lit(0L)))
          .groupBy("value", "word", "seg")
          .agg(expr("max(bits) & ~bit_or(dbits0)").as("bits"))
          .groupBy("value", "word")
          .agg(expr("bit_or(bits)").as("bits"))
    }
  }

  /** COMPACT: fold EVERY column's segments with the delete masks into
    * one base segment per column, then clear the tombstones — all
    * columns before the shared `del/` clears, because the mask is
    * value-agnostic (compacting one column and clearing del would
    * silently un-erase every other column). Crash-safe at each seam:
    *   - the folded base lands at a segment number ABOVE every
    *     existing one, so leftover (uncleared) masks are inert on it
    *     (asof watermarks only reach the old segments) and a re-run
    *     refolds idempotently;
    *   - stale `.compacting` staging from a crashed attempt is
    *     cleared before staging anew;
    *   - a crash between a column's live-delete and staged-rename is
    *     RESUMED on the next call (live missing + staging present →
    *     finish the rename), so the index is never left unreadable. */
  def compact(s: SparkSession, dir: String): Unit = {
    val fs = fsOf(s, dir)
    // resume any column whose swap was interrupted mid-rename
    val p = new Path(dir)
    if (fs.exists(p))
      fs.listStatus(p)
        .toSeq
        .map(_.getPath.getName)
        .collect { case n if n.startsWith("col=") && n.endsWith(".compacting") => n }
        .foreach { staged =>
          val livName = staged.stripSuffix(".compacting")
          val liv = new Path(dir, livName)
          if (!fs.exists(liv)) {
            if (!fs.rename(new Path(dir, staged), liv))
              throw new java.io.IOException(s"bitmap compact: failed to resume swap of $staged")
          }
        }
    val cols = columns(s, dir)
    val plans = cols.map { c =>
      val staged = new Path(s"$dir/col=$c.compacting")
      if (fs.exists(staged) && !fs.delete(staged, true))
        throw new java.io.IOException(s"bitmap compact: failed to clear stale staging $staged")
      // the folded base sits ABOVE every old segment: leftover del
      // masks (cleared only at the very end) cannot re-erase it, so a
      // key re-appended after an erasure survives a crashed re-run
      val newSeg = (segments(s, dir, c) :+ -1).max + 1
      folded(s, dir, c)
        .filter(col("bits") =!= 0L)
        .repartition(col("word"))
        .write
        .mode("overwrite")
        .parquet(s"$staged/seg=$newSeg")
      c -> staged
    }
    plans.foreach { case (c, staged) =>
      val live = new Path(s"$dir/col=$c")
      if (!fs.delete(live, true))
        throw new java.io.IOException(s"bitmap compact: failed to remove $live")
      if (!fs.rename(staged, live))
        throw new java.io.IOException(s"bitmap compact: failed to swap $staged")
    }
    val del = new Path(s"$dir/del")
    if (fs.exists(del) && !fs.delete(del, true))
      throw new java.io.IOException(s"bitmap compact: failed to clear $del")
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

  /** Point MEMBERSHIP probe: for each key in `keys`, the values whose
    * bitmap holds it — the DSAR/census surface (which index artifacts
    * retain this subject?). Cost: the keys' WORDS only — the probe set
    * is broadcast onto the folded words it touches, never a scan of
    * the keyspace. */
  def membership(
      s: SparkSession,
      dir: String,
      valueCol: String,
      keys: DataFrame,
      keyCol: String
  ): DataFrame = {
    val probe = keys
      .select(col(keyCol).cast("long").as("k"))
      .filter(col("k") >= 0)
      .distinct()
      .withColumn("word", expr("k DIV 64"))
    folded(s, dir, valueCol)
      .join(broadcast(probe), Seq("word"))
      .filter(expr("((bits >> CAST(k % 64 AS INT)) & 1) = 1"))
      .select(col("k"), col("value"))
  }

  /** The same counts as ONE DataFrame for registered-query use: every
    * distinct value's cardinality from its bitmap alone. */
  def valueCounts(s: SparkSession, dir: String, valueCol: String): DataFrame =
    folded(s, dir, valueCol)
      .groupBy("value")
      .agg(sum(bit_count(col("bits"))).as("n"))
      .filter(col("n") > 0)
}
