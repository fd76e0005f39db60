package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted near-dup admission index — the production bound for the
  * q146/q149 admission check's standing caveat: the streaming gate
  * re-SHINGLES the whole corpus every verdict recomputation, which is
  * the right correctness contract and the wrong steady-state cost.
  * This index pays the text explode ONCE: per-doc distinct word
  * 3-shingles persist as relational rows (`partitionBy` a 16-way md5
  * bucket of the shingle — InvertedIndex's layout discipline), and the
  * document-frequency table persists beside them as LOG-STRUCTURED
  * SEGMENTS (each append adds one partial-count segment; the true df
  * is the segment sum — the count-min/mergeable-sketch pattern), so:
  *
  *  - [[build]]/[[append]] cost O(batch shingles) — the existing
  *    layout is never re-read, never rewritten;
  *  - [[admit]] computes verdicts IDENTICAL to the from-scratch
  *    `admissionPairs` recompute (q146's oracle certifies it end to
  *    end) while reading compact shingle rows instead of re-exploding
  *    document text: df(union) = df(segments) + df(batch), the rare
  *    set (df ∈ [2, 50]) restricts both join sides, and the pair join
  *    carries only rare-shingle rows;
  *  - [[compactDf]] folds the df segments into one (checked
  *    staged-rewrite swap, IvfIndex.compact's discipline) at
  *    maintenance cadence, bounding the segment-sum fan-in;
  *  - [[delete]]/[[compact]] close the ERASURE loop (q202's
  *    right-to-be-forgotten contract — a forgotten document must not
  *    survive in ANY index, this one included): delete writes doc-id
  *    tombstones AND a NEGATIVE df segment (counts must decrement —
  *    the log-structured segments already sum, so a minus-count
  *    segment is the natural decrement; the one rows-scan it costs is
  *    paid at erasure cadence, never per verdict), [[admit]] reads
  *    tombstone-filtered rows, and [[compact]] folds tombstones out of
  *    the row layout and rebuilds df from the survivors (checked
  *    staged swaps; idempotent on replay). Contract: a tombstoned
  *    doc_id must not be re-appended before the next [[compact]] —
  *    the same re-admission contract as InvertedIndex.
  */
object ShingleIndex {

  private val HexDigits = "0123456789abcdef"

  /** Explicit row schema so an index whose rows were fully erased (or
    * a bucket dir with no files) still reads — schema inference fails
    * on empty layouts (InvertedIndex.postingSchema's rationale). */
  private val rowSchema = org.apache.spark.sql.types.StructType(
    Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("g", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("bkt", org.apache.spark.sql.types.IntegerType)
    )
  )

  private def shingleRows(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), explode(expr("word_shingles(text, 3)")).as("g"))
      .withColumn("bkt", expr(s"instr('$HexDigits', substring(md5(g), 1, 1)) - 1"))

  /** Per-shingle distinct-doc counts of a batch — one df SEGMENT.
    * Shingle rows are distinct per doc (word_shingles dedups), so a
    * plain count is the document frequency. */
  private def dfSegment(rows: DataFrame): DataFrame =
    rows.groupBy("g").agg(count(lit(1)).as("df"))

  def build(docs: DataFrame, indexDir: String): Unit = {
    val rows = shingleRows(docs).localCheckpoint()
    rows.write.partitionBy("bkt").mode("errorifexists").parquet(s"$indexDir/rows")
    dfSegment(rows).write.mode("errorifexists").parquet(s"$indexDir/df/seg=0")
  }

  /** Fold a new crawl batch in: rows append into the bucket layout,
    * counts append as a fresh df segment — O(batch), layout untouched. */
  def append(newDocs: DataFrame, indexDir: String): Unit = {
    val s = newDocs.sparkSession
    val seg = 1 + listSegments(s, indexDir).max
    val rows = shingleRows(newDocs).localCheckpoint()
    rows.write.partitionBy("bkt").mode("append").parquet(s"$indexDir/rows")
    dfSegment(rows).write.mode("errorifexists").parquet(s"$indexDir/df/seg=$seg")
  }

  private def listSegments(s: SparkSession, indexDir: String): Seq[Int] = {
    val p = new org.apache.hadoop.fs.Path(s"$indexDir/df")
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.listStatus(p)
      .toSeq
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .collect { case n if n.startsWith("seg=") => n.stripPrefix("seg=").toInt }
  }

  /** The true df table: segment sum (partial counts ADD; erasure's
    * negative segments SUBTRACT — same fold). Shingles whose counts
    * net to zero carry no information and are dropped so the table
    * matches a from-scratch recompute over the surviving corpus. */
  private[graft] def dfTable(s: SparkSession, indexDir: String): DataFrame =
    s.read
      .parquet(s"$indexDir/df")
      .groupBy("g")
      .agg(sum("df").as("df"))
      .filter(col("df") > 0)

  /** Shingle rows minus accumulated erasure tombstones — what every
    * read path consumes (InvertedIndex.liveData's contract: the
    * tombstone set is erasure-request-sized, so it broadcasts). */
  private[graft] def liveRows(s: SparkSession, indexDir: String): DataFrame = {
    val raw = s.read.schema(rowSchema).parquet(s"$indexDir/rows")
    val tombs = new org.apache.hadoop.fs.Path(s"$indexDir/tombstones")
    val fs = tombs.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(tombs))
      raw.join(broadcast(s.read.parquet(tombs.toString)), Seq("doc_id"), "left_anti")
    else raw
  }

  /** Erasure: forget `docIds` from the admission index. Two writes —
    * doc-id tombstones (read paths anti-join them out immediately) and
    * ONE negative df segment holding minus the forgotten docs' shingle
    * counts, so df(union) stays exact without touching the row layout.
    * The negative segment needs the forgotten docs' shingle rows,
    * which costs one scan of the compact (g, doc_id) rows — paid at
    * erasure cadence (rare), never per admission verdict. Idempotent:
    * already-tombstoned ids are excluded before the decrement, so a
    * replayed erasure batch subtracts nothing twice. */
  def delete(docIds: DataFrame, indexDir: String): Unit = {
    val s = docIds.sparkSession
    val tombs = new org.apache.hadoop.fs.Path(s"$indexDir/tombstones")
    val fs = tombs.getFileSystem(s.sparkContext.hadoopConfiguration)
    val requested = docIds.select(col("doc_id").cast("long").as("doc_id")).distinct()
    val fresh =
      (if (fs.exists(tombs))
         requested.join(broadcast(s.read.parquet(tombs.toString)), Seq("doc_id"), "left_anti")
       else requested).localCheckpoint()
    if (fresh.isEmpty) return
    val dead = s.read
      .schema(rowSchema)
      .parquet(s"$indexDir/rows")
      .join(broadcast(fresh), Seq("doc_id"))
    val seg = 1 + listSegments(s, indexDir).max
    dfSegment(dead)
      .withColumn("df", -col("df"))
      .write
      .mode("errorifexists")
      .parquet(s"$indexDir/df/seg=$seg")
    fresh.write.mode("append").parquet(tombs.toString)
  }

  /** Full maintenance compaction: fold erasure tombstones out of the
    * row layout (checked staged swap — InvertedIndex.compact's
    * discipline) and rebuild the df table from the SURVIVING rows
    * (fresh seg=0 replacing every segment, positive and negative — a
    * recompute cannot drift). Ordering is crash-safe: the staged rows
    * are written and become the df recompute's source BEFORE any swap,
    * and a crash between the two swaps leaves old df segments whose
    * negative entries still net to the survivors' counts. Replay is
    * idempotent. Without tombstones this degrades to [[compactDf]]. */
  def compact(s: SparkSession, indexDir: String): Unit = {
    import org.apache.hadoop.fs.Path
    val tombs = new Path(s"$indexDir/tombstones")
    val fs = tombs.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(tombs)) { compactDf(s, indexDir); return }
    val stagedRows = new Path(s"$indexDir/rows_compacted")
    liveRows(s, indexDir)
      .repartition(col("bkt"))
      .write
      .mode("overwrite")
      .partitionBy("bkt")
      .parquet(stagedRows.toString)
    val stagedDf = new Path(s"$indexDir/df_compacted")
    dfSegment(s.read.schema(rowSchema).parquet(stagedRows.toString))
      .write
      .mode("overwrite")
      .parquet(s"$stagedDf/seg=0")
    val liveR = new Path(s"$indexDir/rows")
    if (!fs.delete(liveR, /* recursive = */ true))
      throw new java.io.IOException(s"compact: failed to remove old rows $liveR")
    if (!fs.rename(stagedRows, liveR))
      throw new java.io.IOException(s"compact: failed to swap $stagedRows — staged rows preserved")
    val liveD = new Path(s"$indexDir/df")
    if (!fs.delete(liveD, /* recursive = */ true))
      throw new java.io.IOException(s"compact: failed to remove old df $liveD")
    if (!fs.rename(stagedDf, liveD))
      throw new java.io.IOException(s"compact: failed to swap $stagedDf — staged df preserved")
    if (!fs.delete(tombs, /* recursive = */ true))
      throw new java.io.IOException(s"compact: failed to clear tombstone table $tombs")
  }

  /** Fold the df segments into one — bounded segment fan-in under
    * sustained appends. Checked staged-rewrite swap: a failed
    * delete/rename throws with the staged directory intact. */
  def compactDf(s: SparkSession, indexDir: String): Unit = {
    import org.apache.hadoop.fs.Path
    val live = new Path(s"$indexDir/df")
    val fs = live.getFileSystem(s.sparkContext.hadoopConfiguration)
    val staged = new Path(s"$indexDir/df_compacted")
    dfTable(s, indexDir).write.mode("overwrite").parquet(s"$staged/seg=0")
    if (!fs.delete(live, /* recursive = */ true))
      throw new java.io.IOException(s"compactDf: failed to remove $live")
    if (!fs.rename(staged, live))
      throw new java.io.IOException(
        s"compactDf: failed to swap $staged into place — staged rewrite preserved"
      )
  }

  /** Admission verdicts for `newDocs` against the indexed corpus —
    * bit-equal to the from-scratch `admissionPairs(indexedDocs,
    * newDocs, minJaccard)` recompute (the df ∈ [2, 50] rare rule runs
    * over the UNION of index and batch, exactly as the recompute
    * defines it), but the indexed side reads persisted shingle rows
    * and summed df segments instead of re-exploding document text.
    * Per-verdict cost: one batch shingling + a vocabulary-keyed df
    * merge + a rare-restricted equi-join — nothing re-shingles the
    * corpus.
    */
  def admit(
      s: SparkSession,
      indexDir: String,
      newDocs: DataFrame,
      minJaccard: Double
  ): DataFrame = {
    val batchRows = shingleRows(newDocs).localCheckpoint()
    val batchDf = dfSegment(batchRows).withColumnRenamed("df", "df_new")
    val rare = dfTable(s, indexDir)
      .join(batchDf, Seq("g"), "full_outer")
      .withColumn("df_union", coalesce(col("df"), lit(0L)) + coalesce(col("df_new"), lit(0L)))
      .filter(col("df_union") >= 2 && col("df_union") <= 50)
      .select("g")
      // feeds both join sides and both size tables — materialize once
      .localCheckpoint()
    val idxRare = liveRows(s, indexDir).join(rare, Seq("g")).localCheckpoint()
    val newRare = batchRows.join(rare, Seq("g")).localCheckpoint()
    val szOld = idxRare.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val szNew = newRare.groupBy("doc_id").agg(count(lit(1)).as("n"))
    newRare
      .select(col("doc_id").as("d_new"), col("g"))
      .join(idxRare.select(col("doc_id").as("d_old"), col("g")), Seq("g"))
      .groupBy("d_new", "d_old")
      .agg(count(lit(1)).as("shared"))
      .join(szNew.as("s1"), col("d_new") === col("s1.doc_id"))
      .join(szOld.as("s2"), col("d_old") === col("s2.doc_id"))
      .select(
        col("d_new"),
        col("d_old"),
        (col("shared").cast("double") / (col("s1.n") + col("s2.n") - col("shared")))
          .as("jaccard")
      )
      .filter(col("jaccard") >= minJaccard)
      .orderBy("d_new", "d_old")
  }

  /** Driver-side twin of the row bucket (mirrors InvertedIndex). */
  private[graft] def bucketOf(g: String): Int = {
    val h = MessageDigest.getInstance("MD5").digest(g.getBytes("UTF-8"))
    HexDigits.indexOf(HexDigits((h(0) & 0xf0) >> 4))
  }
}
