package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructField, StructType}

/** Time-travel-CONSISTENT inverted index over a [[TableVersions]]
  * table — the missing half of secondary-index consistency: the store
  * can serve any retained version (`readVersion`), but
  * [[InvertedIndex]] only answers "now". This index answers keyword
  * queries AS OF any synced source version, with the same
  * applicability rule the store's deletion vectors use.
  *
  * Layout under `idxDir`:
  *   - `seg/v<H>/bkt=N/...` — postings `(tok, doc_id, tf, added_v)`
  *     written by the sync that reached source head H; `added_v` is
  *     the posting's COMMIT version (a multi-commit window writes one
  *     segment holding several `added_v` values). Same 16-way md5
  *     term bucketing and tok-sorted row groups as [[InvertedIndex]].
  *   - `tomb/v<H>/…` — `(doc_id, v)` tombstones from the window's
  *     delete/update_preimage events at their commit versions.
  *   - `floor/v<F>/` — marker: versions below F are not answerable
  *     (init version, raised by [[compact]]).
  *   - `done/v<H>/` — COMMIT MARKER, written only after BOTH the
  *     window's segment and tombstone directories have landed. The
  *     cursor is the max done marker — never the seg/tomb listing,
  *     which a crashed sync can leave half-written: deriving the
  *     cursor from `seg` alone would make a crash between the segment
  *     and tombstone writes look complete, the replayed sync would
  *     no-op, and the window's deletions would be lost forever.
  *     Orphan seg/tomb dirs above the cursor are harmless (every read
  *     filters `added_v`/`v` ≤ the queried version ≤ cursor) and are
  *     overwritten by the replayed sync.
  *
  * Visibility of a posting `(d, added_v)` at version `v`:
  *
  *   added_v ≤ v  ∧  ¬∃ tombstone (d, t) with added_v < t ≤ v
  *
  * — exactly Delta's DV rule (`lastAdd < dv_version ≤ v`), so an
  * update (pre-image tombstone + post-image postings AT THE SAME
  * version) hides the old text and serves the new from that version
  * on, a delete hides from its version on, and a later re-insert is
  * visible again. Syncs consume the change feed (O(window changes),
  * the source is never re-scanned after init) and are IDEMPOTENT: a
  * replayed sync overwrites its own `v<H>` directories rather than
  * appending duplicates — crash-safe without a cursor transaction.
  *
  * At 100 TB: lookups prune to the queried terms' buckets in every
  * segment, the tombstone side stays request-scaled and broadcasts,
  * and [[compact]] bounds segment count by folding history below a
  * new floor (raising the floor is the index's retention contract,
  * the same trade [[TableVersions.vacuum]] makes).
  */
object AsOfIndex {

  private val segSchema = StructType(
    Seq(
      StructField("tok", StringType),
      StructField("doc_id", LongType),
      StructField("tf", LongType),
      StructField("added_v", LongType),
      StructField("bkt", IntegerType)
    )
  )
  private val tombSchema = StructType(
    Seq(StructField("doc_id", LongType), StructField("v", LongType))
  )

  private def fsOf(s: SparkSession, p: String) =
    new Path(p).getFileSystem(s.sparkContext.hadoopConfiguration)

  private def numbered(s: SparkSession, parent: String): Seq[Long] = {
    val fs = fsOf(s, parent)
    val p = new Path(parent)
    if (!fs.exists(p)) Seq.empty
    else
      fs.listStatus(p)
        .toSeq
        .map(_.getPath.getName)
        .filter(_.startsWith("v"))
        .map(_.drop(1).toLong)
        .sorted
  }

  /** The highest source version FULLY folded into the index — the max
    * `done` commit marker, not the seg/tomb listing (see the layout
    * doc: a crashed sync leaves orphan dirs that must not advance the
    * cursor, or its tombstones are lost to the no-op replay). */
  def cursor(s: SparkSession, idxDir: String): Long = {
    val vs = numbered(s, s"$idxDir/done")
    require(vs.nonEmpty, s"index $idxDir not initialized")
    vs.max
  }

  /** Versions below the floor are not answerable (init version;
    * raised by [[compact]]). */
  def floor(s: SparkSession, idxDir: String): Long = {
    val vs = numbered(s, s"$idxDir/floor")
    require(vs.nonEmpty, s"index $idxDir not initialized")
    vs.max
  }

  /** Tokenization parity with [[InvertedIndex]] (whitespace split,
    * empties dropped), carrying the commit version through to the
    * per-(term, doc, version) frequencies. */
  private def postingsAt(rows: DataFrame): DataFrame =
    rows
      .select(col("doc_id"), col("__v").as("added_v"), explode(split(col("text"), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy("tok", "doc_id", "added_v")
      .agg(count(lit(1)).as("tf"))
      .withColumn("bkt", expr("instr('0123456789abcdef', substring(md5(tok), 1, 1)) - 1"))
      .sortWithinPartitions("tok", "doc_id")

  private def writeSeg(df: DataFrame, idxDir: String, h: Long): Unit =
    df.select("tok", "doc_id", "tf", "added_v", "bkt")
      .write
      .mode("overwrite")
      .partitionBy("bkt")
      .parquet(s"$idxDir/seg/v$h")

  private def markFloor(s: SparkSession, idxDir: String, f: Long): Unit =
    fsOf(s, idxDir).mkdirs(new Path(s"$idxDir/floor/v$f")): Unit

  /** Commit marker: the sync that reached `h` wrote BOTH its dirs. */
  private def markDone(s: SparkSession, idxDir: String, h: Long): Unit =
    fsOf(s, idxDir).mkdirs(new Path(s"$idxDir/done/v$h")): Unit

  /** Index the source's current head — the only full-corpus pass.
    * Returns the captured version (also the initial floor). */
  def init(s: SparkSession, srcDir: String, idxDir: String): Long = {
    val v = TableVersions.currentVersion(s, srcDir)
    require(v >= 0, s"$srcDir not initialized")
    val rows = TableVersions
      .readVersion(s, srcDir, v)
      .select(col("doc_id"), col("text"), lit(v).as("__v"))
    writeSeg(postingsAt(rows), idxDir, v)
    markFloor(s, idxDir, v)
    markDone(s, idxDir, v)
    v
  }

  /** Fold the feed window `(cursor, head]` into one new segment +
    * tombstone set. Idempotent (overwrites its own `v<head>` dirs);
    * no-op when the source has not moved. Returns the new cursor. */
  def sync(s: SparkSession, srcDir: String, idxDir: String): Long = {
    val head = TableVersions.safeHead(s, srcDir)
    val cur = cursor(s, idxDir)
    if (head <= cur) return cur
    val feed = TableVersions.changesFeed(s, srcDir, cur, head).localCheckpoint()
    val ins = feed
      .filter(col("_change_type").isin("insert", "update_postimage"))
      .select(col("doc_id"), col("text"), col("_commit_version").as("__v"))
    writeSeg(postingsAt(ins), idxDir, head)
    feed
      .filter(col("_change_type").isin("delete", "update_preimage"))
      .select(col("doc_id"), col("_commit_version").as("v"))
      .distinct()
      .coalesce(1)
      .write
      .mode("overwrite")
      .parquet(s"$idxDir/tomb/v$head")
    // the marker commits the window: a crash before this line leaves
    // the cursor at `cur`, and the replay overwrites both dirs whole
    markDone(s, idxDir, head)
    head
  }

  private def allOf(s: SparkSession, parent: String, schema: StructType): DataFrame =
    numbered(s, parent)
      .map(h => s.read.schema(schema).parquet(s"$parent/v$h"))
      .reduceOption(_ unionByName _)
      .getOrElse(s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema))

  /** Postings visible at `v` (the DV rule), term-pruned BEFORE the
    * tombstone anti-join when `terms` is given. */
  private def visibleAt(
      s: SparkSession,
      idxDir: String,
      v: Long,
      terms: Seq[String]
  ): DataFrame = {
    require(
      v >= floor(s, idxDir),
      s"version $v is below the index floor ${floor(s, idxDir)} (compacted away)"
    )
    require(v <= cursor(s, idxDir), s"version $v not yet synced (cursor ${cursor(s, idxDir)})")
    // loud, not empty: a crash mid-[[compact]] swap can leave no live
    // segment layout — refuse rather than answer from nothing (re-run
    // compact to resume the swap)
    require(
      fsOf(s, idxDir).exists(new Path(s"$idxDir/seg")),
      s"index $idxDir has no segment layout — interrupted compact? re-run compact to recover"
    )
    val pruned =
      if (terms.isEmpty) allOf(s, idxDir + "/seg", segSchema)
      else {
        val bkts = terms.map(InvertedIndex.bucketOf).distinct
        allOf(s, idxDir + "/seg", segSchema)
          .filter(col("bkt").isin(bkts: _*) && col("tok").isin(terms.distinct: _*))
      }
    val p = pruned.filter(col("added_v") <= v)
    val t = allOf(s, idxDir + "/tomb", tombSchema).filter(col("v") <= v).select("doc_id", "v")
    p.join(broadcast(t), p("doc_id") === t("doc_id") && t("v") > p("added_v"), "left_anti")
  }

  /** [[InvertedIndex.conjunctiveQuery]] as of source version `v`. */
  def conjunctiveAsOf(
      s: SparkSession,
      idxDir: String,
      terms: Seq[String],
      v: Long
  ): DataFrame = {
    require(terms.nonEmpty, "empty term list")
    visibleAt(s, idxDir, v, terms)
      .groupBy("doc_id")
      .agg(countDistinct(col("tok")).as("n_terms"), sum("tf").as("score"))
      .filter(col("n_terms") === terms.distinct.size)
      .select(col("doc_id"), col("score"))
  }

  /** [[InvertedIndex.bm25TopK]]'s exact integer scoring as of source
    * version `v`; pass `nDocs` from [[TableVersions.countAt]] (a
    * metadata-only read) so corpus size and postings agree on the
    * version. */
  def bm25AsOf(
      s: SparkSession,
      idxDir: String,
      queries: Seq[(Long, Seq[String])],
      nDocs: Long,
      v: Long,
      topK: Int = 10
  ): DataFrame = {
    require(queries.nonEmpty, "empty query set")
    import s.implicits._
    val terms = queries.flatMap { case (qid, ts) => ts.distinct.map(qid -> _) }
    val qdf = terms.toDF("query_id", "tok")
    val postings = visibleAt(s, idxDir, v, terms.map(_._2).distinct)
    val df = postings.groupBy("tok").agg(count(lit(1)).as("df"))
    postings
      .join(broadcast(df), Seq("tok"))
      .join(broadcast(qdf), Seq("tok"))
      .withColumn("idf_micros", expr(s"(1000000L * ${nDocs}L) DIV df"))
      .withColumn("term_score", expr("(idf_micros * 11L * tf) DIV (5L * tf + 6L)"))
      .groupBy("query_id", "doc_id")
      .agg(sum("term_score").as("score"))
      .groupBy("query_id")
      .agg(expr(s"top_k_structs(struct(-score AS ns, doc_id, score), $topK)").as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .select(
        col("query_id"),
        (col("pos") + 1).cast("long").as("rank"),
        col("col.doc_id"),
        col("col.score")
      )
  }

  /** Fold all history at the current cursor C into one base segment
    * (visible-at-C postings keep their ORIGINAL `added_v`, so every
    * v ≥ C still answers exactly) and raise the floor to C — versions
    * below C become unanswerable, the retention trade. Checked staged
    * swap; tombstones clear last. */
  def compact(s: SparkSession, idxDir: String): Unit = {
    val c = cursor(s, idxDir)
    val fs = fsOf(s, idxDir)
    val staged = new Path(s"$idxDir/seg_compacted")
    val live = new Path(s"$idxDir/seg")
    // resume an interrupted swap: the staged layout is complete iff the
    // live one is gone (the delete below runs only after staging
    // finished), so finishing the rename is the only recovery needed
    if (!fs.exists(live) && fs.exists(staged)) {
      if (!fs.rename(staged, live))
        throw new java.io.IOException(s"compact: failed to resume swap of $staged")
      val leftover = new Path(s"$idxDir/tomb")
      if (fs.exists(leftover)) fs.delete(leftover, /* recursive = */ true): Unit
      return
    }
    // the live layout exists, so any seg_compacted content is a STALE
    // leftover from a compact that crashed mid-staging. It must go
    // ENTIRELY before staging anew: the overwrite below only replaces
    // staged/v<c>, and if syncs advanced the cursor since the crash, a
    // leftover staged/v<oldC> would be renamed into seg NEXT to the
    // fresh base — visibleAt unions all segment dirs, so the duplicate
    // postings would silently inflate tf/df (wrong, not loud)
    if (fs.exists(staged) && !fs.delete(staged, /* recursive = */ true))
      throw new java.io.IOException(s"compact: failed to clear stale staging $staged")
    visibleAt(s, idxDir, c, Seq.empty)
      .repartition(col("bkt"))
      .sortWithinPartitions("tok", "doc_id")
      .select("tok", "doc_id", "tf", "added_v", "bkt")
      .write
      .mode("overwrite")
      .partitionBy("bkt")
      .parquet(s"$staged/v$c")
    // the floor rises BEFORE the layout swap: a crash in the window
    // leaves a too-HIGH floor over the old layout, which refuses
    // below-C queries loudly — the safe failure. Raising it after the
    // swap would invert that: below-C queries accepted but answered
    // from the compacted base, which already dropped postings deleted
    // in (v, C] — silently wrong.
    markFloor(s, idxDir, c)
    if (!fs.delete(live, /* recursive = */ true))
      throw new java.io.IOException(s"compact: failed to remove old layout $live")
    if (!fs.rename(staged, live))
      throw new java.io.IOException(s"compact: failed to swap $staged into place")
    val tombs = new Path(s"$idxDir/tomb")
    if (fs.exists(tombs) && !fs.delete(tombs, /* recursive = */ true))
      throw new java.io.IOException(s"compact: failed to clear tombstones $tombs")
  }
}
