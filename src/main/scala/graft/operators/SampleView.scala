package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Incrementally-maintained per-group inspection SAMPLE over a
  * versioned table's change feed — [[FeedView]] folds the feed into an
  * aggregate; this folds it into a bounded, deterministic row sample.
  *
  * Every corpus pipeline keeps one of these: "k documents per source
  * to eyeball / audit / regression-test against", refreshed as the
  * corpus grows. Done naively it is a full re-sample per refresh (a
  * corpus scan) and — worse — non-reproducible. Here the sample is
  * DETERMINISTIC: a row's rank is `md5(key)`, a group's sample is the
  * `buf` lowest-ranked live rows, and maintenance is a fold over the
  * change feed:
  *
  *   S₀      = bottom-buf(init head)            (per group)
  *   S_{i+1} = bottom-buf((S_i \ deletes_i) ∪ inserts_i)
  *
  * Because md5-rank is a fixed total order, bottom-buf is min-merge
  * associative: batches of pure inserts fold to exactly the
  * from-scratch sample (the KMV argument, over rows instead of
  * hashes). Deletes make the fold history-dependent in one honest
  * way: a row evicted earlier is forgotten and cannot re-enter when a
  * deletion frees its slot, so a heavily-erased group serves fewer
  * than k rows until re-initialized — UNDER-FILL, never a biased
  * refill. That is the right default for a GOVERNED corpus: the
  * erasure workflow (q202/q206) must reach inspection samples too,
  * and a sample that silently resurrects "the next best row it once
  * saw" would retain exactly what erasure was meant to remove.
  *
  * State is a [[TableVersions]] table of (mk, grp, key, h, val, live)
  * rows — live sample members plus live=0 tombstones for evicted and
  * erased members — with the sync cursor riding INSIDE each merge
  * commit ([[FeedView]]'s atomic-fold contract: a crashed sync leaves
  * cursor and state consistent, a restarted consumer can neither
  * double-apply nor skip). Each sync costs O(window changes +
  * buf × touched groups); the source is never re-scanned after init.
  * Updates refresh a member's payload in place (rank depends only on
  * the key, so an update can never move a row in or out of the
  * sample).
  *
  * [[read]] serves the top-k of each group's live members through the
  * rank-filtered window pattern — which the engine's own
  * [[graft.plans.TopKRewrite]] compiles to the bounded-heap operator,
  * so serving is heap-cut end to end.
  */
object SampleView {

  /** Reserved group key carrying the sync cursor (in `live`). */
  val CursorKey = "__cursor"

  private val Cols = Seq("mk", "grp", "key", "h", "val", "live")

  private def rankOf(key: Column): Column = md5(key.cast("string"))

  private def withMk(df: DataFrame): DataFrame =
    df.withColumn("mk", concat(col("grp"), lit("|"), col("key"))).select(Cols.map(col): _*)

  private def bottomBuf(df: DataFrame, buf: Int): DataFrame =
    df.withColumn(
      "__rn",
      row_number().over(Window.partitionBy("grp").orderBy(asc("h"), asc("key")))
    ).filter(col("__rn") <= buf)
      .drop("__rn")

  private def cursorRow(s: SparkSession, head: Long): DataFrame = {
    import s.implicits._
    Seq((CursorKey, CursorKey, "", "", 0L, head)).toDF(Cols: _*)
  }

  private def state(s: SparkSession, viewDir: String): DataFrame =
    TableVersions
      .readVersion(s, viewDir, TableVersions.currentVersion(s, viewDir))
      .filter(col("grp") =!= CursorKey)

  /** Initialize from the source's current head — the only source scan
    * this view ever pays. Returns the captured source version. */
  def init(
      s: SparkSession,
      srcDir: String,
      viewDir: String,
      groupCol: String,
      keyCol: String,
      valCol: String,
      buf: Int
  ): Long = {
    require(buf >= 1, "buf must be positive")
    val head = TableVersions.currentVersion(s, srcDir)
    require(head >= 0, s"$srcDir not initialized")
    val rows = TableVersions
      .readVersion(s, srcDir, head)
      .select(
        col(groupCol).cast("string").as("grp"),
        col(keyCol).cast("string").as("key"),
        rankOf(col(keyCol)).as("h"),
        coalesce(col(valCol).cast("long"), lit(0L)).as("val")
      )
    val sample = bottomBuf(rows, buf).withColumn("live", lit(1L))
    TableVersions.commitAppend(
      withMk(sample).unionByName(cursorRow(s, head)).coalesce(1),
      viewDir
    )
    head
  }

  /** The last source version folded into the view. */
  def cursor(s: SparkSession, viewDir: String): Long = {
    val v = TableVersions.currentVersion(s, viewDir)
    require(v >= 0, s"view $viewDir not initialized")
    TableVersions
      .readVersion(s, viewDir, v)
      .filter(col("grp") === CursorKey)
      .select("live")
      .head()
      .getLong(0)
  }

  /** Fold the feed window `(cursor, head]` into the sample as ONE
    * merge commit. No-op when the source has not moved. Returns the
    * new cursor. */
  def sync(
      s: SparkSession,
      srcDir: String,
      viewDir: String,
      groupCol: String,
      keyCol: String,
      valCol: String,
      buf: Int
  ): Long = {
    val head = TableVersions.safeHead(s, srcDir)
    val cur = cursor(s, viewDir)
    if (head <= cur) return cur
    val feed = TableVersions.changesFeed(s, srcDir, cur, head)
    // per-key LAST state across the window: at one version a key is
    // an insert, a delete, or an update pre+post pair (post wins), so
    // (version, w) is a total order per key and max_by is exact —
    // an insert-then-delete window nets to a delete before the fold
    // ever sees it
    val w = when(col("_change_type").isin("insert", "update_postimage"), 1L).otherwise(0L)
    val last = feed
      .select(
        col(groupCol).cast("string").as("grp"),
        col(keyCol).cast("string").as("key"),
        coalesce(col(valCol).cast("long"), lit(0L)).as("val"),
        col("_commit_version").as("ver"),
        w.as("w")
      )
      .groupBy("grp", "key")
      .agg(max_by(struct(col("w"), col("val")), struct(col("ver"), col("w"))).as("f"))
      .select(col("grp"), col("key"), col("f.w").as("w"), col("f.val").as("val"))
      .localCheckpoint()
    val inserts = last
      .filter(col("w") === 1L)
      .select(col("grp"), col("key"), rankOf(col("key")).as("h"), col("val"))
    val live = state(s, viewDir).filter(col("live") === 1L)
    val touched = last.select("grp").distinct()
    val curT = live.join(touched, Seq("grp"), "left_semi")
    // survivors = current members untouched by any window event;
    // candidates = survivors ∪ final inserts (deleted keys drop out
    // here, updated keys re-enter with their new payload)
    val survivors = curT
      .join(last.select("grp", "key"), Seq("grp", "key"), "left_anti")
      .select("grp", "key", "h", "val")
    val cand = survivors.unionByName(inserts).localCheckpoint()
    val newS = bottomBuf(cand, buf).select("grp", "key").withColumn("__in", lit(1))
    val folded = cand
      .join(newS, Seq("grp", "key"), "left")
      .select(
        col("grp"),
        col("key"),
        col("h"),
        col("val"),
        when(col("__in") === 1, 1L).otherwise(0L).as("live")
      )
    // erased members get explicit tombstones (they are NOT in cand)
    val erased = curT
      .join(last.filter(col("w") === 0L).select("grp", "key"), Seq("grp", "key"), "left_semi")
      .select(col("grp"), col("key"), col("h"), col("val"))
      .withColumn("live", lit(0L))
    TableVersions.commitMerge(
      withMk(folded.unionByName(erased)).unionByName(cursorRow(s, head)),
      viewDir,
      "mk"
    )
    head
  }

  /** The per-group top-k of the live sample: (grp, rn, key, val),
    * rank order (h, key). k ≤ buf; groups that lost erased members
    * may under-fill (see the class doc). */
  def read(s: SparkSession, viewDir: String, k: Int): DataFrame = {
    require(k >= 1, "k must be positive")
    state(s, viewDir)
      .filter(col("live") === 1L)
      .withColumn(
        "rn",
        row_number().over(Window.partitionBy("grp").orderBy(asc("h"), asc("key"))).cast("long")
      )
      .filter(col("rn") <= k)
      .select("grp", "rn", "key", "val")
  }
}
