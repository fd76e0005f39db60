package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained aggregate VIEW over a versioned table's
  * change feed — the O(delta) consumer the feed
  * ([[TableVersions.changesFeed]]) exists for.
  *
  * The view is itself a [[TableVersions]] table holding one row per
  * group — `(k, n_rows, sum_val)` — plus ONE reserved cursor row
  * (`k = "__cursor"`, `n_rows` = the last source version folded in).
  * Each [[sync]] reads the feed window `(cursor, head]` (cost: the
  * window's CHANGED rows — never a table scan of the source), turns
  * the events into per-group retractable deltas (+1 for
  * insert/update_postimage, −1 for delete/update_preimage; the summed
  * column weighted the same way), and upserts ONLY the touched groups
  * together with the advanced cursor row in ONE merge commit. Storing
  * the cursor inside the same commit as the deltas makes the fold
  * atomic: a crash either leaves both or neither, so a restarted
  * consumer can never double-apply or skip a window — the recovery
  * property a side-channel cursor file cannot give without a
  * two-phase protocol.
  *
  * At 100 TB this is the shape of every derived aggregate (dashboard
  * rollups, per-source token budgets, freshness counters): the state
  * table is GROUPS-scaled, each sync is CHANGES-scaled, and the full
  * re-aggregation ([[TableVersions]] read + groupBy) is only ever the
  * correctness reference, not the steady-state cost. Groups whose
  * count retracts to zero stay as tombstone rows in the state table
  * (a merge upsert cannot delete) and are filtered by [[read]] — the
  * state table is bounded by DISTINCT-groups-ever, which for
  * categorical group keys is the same order as live groups.
  *
  * Not defined across a RESTORE of the source — `changesFeed` refuses
  * such windows loudly (a metadata-only rollback has no O(changes)
  * event form); re-initialize the view instead.
  */
object FeedView {

  /** Reserved group key carrying the sync cursor. */
  val CursorKey = "__cursor"

  /** Initialize the view table from the source's CURRENT head — one
    * full aggregation (the only table-scan this view ever pays) — and
    * set the cursor to that head. Returns the captured source version.
    */
  def init(
      s: SparkSession,
      srcDir: String,
      viewDir: String,
      groupCol: String,
      sumCol: String
  ): Long = {
    val head = TableVersions.currentVersion(s, srcDir)
    require(head >= 0, s"$srcDir not initialized")
    val state = TableVersions
      .readVersion(s, srcDir, head)
      .groupBy(col(groupCol).cast("string").as("k"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(coalesce(col(sumCol).cast("long"), lit(0L))).as("sum_val")
      )
      .unionByName(cursorRow(s, head))
    // groups-scaled state: one file is the right physical shape
    TableVersions.commitAppend(state.coalesce(1), viewDir)
    head
  }

  /** Fold the feed window `(cursor, head]` into the view as ONE merge
    * commit (touched groups + the advanced cursor row). No-op when the
    * source has not moved. Returns the new cursor. */
  def sync(
      s: SparkSession,
      srcDir: String,
      viewDir: String,
      groupCol: String,
      sumCol: String
  ): Long = {
    // safeHead, not currentVersion: under concurrent appends the head
    // can run ahead of an in-flight lower-versioned commit — syncing
    // past it would miss its changes forever once it lands
    val head = TableVersions.safeHead(s, srcDir)
    val cur = cursor(s, viewDir)
    if (head <= cur) return cur
    foldEvents(s, viewDir, TableVersions.changesFeed(s, srcDir, cur, head), groupCol, sumCol, head)
  }

  /** Fold a frame of FEED EVENTS (rows carrying `_change_type` and
    * `_commit_version` — a [[TableVersions.changesFeed]] window, or a
    * micro-batch from the [[graft.streaming.CdfSourceProvider]]
    * streaming source) into the view as ONE merge commit. IDEMPOTENT
    * under replay: events at or below the view's cursor are filtered
    * out first, so an at-least-once delivery (foreachBatch re-running
    * a batch after a post-commit failure) re-applies nothing — the
    * cursor travels INSIDE the same commit as the deltas, which is
    * what makes the filter and the fold atomic. `newCursor` must be
    * the version the event frame reaches (its max `_commit_version`,
    * or the window's end). Returns the resulting cursor. */
  def foldEvents(
      s: SparkSession,
      viewDir: String,
      events: DataFrame,
      groupCol: String,
      sumCol: String,
      newCursor: Long
  ): Long = {
    val cur = cursor(s, viewDir)
    if (newCursor <= cur) return cur // whole frame already folded (replay)
    val fresh = events.filter(col("_commit_version") > cur)
    // retractable-aggregate weights: an event either contributes a row
    // (+1) or takes one back (−1); an update is a −pre +post pair, so
    // a group change moves mass between groups and an in-group value
    // change nets to the value delta
    val w = when(col("_change_type").isin("insert", "update_postimage"), 1L)
      .when(col("_change_type").isin("delete", "update_preimage"), -1L)
    val deltas = fresh
      .select(
        col(groupCol).cast("string").as("k"),
        w.as("w"),
        coalesce(col(sumCol).cast("long"), lit(0L)).as("x")
      )
      .groupBy("k")
      .agg(sum(col("w")).as("d_n"), sum(col("w") * col("x")).as("d_sum"))
    val viewHead = TableVersions
      .readVersion(s, viewDir, TableVersions.currentVersion(s, viewDir))
      .filter(col("k") =!= CursorKey)
    // merge source = touched groups ONLY (plus the cursor row) — the
    // untouched groups ride through on the merge's keep side, so the
    // commit rewrites group-scaled state proportional to the window
    val touched = deltas
      .join(viewHead, Seq("k"), "left_outer")
      .select(
        col("k"),
        (coalesce(col("n_rows"), lit(0L)) + col("d_n")).as("n_rows"),
        (coalesce(col("sum_val"), lit(0L)) + col("d_sum")).as("sum_val")
      )
    TableVersions.commitMerge(touched.unionByName(cursorRow(s, newCursor)), viewDir, "k")
    newCursor
  }

  /** The last source version folded into the view. */
  def cursor(s: SparkSession, viewDir: String): Long = {
    val v = TableVersions.currentVersion(s, viewDir)
    require(v >= 0, s"view $viewDir not initialized")
    TableVersions
      .readVersion(s, viewDir, v)
      .filter(col("k") === CursorKey)
      .select("n_rows")
      .head()
      .getLong(0)
  }

  /** The view's groups — cursor row and zero-count tombstones
    * filtered out. */
  def read(s: SparkSession, viewDir: String): DataFrame =
    TableVersions
      .readVersion(s, viewDir, TableVersions.currentVersion(s, viewDir))
      .filter(col("k") =!= CursorKey && col("n_rows") > 0)
      .select("k", "n_rows", "sum_val")

  private def cursorRow(s: SparkSession, head: Long): DataFrame = {
    import s.implicits._
    Seq((CursorKey, head, 0L)).toDF("k", "n_rows", "sum_val")
  }
}
