package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained JOIN view over TWO versioned tables'
  * change feeds — the delta-join form of incremental view maintenance
  * (Blakeley et al. 1986; the shape every streaming SQL engine's
  * materialized join uses), built on [[TableVersions.changesFeed]]
  * and time travel.
  *
  * The view is `V = A ⋈ₖ B` materialized as a [[TableVersions]] table
  * of one row per DISTINCT JOINED ROW CONTENT plus a multiplicity —
  * `(rk, k, a-cols…, b-cols…, mult)`, `rk` = md5 fingerprint of the
  * content columns — plus two reserved cursor rows (`rk =
  * "__cursor_a"/"__cursor_b"`, `mult` = the last folded version of
  * that source). Content-keyed multiplicities are what make the view
  * RETRACTABLE under every feed event with no per-side state: an
  * update of a B row arrives as a −1 on the joined rows carrying the
  * OLD payload and a +1 on the rows carrying the NEW payload, so the
  * old content tombstones to zero and the new content appears —
  * nothing has to diff payloads or key into "the" joined row.
  *
  * Each [[sync]] folds both feed windows in ONE merge commit using
  * the exact two-term delta (no ΔA⋈ΔB term):
  *
  *   V(ha,hb) − V(ca,cb) = ΔA(ca,ha] ⋈ B@hb  +  A@ca ⋈ ΔB(cb,hb]
  *
  * (expand (A+ΔA)⋈(B+ΔB): folding ΔA against the NEW B head absorbs
  * the cross term, so ΔB must join the OLD A snapshot — which time
  * travel provides exactly). Both joins are delta × table; a
  * micro-batch-sized delta broadcasts, a backfill-sized window falls
  * back to a co-partitioned sort-merge join ([[deltaJoin]] — the
  * build side is never driver-memory-bound). The table sides are
  * version-store reads that inherit the store's pruning. Cursors
  * live INSIDE the same merge
  * commit as the deltas, so a crashed sync leaves both-or-neither —
  * a restarted consumer can never double-apply or skip a window
  * (same atomic-fold contract as [[FeedView]]).
  *
  * At 100 TB: the state table is JOINED-ROWS-scaled, each sync is
  * CHANGES × MATCHED-scaled, and the full re-join is only the
  * correctness reference. Zero-mult tombstones are retained (merge
  * upserts cannot delete) and filtered by [[read]]. Not defined
  * across a RESTORE of either source — `changesFeed` refuses such
  * windows loudly; re-initialize the view instead.
  */
object JoinView {

  /** Reserved fingerprint keys carrying the two sync cursors. */
  val CursorA = "__cursor_a"
  val CursorB = "__cursor_b"

  private def fp(cols: Seq[String]): Column =
    md5(to_json(struct(cols.map(col): _*)))

  /** Event → signed multiplicity weight (same retraction algebra as
    * [[FeedView.sync]]). */
  private val weight: Column =
    when(col("_change_type").isin("insert", "update_postimage"), 1L)
      .when(col("_change_type").isin("delete", "update_preimage"), -1L)

  /** Initialize the view from both sources' CURRENT heads — the one
    * full join this view ever pays — and pin both cursors to those
    * heads. Returns (versionA, versionB) captured. */
  def init(
      s: SparkSession,
      aDir: String,
      bDir: String,
      viewDir: String,
      joinCol: String,
      aCols: Seq[String],
      bCols: Seq[String]
  ): (Long, Long) = {
    val ha = TableVersions.currentVersion(s, aDir)
    val hb = TableVersions.currentVersion(s, bDir)
    require(ha >= 0, s"$aDir not initialized")
    require(hb >= 0, s"$bDir not initialized")
    val out = joinCol +: (aCols ++ bCols)
    val joined = TableVersions
      .readVersion(s, aDir, ha)
      .select((joinCol +: aCols).map(col): _*)
      .join(
        TableVersions.readVersion(s, bDir, hb).select((joinCol +: bCols).map(col): _*),
        Seq(joinCol)
      )
      .groupBy(out.map(col): _*)
      .agg(count(lit(1)).as("mult"))
    val state = joined.select(fp(out).as("rk") +: (out :+ "mult").map(col): _*)
    TableVersions.commitAppend(
      state.unionByName(cursorRows(s, state, ha, hb)).coalesce(1),
      viewDir
    )
    (ha, hb)
  }

  /** Fold both feed windows `(cursorA, headA] × (cursorB, headB]`
    * into the view as ONE merge commit. No-op when neither source has
    * moved. Returns the new (cursorA, cursorB). */
  /** Delta × snapshot join in the right REGIME for the window's size:
    * a micro-batch-sized delta broadcasts (map-side join, the snapshot
    * side never shuffles); a backfill-sized delta would OOM the build
    * side, so it falls back to a co-partitioned sort-merge join — both
    * sides exchange on the join key, change-scaled × matched-scaled,
    * never driver-memory-bound. The regime gate is an exact count of
    * the delta, already materialized (localCheckpoint) so the count
    * and the join share one computation — the same
    * broadcast-vs-partitioned split q204 registers for triangles. */
  private def deltaJoin(
      delta: DataFrame,
      snap: DataFrame,
      joinCol: String,
      broadcastMaxRows: Long
  ): DataFrame = {
    val d = delta.localCheckpoint()
    if (d.count() <= broadcastMaxRows) broadcast(d).join(snap, Seq(joinCol))
    else d.hint("merge").join(snap, Seq(joinCol))
  }

  def sync(
      s: SparkSession,
      aDir: String,
      bDir: String,
      viewDir: String,
      joinCol: String,
      aCols: Seq[String],
      bCols: Seq[String],
      broadcastMaxRows: Long = 100000L
  ): (Long, Long) = {
    // safeHead, not currentVersion: under concurrent appends a head
    // can run ahead of an in-flight lower-versioned commit (see
    // FeedView.sync)
    val ha = TableVersions.safeHead(s, aDir)
    val hb = TableVersions.safeHead(s, bDir)
    val (ca, cb) = cursors(s, viewDir)
    if (ha <= ca && hb <= cb) return (ca, cb)
    val out = joinCol +: (aCols ++ bCols)

    // ΔA ⋈ B@hb — the delta side is the window's changes; regime
    // (broadcast vs co-partitioned SMJ) picked by the window's size
    val dVa: Option[DataFrame] =
      if (ha <= ca) None
      else {
        val dA = TableVersions
          .changesFeed(s, aDir, ca, ha)
          .select((joinCol +: aCols).map(col) :+ weight.as("__ivm_w"): _*)
        val bNew = TableVersions
          .readVersion(s, bDir, hb)
          .select((joinCol +: bCols).map(col): _*)
        Some(deltaJoin(dA, bNew, joinCol, broadcastMaxRows))
      }
    // A@ca ⋈ ΔB — ΔB joins the OLD A snapshot (time travel), which is
    // what cancels the ΔA⋈ΔB cross term
    val dVb: Option[DataFrame] =
      if (hb <= cb) None
      else {
        val dB = TableVersions
          .changesFeed(s, bDir, cb, hb)
          .select((joinCol +: bCols).map(col) :+ weight.as("__ivm_w"): _*)
        val aOld = TableVersions
          .readVersion(s, aDir, ca)
          .select((joinCol +: aCols).map(col): _*)
        Some(deltaJoin(dB, aOld, joinCol, broadcastMaxRows))
      }
    // MATERIALIZED once (change-scaled, cheap): commitMerge evaluates
    // its source several times (duplicate-key check, constraint check,
    // hit resolution, change feed, batch write) — pinning the netted
    // deltas makes every evaluation read the same blocks instead of
    // re-running the two delta joins per pass, and guards the
    // retraction algebra against any evaluation-order variance in the
    // un-materialized two-join + union + aggregate subtree (observed
    // under the forced-SMJ regime inside the merge's composite plans:
    // a +1/−1 pair for one content key escaped un-netted;
    // JoinViewRegimeSpec pins the fix)
    val deltas = (dVa.toSeq ++ dVb.toSeq)
      .map(_.select(out.map(col) :+ col("__ivm_w"): _*))
      .reduce(_ unionByName _)
      .groupBy(out.map(col): _*)
      .agg(sum(col("__ivm_w")).as("d"))
      .filter(col("d") =!= 0)
      .localCheckpoint()

    val head = TableVersions.currentVersion(s, viewDir)
    val state = TableVersions
      .readVersion(s, viewDir, head)
      .filter(!col("rk").isin(CursorA, CursorB))
      .select("rk", "mult")
    // merge source = touched contents ONLY + the two cursor rows; the
    // untouched rows ride through on the merge's keep side
    val touched = deltas
      .withColumn("rk", fp(out))
      .join(state, Seq("rk"), "left_outer")
      .select(
        col("rk") +: out.map(col) :+
          (coalesce(col("mult"), lit(0L)) + col("d")).as("mult"): _*
      )
    TableVersions.commitMerge(
      touched.unionByName(cursorRows(s, touched, ha, hb)),
      viewDir,
      "rk"
    )
    (ha, hb)
  }

  /** The last (versionA, versionB) folded into the view. */
  def cursors(s: SparkSession, viewDir: String): (Long, Long) = {
    val v = TableVersions.currentVersion(s, viewDir)
    require(v >= 0, s"view $viewDir not initialized")
    val rows = TableVersions
      .readVersion(s, viewDir, v)
      .filter(col("rk").isin(CursorA, CursorB))
      .select("rk", "mult")
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    (rows(CursorA), rows(CursorB))
  }

  /** The view's joined rows — cursors and zero-mult tombstones
    * filtered out. */
  def read(s: SparkSession, viewDir: String): DataFrame =
    TableVersions
      .readVersion(
        s,
        viewDir,
        TableVersions.currentVersion(s, viewDir)
      )
      .filter(!col("rk").isin(CursorA, CursorB) && col("mult") > 0)
      .drop("rk")

  /** Two cursor rows in the state schema (payload columns NULL of the
    * right type, taken from `template`). */
  private def cursorRows(
      s: SparkSession,
      template: DataFrame,
      va: Long,
      vb: Long
  ): DataFrame = {
    val payload = template.schema.fields.filter(f => f.name != "rk" && f.name != "mult")
    def mk(rk: String, v: Long): DataFrame =
      s.range(1)
        .select(
          lit(rk).as("rk") +:
            payload.map(f => lit(null).cast(f.dataType).as(f.name)) :+
            lit(v).as("mult"): _*
        )
    mk(CursorA, va).unionByName(mk(CursorB, vb))
  }
}
