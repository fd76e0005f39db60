package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact GLOBAL ranking without a single-partition sort — the
  * distributed primitive behind every "rank all N rows" statistic
  * (quantile scores, Gini, Mann-Whitney, percentile bucketing).
  *
  * `row_number().over(Window.orderBy(...))` with no partitionBy is the
  * canonical scale-killer: Spark moves EVERY row into one partition
  * and sorts it in one task. The exact same ranks fall out of the
  * classic two-pass shape (TeraSort's histogram discipline applied to
  * ranking):
  *
  *   1. `repartitionByRange(order)` — range-partition on the FULL sort
  *      key, so partition p holds a contiguous key range and every key
  *      in partition p sorts before every key in partition p+1;
  *   2. sort WITHIN partitions (parallel, spill-safe);
  *   3. count rows per partition — P numbers, a metadata-sized
  *      aggregate — and prefix-sum them on the driver;
  *   4. global rank = partition's prefix offset + local position.
  *
  * The local position comes from `monotonically_increasing_id()`
  * (pid·2³³ + row index, assigned in partition row order — i.e. in
  * sorted order after step 2), so the rank pass needs NO window at
  * all; [[prefixSumExclusive]] needs one window PARTITIONED by pid
  * (parallel across partitions by construction). The staged frame is
  * `localCheckpoint`ed once: the id assignment is nondeterministic
  * across recomputations, so the count job and the rank job must read
  * ONE pinned materialization (the frames ranked here are rollups —
  * user- or group-scaled — which is also why pinning them is cheap
  * relative to recomputing the rollup).
  *
  * At 100 TB: both passes are fully parallel; the only driver-side
  * state is P partition counts. Range boundaries come from Spark's
  * sampling RangePartitioner — ties on the leading key spread across
  * partitions via the caller-supplied tiebreak columns, so a skewed
  * value (a million zero-spend users) cannot recreate the one-task
  * sort this operator exists to kill. The order MUST therefore be
  * total (include a unique tiebreak column); ranks over a non-total
  * order are computed by ranking the distinct value GROUPS instead
  * (group rows, rank groups, join back — see q294).
  */
object DistributedRank {

  /** A ranked frame plus its total row count (the count falls out of
    * the offset pass for free; every quantile-score consumer needs it). */
  final case class Ranked(df: DataFrame, total: Long)

  private val PidShift = 33
  private val LocalMask = (1L << PidShift) - 1

  /** Partition count derived from the input's optimizer statistics
    * when the caller doesn't pin one: enough range partitions that
    * each holds ~64 MB (the shuffle-partition sizing discipline),
    * never fewer than the session's shuffle parallelism. A fixed 32
    * was right for the rollup-scaled frames ranked today but is the
    * wrong shape for a fact-scaled rank at 100 TB — there the count
    * must grow with the data, and it does: stats flow from the scan
    * (file sizes) through the plan. Capped at 2²⁰ partitions (a 64 TB
    * single-column rank) to bound the offset array. */
  private def autoParts(df: DataFrame): Int = {
    val conf = df.sparkSession.sessionState.conf
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val byBytes = (bytes / (64L * 1024 * 1024)).min(BigInt(1 << 20)).toInt + 1
    math.max(conf.numShufflePartitions, byBytes)
  }

  /** Range-partition + sort + pin; returns the staged frame with
    * `__pid`/`__loc` derived from the materialized row ids, and the
    * per-partition row counts in pid order.
    *
    * Pinning is `localCheckpoint` — executor-storage blocks, the right
    * cost for the rollup-scaled frames ranked today. For a FACT-scaled
    * rank on a real cluster, prefer a reliable checkpoint
    * (`spark.sparkContext.setCheckpointDir` + `.checkpoint()`): a lost
    * executor under localCheckpoint kills the job, and at 100 TB the
    * pinned blocks compete with shuffle storage. The two-pass rank
    * itself is checkpoint-strategy agnostic — only this pin changes. */
  private def stage(df: DataFrame, order: Seq[Column], nPart: Int): (DataFrame, Seq[(Int, Long)]) = {
    val staged = df
      .repartitionByRange(nPart, order: _*)
      .sortWithinPartitions(order: _*)
      .withColumn("__mid", monotonically_increasing_id())
      .localCheckpoint()
      .withColumn("__pid", shiftright(col("__mid"), PidShift).cast("int"))
      .withColumn("__loc", col("__mid").bitwiseAND(lit(LocalMask)))
    val counts = staged
      .groupBy(col("__pid"))
      .agg(count(lit(1)).as("__c"))
      .collect() // P rows — metadata-scale, never data-scale
      .map(r => (r.getInt(0), r.getLong(1)))
      .sortBy(_._1)
      .toSeq
    (staged, counts)
  }

  /** Broadcast the prefix offsets back as ONE array literal indexed by
    * `__pid` — O(1) to evaluate and O(P) in the expression tree, where
    * the P-branch nested CASE this replaced was O(P) deep PER ROW and
    * would blow the tree (and Janino) at the thousands of range
    * partitions a fact-scaled rank needs. Gaps (empty range
    * partitions produce no rows but still consume a pid) carry the
    * running offset so the array indexes densely by pid. */
  private def offsetExpr(offsetsByPid: Array[Long]): Column =
    element_at(lit(offsetsByPid), col("__pid") + 1)

  /** Dense pid-indexed exclusive prefix offsets from sparse per-pid
    * totals (pids with no rows never appear in `totals`). */
  private def prefixOffsets(totals: Seq[(Int, Long)]): Array[Long] = {
    if (totals.isEmpty) return Array(0L) // empty input: no rows ever index it
    val maxPid = totals.map(_._1).max
    val byPid = totals.toMap
    val offs = new Array[Long](maxPid + 1)
    var acc = 0L
    var pid = 0
    while (pid <= maxPid) {
      offs(pid) = acc
      acc += byPid.getOrElse(pid, 0L)
      pid += 1
    }
    offs
  }

  /** Exact global `row_number()` over a TOTAL order (the caller must
    * include a unique tiebreak column), as column `out` (1-based,
    * LongType). No window operator anywhere in the plan. `nPart <= 0`
    * (the default) derives the partition count from the input's size
    * statistics — see [[autoParts]]. */
  def rowNumber(df: DataFrame, order: Seq[Column], out: String, nPart: Int = 0): Ranked = {
    val parts = if (nPart > 0) nPart else autoParts(df)
    val (staged, counts) = stage(df, order, parts)
    val ranked = staged
      .withColumn(out, col("__loc") + offsetExpr(prefixOffsets(counts)) + 1L)
      .drop("__mid", "__pid", "__loc")
    Ranked(ranked, counts.map(_._2).sum)
  }

  /** Exact global EXCLUSIVE running sum of `value` in `order` (the sum
    * of all strictly-preceding rows; 0 for the first row), as column
    * `out`. Same two-pass shape; the within-partition running sum is a
    * window PARTITIONED by the range-partition id — parallel across
    * partitions, never a global sort. `value` must be integral
    * (LongType accumulation; widen upstream if Σ can exceed 2⁶³). */
  def prefixSumExclusive(
      df: DataFrame,
      order: Seq[Column],
      value: Column,
      out: String,
      nPart: Int = 0
  ): Ranked = {
    // NULL values contribute 0 — made explicit with a coalesce rather
    // than left to sum()'s null-skipping, which would also leave an
    // all-NULL partition's total NULL and NPE the driver-side getLong
    val staged0 = df.withColumn("__v", coalesce(value.cast("long"), lit(0L)))
    val parts = if (nPart > 0) nPart else autoParts(staged0)
    val (staged, _) = stage(staged0, order, parts)
    val sums = staged
      .groupBy(col("__pid"))
      .agg(count(lit(1)).as("__c"), sum(col("__v")).as("__s"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
      .toSeq
    val offCol = offsetExpr(prefixOffsets(sums.map(t => (t._1, t._3))))
    val w = Window
      .partitionBy(col("__pid"))
      .orderBy(col("__loc"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = staged
      .withColumn(out, offCol + coalesce(sum(col("__v")).over(w), lit(0L)))
      .drop("__mid", "__pid", "__loc", "__v")
    Ranked(ranked, sums.map(_._2).sum)
  }
}
