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

  /** Range-partition + sort + pin; returns the staged frame with
    * `__pid`/`__loc` derived from the materialized row ids, and the
    * per-partition row counts in pid order. */
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

  /** Broadcast the prefix offsets back as one literal expression
    * (P-branch CASE — codegen-friendly, no join, no second shuffle). */
  private def offsetExpr(counts: Seq[(Int, Long)]): Column = {
    var acc = 0L
    val offs = counts.map { case (pid, c) => val o = (pid, acc); acc += c; o }
    offs.foldLeft(lit(0L)) { case (e, (pid, off)) =>
      when(col("__pid") === pid, lit(off)).otherwise(e)
    }
  }

  /** Exact global `row_number()` over a TOTAL order (the caller must
    * include a unique tiebreak column), as column `out` (1-based,
    * LongType). No window operator anywhere in the plan. */
  def rowNumber(df: DataFrame, order: Seq[Column], out: String, nPart: Int = 32): Ranked = {
    val (staged, counts) = stage(df, order, nPart)
    val ranked = staged
      .withColumn(out, col("__loc") + offsetExpr(counts) + 1L)
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
      nPart: Int = 32
  ): Ranked = {
    val staged0 = df.withColumn("__v", value.cast("long"))
    val (staged, _) = stage(staged0, order, nPart)
    val sums = staged
      .groupBy(col("__pid"))
      .agg(count(lit(1)).as("__c"), sum(col("__v")).as("__s"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
      .toSeq
    var acc = 0L
    val offs = sums.map { case (pid, _, sv) => val o = (pid, acc); acc += sv; o }
    val offCol = offs.foldLeft(lit(0L)) { case (e, (pid, off)) =>
      when(col("__pid") === pid, lit(off)).otherwise(e)
    }
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
