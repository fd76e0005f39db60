package org.apache.spark.sql.graftshims

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Ascending, SortOrder}
import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
import org.apache.spark.sql.classic.{Dataset, SparkSession}
import org.apache.spark.sql.execution.LogicalRDD

/** Restore a localCheckpoint's partitioning/ordering metadata.
  *
  * `Dataset.localCheckpoint` captures `executedPlan.outputPartitioning`
  * — but under AQE the physical plan is an AdaptiveSparkPlanExec whose
  * partitioning reads as Unknown, so the resulting LogicalRDD CLAIMS
  * nothing even when the rows are perfectly hash-laid-out. Iterative
  * operators that checkpoint a pre-partitioned table (PageRank's
  * degree-annotated edges, ConnectedComponents' symmetrized pairs) then
  * pay a full re-shuffle of the big side on EVERY iteration's join for
  * no physical reason. This helper re-states what the upstream
  * `repartition(n, cols)` (and optional within-partition sort) already
  * made true.
  *
  * CORRECTNESS CONTRACT: the claim is only valid if the checkpointed
  * rows genuinely ARE laid out by `HashPartitioning(cols, n)` — i.e.
  * the DataFrame fed to localCheckpoint ended in
  * `repartition(n, cols…)` with this exact n (explicit n: AQE does not
  * coalesce a user-specified partition count, so the layout is what
  * was asked for), plus `sortWithinPartitions(sortedBy…)` if ordering
  * is claimed. A false claim silently mis-joins. The helper therefore
  * refuses (returns the input unchanged, claiming nothing) unless the
  * plan is exactly a checkpoint's LogicalRDD and every named column
  * resolves.
  */
object PartitionedCheckpoint {

  def retainHashPartitioning(
      ck: DataFrame,
      cols: Seq[String],
      numPartitions: Int,
      sortedBy: Seq[String] = Nil
  ): DataFrame =
    ck.queryExecution.analyzed match {
      case lr: LogicalRDD
          if (cols ++ sortedBy).forall(c => lr.output.exists(_.name == c)) =>
        val attr = (c: String) => lr.output.find(_.name == c).get
        val session = ck.sparkSession.asInstanceOf[SparkSession]
        val updated = LogicalRDD(
          lr.output,
          lr.rdd,
          HashPartitioning(cols.map(attr), numPartitions),
          sortedBy.map(c => SortOrder(attr(c), Ascending)),
          lr.isStreaming,
          lr.stream
        )(session)
        Dataset.ofRows(session, updated)
      case _ => ck
    }
}
