package graft.operators

import org.apache.spark.sql.DataFrame

/** Shared helper for iterative operators that localCheckpoint each
  * round and free the previous round's blocks.
  */
object CheckpointTracking {

  /** Eagerly localCheckpoint `df` and return the checkpoint's backing
    * persisted-RDD ids, read from the checkpointed plan itself (the
    * LogicalRDD leaf). The ids MUST come from the plan, not from
    * diffing `sc.getPersistentRDDs` around the call: a registry diff
    * claims any RDD a concurrent query happened to persist in the
    * window and would later unpersist it out from under that query —
    * fatal for a localCheckpoint, whose truncated lineage cannot be
    * recomputed.
    */
  def checkpointTracked(df: DataFrame): (DataFrame, Set[Int]) = {
    val out = df.localCheckpoint()
    val ids = out.queryExecution.analyzed
      .collect { case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.id }
      .toSet
    (out, ids)
  }

  /** Unpersist the blocks recorded by [[checkpointTracked]]. */
  def free(df: DataFrame, ids: Set[Int]): Unit = {
    val sc = df.sparkSession.sparkContext
    ids.foreach(id => sc.getPersistentRDDs.get(id).foreach(_.unpersist(false)))
  }

  /** Checkpoint `df` hash-partitioned (and optionally sorted) on
    * `cols`, KEEPING that layout visible to the planner.
    *
    * A naked localCheckpoint under AQE claims UnknownPartitioning even
    * when the rows are perfectly laid out (the adaptive physical plan
    * hides its final partitioning), so every downstream join re-shuffles
    * the checkpointed table — fatal for iterative operators that join
    * the same big table every round. This repartitions with an EXPLICIT
    * partition count (AQE does not coalesce a user-specified count, so
    * the layout is exactly what is claimed), checkpoints, and re-states
    * the partitioning/ordering on the checkpointed plan
    * (graftshims.PartitionedCheckpoint). Downstream equi-joins on
    * `cols` then shuffle only their other side.
    */
  def checkpointHashPartitioned(
      df: DataFrame,
      cols: Seq[String],
      sortedBy: Seq[String] = Nil
  ): (DataFrame, Set[Int]) = {
    import org.apache.spark.sql.functions.col
    val n = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val shaped0 = df.repartition(n, cols.map(col): _*)
    val shaped =
      if (sortedBy.nonEmpty) shaped0.sortWithinPartitions(sortedBy.map(col): _*)
      else shaped0
    val (ck, ids) = checkpointTracked(shaped)
    (
      org.apache.spark.sql.graftshims.PartitionedCheckpoint
        .retainHashPartitioning(ck, cols, n, sortedBy),
      ids
    )
  }
}
