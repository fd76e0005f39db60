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
}
