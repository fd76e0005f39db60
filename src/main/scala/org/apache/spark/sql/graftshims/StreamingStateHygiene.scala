package org.apache.spark.sql.graftshims

import org.apache.spark.sql.execution.streaming.state.StateStore

/** Accessor shim for one `private[sql]` Spark internal.
  *
  * `StateStore.unloadAll()` evicts every loaded state-store provider on
  * this executor. Spark only does this lazily: after a StreamingQuery
  * stops, its providers stay in the JVM-wide loadedProviders map (the
  * HDFS-backed ones pinning their version maps on-heap) until a ~60s
  * maintenance tick notices the run is inactive. For bounded
  * replay-then-stop runs (graft.queries.StreamGate) that lazy unload is
  * pure leakage — each run uses a fresh checkpoint, so nothing ever
  * reuses the old providers. This shim lives in the
  * `org.apache.spark.sql` namespace solely to re-export the call; it
  * holds no logic of its own.
  */
object StreamingStateHygiene {

  /** Unload all state-store providers held by this JVM. Safe at any
    * point: an active streaming query reloads its providers from the
    * checkpoint on its next batch (a reload, not a correctness event).
    */
  def unloadAllStateStores(): Unit = StateStore.unloadAll()
}
