package org.apache.spark.sql.graftshims

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.classic.SparkSession

/** Tag a batch-computed DataFrame as STREAMING — what a V1
  * `Source.getBatch` must return (`MicroBatchExecution` asserts
  * `isStreaming`), and exactly how the public lakehouse sources solve
  * the same problem (Delta's `DeltaLog.createDataFrame`:
  * `internalCreateDataFrame(rdd, schema, isStreaming = true)`).
  *
  * The plan compiles to its RDD first, so the batch side keeps its
  * ordinary optimization (the feed-segment parquet scans, pushdown,
  * codegen); the streaming side then adopts that RDD as a leaf. The
  * RDD is lazy — nothing executes until the sink drains the batch.
  */
object StreamingFrames {

  def asStreamingFrame(df: DataFrame): DataFrame = {
    val session = df.sparkSession.asInstanceOf[SparkSession]
    session.internalCreateDataFrame(
      df.queryExecution.toRdd,
      df.schema,
      isStreaming = true
    )
  }
}
