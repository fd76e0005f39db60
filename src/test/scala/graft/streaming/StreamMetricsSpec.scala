package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, SparkSpec, Tables}

/** Pins the q132 streaming-metrics surface: the deterministic columns
  * (volume conservation, state-store rows, operator count) exactly, and
  * the measured columns (batch duration, throughput) against the budget
  * a user would size a cluster from — a gate replay of this corpus
  * must process its batches well inside the trigger interval a
  * production deployment would run at.
  */
class StreamMetricsSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("q132 metrics: volume conservation, state rows, and batch-duration budget") {
    val m = SparkEntry.queries("q132_stream_metrics")(spark, dir).collect()
    assert(m.nonEmpty)

    // volume conservation: the bounded replay reads the whole table,
    // exactly once, across its micro-batches
    val events = Tables(spark, dir, "events").count()
    assert(m.map(_.getAs[Long]("num_input_rows")).sum == events)

    // state rows: the tumbling-window aggregate holds exactly one state
    // row per open (hour-window, event_type) group — which on a bounded
    // replay is the batch group count
    val groups = Tables(spark, dir, "events")
      .select(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .distinct()
      .count()
    assert(m.last.getAs[Long]("state_rows_total") == groups)
    // complete mode: the final batch re-emits the whole result table
    assert(m.last.getAs[Long]("sink_output_rows") == groups)
    // one stateful operator (the windowed aggregation), in every batch
    assert(m.forall(_.getAs[Int]("n_state_operators") == 1))

    // budget: every micro-batch of this replay must finish well inside
    // a production 60s trigger interval; a regression that pushes a
    // 10k-row batch past it would make the pipeline fall behind 1:1
    assert(m.forall(r => r.getAs[Long]("batch_duration_ms") > 0L))
    assert(m.forall(r => r.getAs[Long]("batch_duration_ms") < 60000L),
      m.map(_.getAs[Long]("batch_duration_ms")).mkString(","))
    // data batches report positive processing throughput
    assert(m.filter(_.getAs[Long]("num_input_rows") > 0)
      .forall(_.getAs[Double]("processed_rows_per_sec") > 0.0))
  }

  test("q132 is rerunnable and its deterministic columns are stable across runs") {
    def stable() = SparkEntry
      .queries("q132_stream_metrics")(spark, dir)
      .select("batch_id", "num_input_rows", "state_rows_total", "n_state_operators")
      .collect()
      .toSeq
    assert(stable() == stable())
  }
}
