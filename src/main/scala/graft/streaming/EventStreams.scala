package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{
  GroupState,
  GroupStateTimeout,
  OutputMode,
  StatefulProcessor,
  TTLConfig,
  TimeMode,
  TimerValues,
  ValueState
}

/** One event row — mirrors the `events` table schema (TESTDATA.md). */
final case class Event(
    event_id: Long,
    ts: java.sql.Timestamp,
    user_id: Long,
    event_type: String,
    value: Double
)

/** Structured-Streaming operators over the events stream (SURVEY.md §2.3
  * E15, §7.7). Each transform is source-agnostic: the identical plan
  * runs over `readStream` (Kafka/files at cluster scale, MemoryStream in
  * tests) and over the static `events` table — q25/q26 in Relational are
  * the batch instantiations, oracle-checked against DuckDB.
  *
  * Scale posture: state is keyed and partitioned by the group key (one
  * shuffle), watermarks bound state size, and the stateful dedup keeps
  * one boolean per key — no per-event state growth.
  */
object EventStreams {

  /** Hourly tumbling counts with a 10-minute watermark. */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("bucket_start"), col("event_type"), col("n"))

  /** Sliding hourly windows every 15 minutes — each event lands in 4
    * overlapping buckets; watermark bounds the open-window state. */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("bucket_start"), col("event_type"), col("n"))

  /** Per-user session windows with a 5-minute gap (same gap semantics as
    * the q26 batch/oracle formulation). */
  def sessionCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "5 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(
        col("session_window.start").as("session_start"),
        col("user_id"),
        col("n")
      )

  /** Stream-static enrichment: join the event stream against a static
    * dimension (broadcast — the static side is planned once per batch),
    * then aggregate per segment. The static side can be arbitrarily
    * refreshed between restarts without touching stream state.
    */
  def enrichedCounts(events: DataFrame, customers: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .join(broadcast(customers), events("user_id") === customers("c_custkey"))
      .groupBy(window(col("ts"), "1 hour"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("bucket_start"), col("c_mktsegment"), col("n"))

  /** Built-in watermark-bounded streaming dedup — the engine drops state
    * for keys older than the watermark, so memory is bounded by the
    * watermark horizon instead of key cardinality (contrast with
    * `firstSeen`, which keeps state forever for exact global dedup).
    */
  def dedupWithinWatermark(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("user_id", "event_type")

  /** Stream-stream interval join: attribute each purchase to the same
    * user's clicks in the preceding 10 minutes. BOTH sides carry
    * watermarks and the join condition carries the time bound — that
    * pair is what lets the engine expire buffered rows on both sides
    * (state is bounded by watermark + interval, not by stream length).
    * Inner join, so results emit as soon as both sides arrive.
    */
  def clickAttribution(clicks: DataFrame, purchases: DataFrame): DataFrame = {
    val c = clicks
      .withWatermark("ts", "10 minutes")
      .select(
        col("user_id").as("click_user"),
        col("ts").as("click_ts"),
        col("event_id").as("click_id")
      )
    val p = purchases
      .withWatermark("ts", "10 minutes")
      .select(
        col("user_id").as("buy_user"),
        col("ts").as("buy_ts"),
        col("event_id").as("buy_id"),
        col("value").as("amount")
      )
    c.join(
      p,
      col("click_user") === col("buy_user") &&
        col("buy_ts") >= col("click_ts") &&
        col("buy_ts") <= col("click_ts") + expr("INTERVAL 10 MINUTES")
    ).select(col("buy_user").as("user_id"), col("click_id"), col("buy_id"), col("amount"))
  }

  /** LEFT OUTER stream-stream interval join: like [[clickAttribution]],
    * but clicks that attract no purchase within the window are ALSO
    * emitted (null-extended) — the "which impressions converted, which
    * didn't" shape. The engine can only declare a click unmatched once
    * no future purchase could still join it, so null-extended rows emit
    * when the watermark passes `click_ts + interval`; on a bounded
    * replay the final watermark is `min(max click ts, max purchase ts)
    * - delay`, which makes the emitted set exactly: every match, plus
    * every unmatched click whose full join window closed before that
    * final watermark. That rule is deterministic and the q135 oracle
    * restates it in SQL — trailing unmatched clicks whose window is
    * still open when the replay ends are (correctly) absent.
    * user_id comes from the CLICK side: the purchase side is NULL on
    * exactly the rows this variant exists to keep.
    */
  def clickAttributionOuter(clicks: DataFrame, purchases: DataFrame): DataFrame = {
    val c = clicks
      .withWatermark("ts", "10 minutes")
      .select(
        col("user_id").as("click_user"),
        col("ts").as("click_ts"),
        col("event_id").as("click_id")
      )
    val p = purchases
      .withWatermark("ts", "10 minutes")
      .select(
        col("user_id").as("buy_user"),
        col("ts").as("buy_ts"),
        col("event_id").as("buy_id"),
        col("value").as("amount")
      )
    c.join(
      p,
      col("click_user") === col("buy_user") &&
        col("buy_ts") >= col("click_ts") &&
        col("buy_ts") <= col("click_ts") + expr("INTERVAL 10 MINUTES"),
      "leftOuter"
    ).select(col("click_user").as("user_id"), col("click_id"), col("buy_id"), col("amount"))
  }

  /** Idempotent per-batch parquet writer: each micro-batch lands in its
    * own `batch_id=<id>` directory with overwrite mode, so replaying a
    * batch after a failure rewrites the same directory instead of
    * duplicating rows — the standard exactly-once file-sink recipe when
    * combined with checkpointed offsets.
    */
  def writeBatch(batch: DataFrame, batchId: Long, outDir: String): Unit =
    batch.write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")

  /** Stream → idempotent parquet via foreachBatch. Caller starts it:
    * `toIdempotentParquet(df, dir).option("checkpointLocation", ...).start()`.
    */
  def toIdempotentParquet(df: DataFrame, outDir: String) =
    df.writeStream.foreachBatch((batch: DataFrame, id: Long) => writeBatch(batch, id, outDir))

  /** Per-user running totals via `transformWithState` (Spark 4's
    * arbitrary-state API, successor to *GroupsWithState): typed
    * ValueState per key, updated per micro-batch, emitting the running
    * (n_events, total_value) after each batch touches the key. Requires
    * the RocksDB state store provider — which is also the right store
    * at scale: state lives off-heap/on-disk per partition with
    * changelog checkpointing, so key cardinality is bounded by disk,
    * not executor heap. TTLConfig.NONE here; production pipelines set a
    * TTL to expire idle users.
    */
  class RunningTotals extends StatefulProcessor[Long, Event, (Long, Long, Double)] {
    @transient private var nState: ValueState[Long] = _
    @transient private var sumState: ValueState[Double] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      nState = getHandle.getValueState[Long]("n", Encoders.scalaLong, TTLConfig.NONE)
      sumState = getHandle.getValueState[Double]("sum", Encoders.scalaDouble, TTLConfig.NONE)
    }

    override def handleInputRows(
        key: Long,
        rows: Iterator[Event],
        timerValues: TimerValues
    ): Iterator[(Long, Long, Double)] = {
      var n = if (nState.exists()) nState.get() else 0L
      var sum = if (sumState.exists()) sumState.get() else 0.0
      // streaming fold — never buffer the group (a hot key with
      // millions of rows in one batch must not materialize in heap).
      // The count is exact regardless of order; the double total
      // follows batch iterator order (last-ulp variance across runs) —
      // pipelines needing bit-stable money totals accumulate scaled
      // integers instead (see the q01/q56 exact-sum pattern).
      rows.foreach { e =>
        n += 1; sum += e.value
      }
      nState.update(n)
      sumState.update(sum)
      Iterator.single((key, n, sum))
    }
  }

  /** events → per-user running (n_events, total_value), update mode. */
  def runningTotals(events: Dataset[Event]): Dataset[(Long, Long, Double)] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new RunningTotals, TimeMode.None(), OutputMode.Update())
  }

  /** Stateful streaming dedup: emit only the FIRST event ever seen per
    * (user_id, event_type); later occurrences — in the same or any later
    * micro-batch — are dropped. Within a batch the earliest (ts,
    * event_id) wins, so output is deterministic regardless of batch
    * iterator order.
    */
  def firstSeen(events: Dataset[Event]): Dataset[Event] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(e => (e.user_id, e.event_type))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_: (Long, String), it: Iterator[Event], state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            Iterator.single(it.minBy(e => (e.ts.getTime, e.event_id)))
          }
      )
  }
}
