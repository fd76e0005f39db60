package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, SparkSpec, Tables}

/** The round-5 gate queries: format round-trips (q86/q87/q89), the
  * sliding-window batch twin (q85), and the streaming-through-the-gate
  * run (q88). The DuckDB oracle hash-checks these end-to-end in the
  * driver; the specs pin the *internal* invariants the oracle can't
  * see — round-trip faithfulness against the in-Spark original,
  * window multiplicity, and batch==stream equality.
  */
class GateSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("q85 sliding windows: every event lands in exactly 4 hour/15-min buckets") {
    val total = run("q85_sliding_window").agg(sum("n")).collect().head.getLong(0)
    val events = Tables(spark, dir, "events").count()
    assert(total == 4 * events)
  }

  test("q85 sliding windows: tumbling-hour counts are recoverable from the slide-aligned starts") {
    // the hour-aligned sliding windows (start minute 0) are exactly the
    // tumbling windows — cross-check against q25's independent plan
    val hourAligned = run("q85_sliding_window")
      .filter(minute(col("bucket_start")) === 0)
      .groupBy("bucket_start", "event_type")
      .agg(sum("n").as("n"))
    val tumbling = Tables(spark, dir, "events")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("bucket_start"), col("event_type"), col("n"))
    assert(hourAligned.except(tumbling).isEmpty && tumbling.except(hourAligned).isEmpty)
  }

  test("q86 CSV round-trip aggregate equals the same aggregate over parquet") {
    val direct = Tables(spark, dir, "nation")
      .groupBy(col("n_regionkey"))
      .agg(
        count(lit(1)).as("n"),
        min(col("n_name")).as("first_name"),
        max(col("n_name")).as("last_name"),
        sum(col("n_nationkey")).cast("long").as("key_sum")
      )
      .orderBy("n_regionkey")
    assert(run("q86_csv_ingest").collect().toSeq == direct.collect().toSeq)
  }

  test("q87 JSON round-trip preserves every text byte (meta chars == text chars)") {
    val rows = run("q87_json_ingest").collect()
    assert(rows.nonEmpty)
    // n_chars is driver-written metadata; sum(length(text)) is computed
    // from the JSON round-tripped payload — equality proves lossless
    rows.foreach(r => assert(r.getAs[Long]("chars_meta") == r.getAs[Long]("chars_text")))
    val nDocs = rows.map(_.getAs[Long]("n_docs")).sum
    assert(nDocs == Tables(spark, dir, "documents").count())
  }

  test("q89 partitioned sink: pruned re-read equals direct filtered aggregate") {
    val direct = Tables(spark, dir, "orders")
      .filter(col("o_orderstatus") === "F")
      .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(round(col("o_totalprice") * 100, 0).cast("long")).as("revenue_cents")
      )
      .orderBy("month")
    assert(run("q89_partitioned_sink").collect().toSeq == direct.collect().toSeq)
  }

  test("q88 streaming run equals its batch twin (tumbling counts)") {
    val stream = run("q88_stream_tumbling")
    val batch = Tables(spark, dir, "events")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("bucket_start"), col("event_type"), col("n"))
      .orderBy("bucket_start", "event_type")
    assert(stream.collect().toSeq == batch.collect().toSeq)
  }

  test("q88 is rerunnable in one session (fresh sink per run)") {
    val a = run("q88_stream_tumbling").count()
    val b = run("q88_stream_tumbling").count()
    assert(a == b && a > 0)
  }

  test("q101 streaming dedup equals batch DISTINCT on the dedup keys") {
    val stream = run("q101_stream_dedup")
    val batch = Tables(spark, dir, "events")
      .select("user_id", "event_type")
      .distinct()
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_distinct_users"))
      .orderBy("event_type")
    assert(stream.collect().toSeq == batch.collect().toSeq)
  }

  test("q90 XML round-trip aggregate equals the same aggregate over parquet") {
    val direct = Tables(spark, dir, "supplier")
      .groupBy(col("s_nationkey"))
      .agg(
        count(lit(1)).as("n"),
        min(col("s_name")).as("first_name"),
        sum(col("s_suppkey")).cast("long").as("key_sum"),
        sum(round(col("s_acctbal") * 100, 0).cast("long")).as("acctbal_cents")
      )
      .orderBy("s_nationkey")
    assert(run("q90_xml_ingest").collect().toSeq == direct.collect().toSeq)
  }

  test("q95 streaming sliding run equals its batch twin (q85)") {
    val stream = run("q95_stream_sliding").collect().toSeq
    val batch = run("q85_sliding_window").collect().toSeq
    assert(stream == batch && stream.nonEmpty)
  }

  test("q109 live session-window stream equals its batch twin (q26 shape)") {
    val stream = run("q109_stream_session")
    val batch = Tables(spark, dir, "events")
      .groupBy(session_window(col("ts"), "5 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("w.start").as("session_start"), col("n"))
      .orderBy("user_id", "session_start")
    assert(stream.collect().toSeq == batch.collect().toSeq && stream.count() > 0)
  }

  test("q111 live stream-static enrichment equals the batch join+window") {
    val stream = run("q111_stream_enrich")
    val batch = Tables(spark, dir, "events")
      .join(
        Tables(spark, dir, "customer").select("c_custkey", "c_mktsegment"),
        col("user_id") === col("c_custkey")
      )
      .groupBy(window(col("ts"), "1 hour").as("w"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("bucket_start"), col("c_mktsegment"), col("n"))
      .orderBy("bucket_start", "c_mktsegment")
    assert(stream.collect().toSeq == batch.collect().toSeq && stream.count() > 0)
  }

  test("q112 streaming idempotent sink round-trip equals the direct aggregate; rerunnable") {
    val direct = Tables(spark, dir, "events")
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        sum(round(col("value") * 1000, 0).cast("long")).as("value_milli")
      )
      .orderBy("event_type")
    assert(run("q112_stream_sink").collect().toSeq == direct.collect().toSeq)
    // fresh out/checkpoint dirs per run — a second run must not see the
    // first run's offsets and write nothing
    assert(run("q112_stream_sink").collect().toSeq == direct.collect().toSeq)
  }

  test("q113 live transformWithState run equals batch per-user counts") {
    val stream = run("q113_stream_typed_state")
    val batch = Tables(spark, dir, "events")
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"))
      .orderBy("user_id")
    assert(stream.collect().toSeq == batch.collect().toSeq && stream.count() > 0)
  }

  test("q103 live stream-stream join equals the batch interval join") {
    val stream = run("q103_stream_join")
    val ev = Tables(spark, dir, "events")
    val c = ev
      .filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("ts").as("cts"))
    val p = ev
      .filter(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("ts").as("pts"), col("value"))
    val batch = c
      .join(
        p,
        col("cu") === col("pu") && col("pts") >= col("cts") &&
          col("pts") <= col("cts") + expr("INTERVAL 10 MINUTES")
      )
      .groupBy(col("pu").as("user_id"))
      .agg(
        count(lit(1)).as("n_attributed"),
        sum(round(col("value") * 1000, 0).cast("long")).as("amount_milli")
      )
      .orderBy("user_id")
    assert(stream.collect().toSeq == batch.collect().toSeq && stream.count() > 0)
  }
}
