package graft.streaming

import java.sql.Timestamp
import java.time.Instant

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** Deterministic MemoryStream tests for the streaming operators —
  * streaming has no DuckDB oracle (SURVEY.md §5 risk register), so this
  * spec IS its correctness gate; the batch twins (q25/q26) are
  * oracle-checked separately.
  */
class EventStreamsSpec extends AnyFunSuite with SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.from(Instant.parse(s))

  private def ev(id: Long, t: String, user: Long, typ: String): Event =
    Event(id, ts(t), user, typ, 1.0)

  test("tumbling windowed counts over a MemoryStream") {
    val sess = spark
    import sess.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStreams
      .windowedCounts(mem.toDF)
      .writeStream
      .format("memory")
      .queryName("wc")
      .outputMode("complete")
      .start()
    try {
      mem.addData(
        ev(1, "2024-01-01T00:05:00Z", 1, "click"),
        ev(2, "2024-01-01T00:55:00Z", 1, "click"),
        ev(3, "2024-01-01T01:05:00Z", 2, "view")
      )
      q.processAllAvailable()
      val rows = spark.table("wc").collect()
        .map(r => (r.getTimestamp(0).toInstant.toString, r.getString(1), r.getLong(2)))
        .toSet
      assert(rows == Set(
        ("2024-01-01T00:00:00Z", "click", 2L),
        ("2024-01-01T01:00:00Z", "view", 1L)
      ))
      // late-ish second batch lands in an existing window
      mem.addData(ev(4, "2024-01-01T00:59:00Z", 3, "click"))
      q.processAllAvailable()
      val n = spark.table("wc").collect()
        .find(r => r.getString(1) == "click" && r.getTimestamp(0).toInstant.toString == "2024-01-01T00:00:00Z")
        .get.getLong(2)
      assert(n == 3L)
    } finally q.stop()
  }

  test("sliding windows place one event in 4 overlapping hourly buckets") {
    val sess = spark
    import sess.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStreams
      .slidingCounts(mem.toDF)
      .writeStream
      .format("memory")
      .queryName("slide")
      .outputMode("complete")
      .start()
    try {
      mem.addData(ev(1, "2024-01-01T01:10:00Z", 1, "click"))
      q.processAllAvailable()
      val starts = spark.table("slide").collect()
        .map(r => r.getTimestamp(0).toInstant.toString).toSet
      // hourly window sliding by 15 min: starts 00:15..01:00 cover 01:10
      assert(starts == Set(
        "2024-01-01T00:15:00Z",
        "2024-01-01T00:30:00Z",
        "2024-01-01T00:45:00Z",
        "2024-01-01T01:00:00Z"
      ))
      assert(spark.table("slide").collect().forall(_.getLong(2) == 1L))
    } finally q.stop()
  }

  test("session windows merge events within the 5-minute gap") {
    val sess = spark
    import sess.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStreams
      .sessionCounts(mem.toDF)
      .writeStream
      .format("memory")
      .queryName("sc")
      .outputMode("complete")
      .start()
    try {
      mem.addData(
        ev(1, "2024-01-01T00:00:00Z", 7, "click"), // session A
        ev(2, "2024-01-01T00:04:00Z", 7, "click"), // A (gap < 5m)
        ev(3, "2024-01-01T00:20:00Z", 7, "click"), // session B (gap >= 5m)
        ev(4, "2024-01-01T00:21:00Z", 8, "view")   // user 8, own session
      )
      q.processAllAvailable()
      val rows = spark.table("sc").collect()
        .map(r => (r.getLong(1), r.getTimestamp(0).toInstant.toString, r.getLong(2)))
        .toSet
      assert(rows == Set(
        (7L, "2024-01-01T00:00:00Z", 2L),
        (7L, "2024-01-01T00:20:00Z", 1L),
        (8L, "2024-01-01T00:21:00Z", 1L)
      ))
    } finally q.stop()
  }

  test("stream-static join enriches events with a broadcast dimension") {
    val sess = spark
    import sess.implicits._
    implicit val sq = spark.sqlContext
    val customers = Seq((1L, "BUILDING"), (2L, "MACHINERY"))
      .toDF("c_custkey", "c_mktsegment")
    val mem = MemoryStream[Event]
    val q = EventStreams
      .enrichedCounts(mem.toDF, customers)
      .writeStream
      .format("memory")
      .queryName("ec")
      .outputMode("complete")
      .start()
    try {
      mem.addData(
        ev(1, "2024-01-01T00:05:00Z", 1, "click"),
        ev(2, "2024-01-01T00:06:00Z", 1, "view"),
        ev(3, "2024-01-01T00:07:00Z", 2, "click"),
        ev(4, "2024-01-01T00:08:00Z", 99, "click") // no dim match → dropped
      )
      q.processAllAvailable()
      val rows = spark.table("ec").collect()
        .map(r => (r.getString(1), r.getLong(2))).toSet
      assert(rows == Set(("BUILDING", 2L), ("MACHINERY", 1L)))
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark bounds dedup state by the watermark") {
    val sess = spark
    import sess.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStreams
      .dedupWithinWatermark(mem.toDF)
      .writeStream
      .format("memory")
      .queryName("dw")
      .outputMode("append")
      .start()
    try {
      mem.addData(
        ev(1, "2024-01-01T00:01:00Z", 1, "click"),
        ev(2, "2024-01-01T00:02:00Z", 1, "click") // dup within watermark → dropped
      )
      q.processAllAvailable()
      mem.addData(ev(3, "2024-01-01T00:03:00Z", 1, "click")) // still within horizon
      q.processAllAvailable()
      val ids = spark.table("dw").collect().map(_.getLong(0)).toSet
      assert(ids == Set(1L))
    } finally q.stop()
  }

  test("foreachBatch idempotent parquet sink: batch replay does not duplicate") {
    val sess = spark
    import sess.implicits._
    implicit val sq = spark.sqlContext
    val out = java.nio.file.Files.createTempDirectory("graft_sink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    val mem = MemoryStream[Event]
    val q = EventStreams
      .toIdempotentParquet(mem.toDF, out)
      .option("checkpointLocation", ckpt)
      .start()
    try {
      mem.addData(ev(1, "2024-01-01T00:01:00Z", 1, "click"))
      q.processAllAvailable()
      mem.addData(ev(2, "2024-01-01T00:02:00Z", 2, "view"))
      q.processAllAvailable()
      assert(spark.read.parquet(out).count() == 2)

      // simulate a batch REPLAY after failure: rewriting the same batch
      // id must overwrite, not append
      val replay = Seq(Event(1L, ts("2024-01-01T00:01:00Z"), 1L, "click", 1.0)).toDF
      EventStreams.writeBatch(replay, 0L, out)
      EventStreams.writeBatch(replay, 0L, out)
      assert(spark.read.parquet(out).count() == 2) // still 2, not 3/4
    } finally q.stop()
  }

  test("flatMapGroupsWithState dedup keeps state across micro-batches") {
    val sess = spark
    import sess.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStreams
      .firstSeen(mem.toDS())
      .writeStream
      .format("memory")
      .queryName("fs")
      .outputMode("append")
      .start()
    try {
      // batch 1: two dups in-batch (later ts first — earliest must win) + one other key
      mem.addData(
        ev(2, "2024-01-01T00:10:00Z", 1, "click"),
        ev(1, "2024-01-01T00:01:00Z", 1, "click"),
        ev(3, "2024-01-01T00:02:00Z", 2, "view")
      )
      q.processAllAvailable()
      // batch 2: same keys again — must be suppressed by state; one new key
      mem.addData(
        ev(4, "2024-01-01T00:20:00Z", 1, "click"),
        ev(5, "2024-01-01T00:21:00Z", 2, "view"),
        ev(6, "2024-01-01T00:22:00Z", 2, "click")
      )
      q.processAllAvailable()
      val ids = spark.table("fs").collect().map(_.getLong(0)).toSet
      assert(ids == Set(1L, 3L, 6L))
    } finally q.stop()
  }

  test("stream-stream interval join attributes purchases to prior clicks") {
    val sess = spark
    import sess.implicits._
    implicit val sq = spark.sqlContext
    val clicks = MemoryStream[Event]
    val buys = MemoryStream[Event]
    val q = EventStreams
      .clickAttribution(clicks.toDF, buys.toDF)
      .writeStream
      .format("memory")
      .queryName("attr")
      .outputMode("append")
      .start()
    try {
      clicks.addData(
        ev(10, "2024-01-01T00:00:00Z", 1, "click"), // matched by buy 100
        ev(11, "2024-01-01T00:30:00Z", 2, "click"), // too early for buy 101
        ev(12, "2024-01-01T01:10:00Z", 3, "click")  // AFTER buy 102 — must not match
      )
      buys.addData(
        ev(100, "2024-01-01T00:05:00Z", 1, "purchase"), // 5 min after click 10
        ev(101, "2024-01-01T00:55:00Z", 2, "purchase"), // 25 min after click 11
        ev(102, "2024-01-01T01:00:00Z", 3, "purchase")  // before click 12
      )
      q.processAllAvailable()
      val rows = spark.table("attr").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet
      assert(rows == Set((1L, 10L, 100L)))
      // second batch: a click for user 2 close enough to a new purchase
      clicks.addData(ev(13, "2024-01-01T01:20:00Z", 2, "click"))
      buys.addData(ev(103, "2024-01-01T01:25:00Z", 2, "purchase"))
      q.processAllAvailable()
      val rows2 = spark.table("attr").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet
      assert(rows2 == Set((1L, 10L, 100L), (2L, 13L, 103L)))
    } finally q.stop()
  }

  test("left-outer interval join emits orphans only after the watermark closes their window") {
    val sess = spark
    import sess.implicits._
    implicit val sq = spark.sqlContext
    val clicks = MemoryStream[Event]
    val buys = MemoryStream[Event]
    val q = EventStreams
      .clickAttributionOuter(clicks.toDF, buys.toDF)
      .writeStream
      .format("memory")
      .queryName("attr_outer")
      .outputMode("append")
      .start()
    try {
      clicks.addData(
        ev(10, "2024-01-01T00:00:00Z", 1, "click"), // matched by buy 100
        ev(11, "2024-01-01T00:30:00Z", 2, "click")  // never matched — future orphan
      )
      buys.addData(ev(100, "2024-01-01T00:05:00Z", 1, "purchase"))
      q.processAllAvailable()
      val rows1 = spark.table("attr_outer").collect()
        .map(r => (r.getLong(0), r.getLong(1), Option(r.get(2)))).toSet
      // the match emits immediately; click 11's window (ends 00:40) is
      // still ahead of the watermark, so NO orphan row yet
      assert(rows1 == Set((1L, 10L, Some(100L))))

      // advance BOTH event-time watermarks past 00:40 + delay
      clicks.addData(ev(12, "2024-01-01T02:00:00Z", 3, "click"))
      buys.addData(ev(101, "2024-01-01T02:00:00Z", 4, "purchase"))
      q.processAllAvailable()
      val rows2 = spark.table("attr_outer").collect()
        .map(r => (r.getLong(0), r.getLong(1), Option(r.get(2)))).toSet
      // click 11 is now provably unmatched → null-extended row; click 12
      // (window still open) and purchase 101 (wrong side) emit nothing
      assert(rows2 == Set((1L, 10L, Some(100L)), (2L, 11L, None)))
    } finally q.stop()
  }

  test("transformWithState keeps typed per-key running totals across batches") {
    val sess = spark
    import sess.implicits._
    implicit val sq = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    // transformWithState requires the RocksDB provider — also the
    // at-scale choice (off-heap keyed state, changelog checkpointing)
    spark.conf.set(
      "spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    )
    val mem = MemoryStream[Event]
    val q = EventStreams
      .runningTotals(mem.toDS())
      .toDF("user_id", "n", "total")
      .writeStream
      .format("memory")
      .queryName("rt")
      .outputMode("update")
      .start()
    try {
      mem.addData(
        Event(1, ts("2024-01-01T00:00:00Z"), 1, "purchase", 10.0),
        Event(2, ts("2024-01-01T00:01:00Z"), 1, "purchase", 5.0),
        Event(3, ts("2024-01-01T00:02:00Z"), 2, "purchase", 7.0)
      )
      q.processAllAvailable()
      val afterB1 = spark.table("rt").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(afterB1 == Set((1L, 2L, 15.0), (2L, 1L, 7.0)))
      // state must persist: batch 2 continues user 1's totals
      mem.addData(Event(4, ts("2024-01-01T00:05:00Z"), 1, "purchase", 2.5))
      q.processAllAvailable()
      val latest = spark.table("rt").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .groupBy(_._1).view.mapValues(_.maxBy(_._2)).toMap
      assert(latest(1L) == ((1L, 3L, 17.5)))
      assert(latest(2L) == ((2L, 1L, 7.0)))
    } finally {
      q.stop()
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None    => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  // ------------------------------------------------------------------
  // Restart recovery — the guarantee the checkpoint exists for at
  // scale: a crashed job resumes from its checkpoint with no loss, no
  // duplication, and its operator STATE intact. MemoryStream cannot
  // restart (its data dies with the query), so these drive a real
  // file source across two separate query incarnations sharing one
  // checkpoint dir.
  // ------------------------------------------------------------------

  private def fileEvents(dir: String): org.apache.spark.sql.DataFrame = {
    val sess = spark
    import sess.implicits._
    spark.readStream
      .schema(Seq.empty[Event].toDS().schema)
      .parquet(dir)
  }

  private def writeInput(dir: String, name: String, rows: Seq[Event]): Unit = {
    val sess = spark
    import sess.implicits._
    rows.toDS().coalesce(1).write.mode("overwrite").parquet(s"$dir/$name")
  }

  test("restart from checkpoint resumes source offsets exactly-once") {
    val in = java.nio.file.Files.createTempDirectory("graft_restart_in").toString
    val out = java.nio.file.Files.createTempDirectory("graft_restart_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_restart_ck").toString

    writeInput(in, "a", Seq(ev(1, "2024-01-01T00:01:00Z", 1, "click"),
                            ev(2, "2024-01-01T00:02:00Z", 2, "view")))
    val q1 = EventStreams
      .toIdempotentParquet(fileEvents(s"$in/*"), out)
      .option("checkpointLocation", ckpt)
      .start()
    try q1.processAllAvailable()
    finally q1.stop()

    // the job "crashes"; more data lands; a NEW query resumes from the
    // same checkpoint — part 1's files must NOT be reprocessed
    writeInput(in, "b", Seq(ev(3, "2024-01-01T00:03:00Z", 1, "click")))
    val q2 = EventStreams
      .toIdempotentParquet(fileEvents(s"$in/*"), out)
      .option("checkpointLocation", ckpt)
      .start()
    try q2.processAllAvailable()
    finally q2.stop()

    val got = spark.read.parquet(out).collect()
    assert(got.length == 3, s"exactly-once violated: ${got.length} rows")
    assert(got.map(_.getAs[Long]("event_id")).toSet == Set(1L, 2L, 3L))
  }

  test("restart recovers dedup state: post-restart duplicates are still dropped") {
    val in = java.nio.file.Files.createTempDirectory("graft_restart2_in").toString
    val out = java.nio.file.Files.createTempDirectory("graft_restart2_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_restart2_ck").toString

    def dedupToParquet() =
      EventStreams
        .toIdempotentParquet(EventStreams.dedupWithinWatermark(fileEvents(s"$in/*")), out)
        .option("checkpointLocation", ckpt)
        .start()

    writeInput(in, "a", Seq(ev(1, "2024-01-01T00:01:00Z", 1, "click")))
    val q1 = dedupToParquet()
    try q1.processAllAvailable()
    finally q1.stop()

    // after the restart, (user 1, click) arrives AGAIN within the
    // 10-minute watermark: only recovered dedup state can suppress it
    writeInput(in, "b", Seq(ev(2, "2024-01-01T00:03:00Z", 1, "click"),
                            ev(3, "2024-01-01T00:04:00Z", 2, "view")))
    val q2 = dedupToParquet()
    try q2.processAllAvailable()
    finally q2.stop()

    val ids = spark.read.parquet(out).collect().map(_.getAs[Long]("event_id")).toSet
    assert(ids == Set(1L, 3L), s"state not recovered: $ids")
  }
}
