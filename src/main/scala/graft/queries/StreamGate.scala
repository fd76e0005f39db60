package graft.queries

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.{QueryDef, Tables}

/** Streaming surfaces registered through the driver's correctness gate
  * (SURVEY.md §2.3 E15). Until round 5 the streaming operators were
  * spec-only (MemoryStream specs in StreamingSpec); these two queries
  * put a real Structured Streaming run and the one window shape with no
  * batch twin (sliding) in front of the DuckDB oracle.
  */
object StreamGate {

  /** Unique memory-sink names: the gate query can run several times in
    * one session (bench repeats), and a memory sink's backing temp view
    * belongs to its (stopped) streaming query — never reuse one. */
  private val sinkSeq = new AtomicInteger(0)

  /** Session clone with streaming-right-sized shuffle partitions.
    *
    * Stateful-operator commit cost scales with the partition count —
    * one state-store file commit per partition per stateful operator
    * per micro-batch (a stream-stream join carries FOUR stores per
    * partition), and the trailing watermark-finalization batch pays it
    * all again. The gate replays hold megabytes of state, so 32
    * partitions meant ~128 file commits per batch for ~8 MB of join
    * state — q103 spent more time committing state than joining.
    * Partition count is pure physical sizing (results are identical);
    * a production deployment with gigabytes of state per operator
    * raises it back. The clone shares the SparkContext; only its
    * session-local conf differs.
    */
  private val gateSessions =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, Boolean, Int, Boolean), SparkSession]()

  /** @param rocksdb       also pin the RocksDB state-store provider
    *                      (its own cached clone, so the provider conf
    *                      never leaks into the other gate replays)
    * @param partitions    shuffle-partition count for this gate's
    *                      stateful operators (commit cost is per-
    *                      partition-per-operator-per-batch — class doc)
    * @param noDataBatches whether the trailing no-data micro-batch
    *                      runs. Part of the CACHE KEY, never mutated on
    *                      a shared clone: a complete/update-mode gate
    *                      NEEDS the finalization batch to emit
    *                      watermark-closed results — only q103's
    *                      append-mode inner join may skip it
    */
  private def gateSession(
      s: SparkSession,
      rocksdb: Boolean = false,
      partitions: Int = 8,
      noDataBatches: Boolean = true
  ): SparkSession = {
    // this map is JVM-global and the harness is not its only caller:
    // evict clones whose base session has been stopped, so contexts that
    // create many SparkSessions over a JVM's lifetime (per-suite
    // sessions) don't accumulate dead (base → clone) pairs forever
    gateSessions.keySet.forEach { k =>
      if (k._1.sparkContext.isStopped) gateSessions.remove(k): Unit
    }
    gateSessions.computeIfAbsent(
      (s, rocksdb, partitions, noDataBatches),
      { case (base, rocks, parts, noData) =>
        val s2 = base.newSession()
        s2.conf.set("spark.sql.shuffle.partitions", parts.toString)
        if (rocks)
          s2.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
          )
        if (!noData)
          s2.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
        s2
      }
    )
  }

  /** The events table replayed as a file-source stream (the file source
    * takes a directory; the glob pins it to the one table). `ts` is
    * normalized with the same schema-adaptive coercion as Tables.events
    * so batch and stream rows are identical whatever the parquet's
    * physical timestamp encoding.
    */
  private def eventsStream(s: SparkSession, dir: String): DataFrame = {
    val schema = s.read.parquet(s"$dir/events.parquet").schema
    Tables.normalizeEventsTs(
      s.readStream
        .schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(dir))
  }

  /** Drain a bounded streaming transform into a fresh memory sink with
    * Trigger.AvailableNow and return the collected table.
    *
    * After the run, eagerly unload the state-store providers the stopped
    * query leaves behind: a stopped StreamingQuery does NOT unload its
    * providers — they sit in the executor's loadedProviders map (the
    * HDFS-backed ones pinning their loadedMaps on-heap) until a ~60s
    * maintenance tick notices the run is inactive. Every gate run uses a
    * fresh temp checkpoint, i.e. a fresh provider set of
    * `shuffle.partitions` stores, so under repeated runs the leftovers
    * compound: the sliding-window gate degraded 5.3→8.0s across the
    * bench's three runs while running flat at ~3.1s standalone. Eager
    * unload makes every run pay for exactly its own state. (If other
    * streams are active in the session they reload their stores on the
    * next batch — a reload, not a correctness event.)
    */
  private def drainToTable(s: SparkSession, out: DataFrame, mode: String): DataFrame =
    drainWithProgress(s, out, mode)._1

  /** [[drainToTable]] plus the run's `StreamingQueryProgress` entries —
    * the per-micro-batch metrics (input rows, rows/sec, batch duration,
    * state-store rows) users size clusters from. Captured AFTER
    * termination from `recentProgress`, so the array covers the whole
    * bounded replay (the default retention of 100 progress updates far
    * exceeds a gate run's batch count).
    */
  private def drainWithProgress(
      s: SparkSession,
      out: DataFrame,
      mode: String
  ): (DataFrame, Seq[org.apache.spark.sql.streaming.StreamingQueryProgress]) = {
    val sink = s"graft_stream_gate_${sinkSeq.incrementAndGet()}"
    val q = out.writeStream
      .format("memory")
      .queryName(sink)
      .outputMode(mode)
      .trigger(Trigger.AvailableNow())
      .start()
    try q.awaitTermination()
    finally {
      if (sys.env.contains("SPARK_GRAFT_STREAM_DEBUG"))
        q.recentProgress.foreach(p => System.err.println(s"[stream-progress] $p"))
      q.stop()
      org.apache.spark.sql.graftshims.StreamingStateHygiene.unloadAllStateStores()
    }
    // The memory sink pins its rows on the driver heap for as long as
    // its temp view exists, and the replay is bounded — so move the
    // rows out and drop the view NOW. (A lazy `s.table(sink)` +
    // deferred drop breaks build-several-then-consume callers and
    // leaks one result table per replay.) The localized collect is the
    // result table of a bounded gate run — the same driver-resident
    // rows the memory sink already holds, not a data-path collect.
    val tbl = s.table(sink)
    val rows = java.util.Arrays.asList(tbl.collect(): _*)
    val schema = tbl.schema
    s.catalog.dropTempView(sink)
    (s.createDataFrame(rows, schema), q.recentProgress.toSeq)
  }

  /** One metrics row per micro-batch of a gate replay. Throughput and
    * duration fields are measurements (rows-only by nature); the volume
    * and state fields are deterministic replays of the input — the spec
    * pins `num_input_rows` against the table count and
    * `state_rows_total` against the batch group count. */
  private def progressTable(
      s: SparkSession,
      progress: Seq[org.apache.spark.sql.streaming.StreamingQueryProgress]
  ): DataFrame = {
    import s.implicits._
    progress
      .map { p =>
        (
          p.batchId,
          p.numInputRows,
          // NaN for batches the source reports no timing for — keep,
          // don't invent zeros
          p.inputRowsPerSecond,
          p.processedRowsPerSecond,
          Option(p.durationMs.get("triggerExecution")).map(_.toLong).getOrElse(-1L),
          p.stateOperators.map(_.numRowsTotal).sum,
          p.stateOperators.map(_.numRowsUpdated).sum,
          p.stateOperators.length,
          Option(p.sink).map(_.numOutputRows).getOrElse(-1L)
        )
      }
      .toDF(
        "batch_id",
        "num_input_rows",
        "input_rows_per_sec",
        "processed_rows_per_sec",
        "batch_duration_ms",
        "state_rows_total",
        "state_rows_updated",
        "n_state_operators",
        "sink_output_rows"
      )
      .orderBy("batch_id")
  }

  val defs: Seq[QueryDef] = Seq(
    // ------------------------------------------------------------------
    // E15 (batch twin, sliding): hourly windows sliding every 15
    // minutes — each event lands in exactly 4 overlapping buckets.
    // Same window geometry as streaming EventStreams.slidingCounts, so
    // this is its oracle-checked batch twin (tumbling and session
    // windows already have q25/q26). The DuckDB restatement cross-joins
    // a 4-row offset spine: window starts for event t are
    // time_bucket_15(t) - k·15min, k ∈ 0..3 — exactly Spark's
    // epoch-aligned sliding-window assignment.
    QueryDef(
      "q85_sliding_window",
      (s, dir) =>
        Tables(s, dir, "events")
          .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"), col("event_type"))
          .agg(count(lit(1)).as("n"))
          .select(col("w.start").as("bucket_start"), col("event_type"), col("n"))
          .orderBy("bucket_start", "event_type"),
      Some("""SELECT time_bucket(INTERVAL '15 minutes', ts) - k * INTERVAL '15 minutes'
              AS bucket_start, event_type, count(*) AS n
          FROM events, (SELECT unnest(range(4)) AS k)
          GROUP BY 1, 2 ORDER BY 1, 2""")
    ),

    // ------------------------------------------------------------------
    // E15 (streaming through the gate): the events table replayed as a
    // FILE-SOURCE STREAM into EventStreams.windowedCounts (watermark +
    // tumbling window), drained with Trigger.AvailableNow, collected
    // via a memory sink in complete mode. The returned DataFrame is the
    // final result table, so the DuckDB oracle hash-checks an actual
    // Structured Streaming execution — stream-vs-batch equivalence is
    // additionally pinned by StreamingSpec.
    //
    // Gate-harness shapes, called out honestly: the memory sink is the
    // collection vehicle (a cluster job writes files/Kafka via
    // foreachBatch — see EventStreams.idempotentSink), and complete
    // mode is what makes a bounded replay equal its batch twin (append
    // mode would hold back the watermark-open tail windows; at 100 TB
    // you run append + checkpoints on an unbounded source).
    QueryDef(
      "q88_stream_tumbling",
      (s, dir) => {
        val gs = gateSession(s)
        drainToTable(
          gs,
          graft.streaming.EventStreams.windowedCounts(eventsStream(gs, dir)),
          "complete"
        ).orderBy("bucket_start", "event_type")
      },
      Some("""SELECT time_bucket(INTERVAL '1 hour', ts) AS bucket_start,
            event_type, count(*) AS n
          FROM events GROUP BY 1, 2 ORDER BY 1, 2""")
    ),

    // ------------------------------------------------------------------
    // E15 (streaming, sliding): the same file-source replay through
    // EventStreams.slidingCounts — overlapping windows are the one
    // shape whose state store holds multiple open windows per event, so
    // the gate exercises it live too (q88 covers tumbling). Oracle =
    // q85's offset-spine restatement; the batch twin's hash match plus
    // this one pins stream==batch==oracle three ways.
    QueryDef(
      "q95_stream_sliding",
      (s, dir) => {
        val gs = gateSession(s)
        drainToTable(
          gs,
          graft.streaming.EventStreams.slidingCounts(eventsStream(gs, dir)),
          "complete"
        ).orderBy("bucket_start", "event_type")
      },
      Some("""SELECT time_bucket(INTERVAL '15 minutes', ts) - k * INTERVAL '15 minutes'
              AS bucket_start, event_type, count(*) AS n
          FROM events, (SELECT unnest(range(4)) AS k)
          GROUP BY 1, 2 ORDER BY 1, 2""")
    ),

    // ------------------------------------------------------------------
    // E15 (streaming, stateful dedup): the events replay through
    // EventStreams.dedupWithinWatermark (dropDuplicatesWithinWatermark
    // on (user_id, event_type), 10-minute watermark) — the streaming
    // ingest-dedup step of a training pipeline, live through the gate.
    // Append mode: the dedup operator emits each first-seen key
    // immediately. On this bounded single-file replay every row shares
    // one micro-batch, so the surviving key set equals a global batch
    // DISTINCT — which is exactly what the oracle states. Only the KEY
    // columns are aggregated: which physical row survives per key
    // depends on partition processing order (its other columns are
    // nondeterministic by contract), the key set is not.
    QueryDef(
      "q101_stream_dedup",
      (s, dir) => {
        val gs = gateSession(s)
        drainToTable(
          gs,
          graft.streaming.EventStreams
            .dedupWithinWatermark(eventsStream(gs, dir))
            .select("user_id", "event_type"),
          "append"
        ).groupBy("event_type")
          .agg(count(lit(1)).as("n_distinct_users"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type, count(*) AS n_distinct_users
          FROM (SELECT DISTINCT user_id, event_type FROM events)
          GROUP BY 1 ORDER BY 1""")
    ),

    // ------------------------------------------------------------------
    // E15 (streaming, stream-stream join): click→purchase attribution
    // LIVE — two independent file-source replays of the events table
    // (clicks and purchases) interval-joined inside a streaming query
    // (EventStreams.clickAttribution: same user, purchase within 10
    // minutes after the click). Inner stream-stream joins emit matches
    // as they are found, so append mode on a bounded replay yields the
    // full match set; on an unbounded source the same plan holds join
    // state only within the watermark interval. The memory-sink rows
    // are aggregated per user with the engine-standard milli-unit trick
    // (q25) so the double `amount` sums exactly in both engines.
    QueryDef(
      "q103_stream_join",
      (s, dir) => {
        // 2 partitions, measured at sf0.1: the stream-stream join
        // carries FOUR state stores per partition and replays ≥2
        // batches (data + watermark finalization), so commit count
        // dominates: 8 parts = 3.0s, 4 = 2.8s, 2 = 2.4s, 1 = 2.6s
        // (commit floor beats lost parallelism until the join itself
        // is single-threaded). RocksDB measured slower still (3.5s —
        // native store init per store per batch at ~8 MB of state).
        // noDataBatches=false collapses the trailing watermark-
        // finalization batch: an inner stream-stream join in append
        // mode emits every match in the DATA batch — the no-data batch
        // only advances the watermark to evict state, which a bounded
        // replay that stops right after does not need. Skipping it
        // saves one full state-commit round (4 stores × partitions).
        // The conf is part of the clone's cache key, so no other gate
        // can inherit it.
        val gs = gateSession(s, partitions = 2, noDataBatches = false)
        drainToTable(
          gs,
          graft.streaming.EventStreams.clickAttribution(
            eventsStream(gs, dir).filter(col("event_type") === "click"),
            eventsStream(gs, dir).filter(col("event_type") === "purchase")
          ),
          "append"
        ).groupBy("user_id")
          .agg(
            count(lit(1)).as("n_attributed"),
            sum(Exact.milli(col("amount"))).as("amount_milli")
          )
          .orderBy("user_id")
      },
      Some("""SELECT c.user_id, count(*) AS n_attributed,
            CAST(sum(CAST(round(p.value*1000) AS BIGINT)) AS BIGINT) AS amount_milli
          FROM (SELECT user_id, ts, event_id FROM events WHERE event_type = 'click') c
          JOIN (SELECT user_id, ts, event_id, value FROM events
                WHERE event_type = 'purchase') p
            ON p.user_id = c.user_id
           AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL '10 minutes'
          GROUP BY 1 ORDER BY 1""")
    ),

    // ------------------------------------------------------------------
    // E15 (streaming, stream-stream LEFT OUTER join): q103's attribution
    // with the unmatched clicks KEPT — the join family's hard half,
    // because a null-extended row may only emit once the watermark
    // proves no future purchase can match. The emitted set on a bounded
    // replay is therefore: every match, plus every unmatched click
    // whose join window closed before the final watermark
    // (min(max click ts, max purchase ts) - 10 min). The oracle
    // restates exactly that rule in SQL — a batch LEFT JOIN filtered to
    // (matched) OR (window closed before the final watermark) — so the
    // hash pins Spark's outer-join eviction semantics, not just the
    // match set. noDataBatches stays ON (q103 turns it off): the
    // trailing watermark-finalization batch is what flushes the
    // null-extended rows; without it every orphan click would be
    // missing.
    QueryDef(
      "q135_stream_outer_join",
      (s, dir) => {
        // same commit-cost sizing as q103 (four state stores per
        // partition), but the finalization batch must run — see above
        val gs = gateSession(s, partitions = 2)
        drainToTable(
          gs,
          graft.streaming.EventStreams.clickAttributionOuter(
            eventsStream(gs, dir).filter(col("event_type") === "click"),
            eventsStream(gs, dir).filter(col("event_type") === "purchase")
          ),
          "append"
        ).groupBy("user_id")
          .agg(
            count(lit(1)).as("n_clicks_emitted"),
            count(col("buy_id")).as("n_attributed"),
            sum(when(col("buy_id").isNull, 1L).otherwise(0L)).as("n_orphan"),
            sum(Exact.milli(col("amount"))).as("amount_milli")
          )
          .orderBy("user_id")
      },
      Some("""WITH c AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'),
             p AS (SELECT user_id, ts, event_id, value FROM events
                   WHERE event_type = 'purchase'),
             wm AS (SELECT least((SELECT max(ts) FROM c), (SELECT max(ts) FROM p))
                           - INTERVAL '10 minutes' AS w),
             j AS (SELECT c.user_id, c.ts AS click_ts, c.event_id AS click_id,
                          p.event_id AS buy_id, p.value
                   FROM c LEFT JOIN p
                     ON p.user_id = c.user_id
                    AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL '10 minutes')
        SELECT user_id,
               count(*) AS n_clicks_emitted,
               count(buy_id) AS n_attributed,
               CAST(sum(CASE WHEN buy_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_orphan,
               sum(CAST(round(value*1000) AS BIGINT)) AS amount_milli
        FROM j
        WHERE buy_id IS NOT NULL
           OR click_ts + INTERVAL '10 minutes' < (SELECT w FROM wm)
        GROUP BY 1 ORDER BY 1""")
    ),

    // ------------------------------------------------------------------
    // E15 (streaming, session windows): the events replay through
    // EventStreams.sessionCounts — merging session-window state is the
    // remaining live window shape (tumbling q88, sliding q95); with
    // this one every streaming window family runs through the oracle
    // gate. Oracle = q26's gaps-and-islands restatement per user.
    QueryDef(
      "q109_stream_session",
      (s, dir) => {
        val gs = gateSession(s)
        drainToTable(
          gs,
          graft.streaming.EventStreams.sessionCounts(eventsStream(gs, dir)),
          "complete"
        ).select(col("user_id"), col("session_start"), col("n"))
          .orderBy("user_id", "session_start")
      },
      Some("""SELECT user_id, min(ts) AS session_start, count(*) AS n
        FROM (SELECT user_id, ts,
                     sum(CASE WHEN prev_ts IS NULL
                               OR ts - prev_ts >= INTERVAL '5 minutes' THEN 1 ELSE 0 END)
                       OVER (PARTITION BY user_id ORDER BY ts, event_id) AS grp
              FROM (SELECT user_id, ts, event_id,
                           lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
                    FROM events))
        GROUP BY user_id, grp ORDER BY user_id, session_start""")
    ),

    // ------------------------------------------------------------------
    // E15 (streaming, stream-static join): the events replay enriched
    // against the STATIC customer table (EventStreams.enrichedCounts:
    // broadcast dimension join inside the stream, then windowed counts
    // per market segment) — the standard "stream joins a slowly
    // refreshed dimension" shape, live through the gate.
    QueryDef(
      "q111_stream_enrich",
      (s, dir) => {
        val gs = gateSession(s)
        drainToTable(
          gs,
          graft.streaming.EventStreams.enrichedCounts(
            eventsStream(gs, dir),
            Tables(gs, dir, "customer").select("c_custkey", "c_mktsegment")
          ),
          "complete"
        ).orderBy("bucket_start", "c_mktsegment")
      },
      Some("""SELECT time_bucket(INTERVAL '1 hour', e.ts) AS bucket_start,
            c.c_mktsegment, count(*) AS n
          FROM events e JOIN customer c ON e.user_id = c.c_custkey
          GROUP BY 1, 2 ORDER BY 1, 2""")
    ),

    // ------------------------------------------------------------------
    // E15 (streaming write path): the events replay lands in parquet
    // through the idempotent foreachBatch sink (one batch_id=<n>
    // directory per micro-batch, overwrite mode — the exactly-once
    // file-sink recipe; EventStreams.writeBatch), then the written
    // files are read BACK and aggregated. The oracle aggregates the
    // original table, so a lost, duplicated, or corrupted row in the
    // write→read round-trip breaks the hash. Fresh out/checkpoint dirs
    // per run: a retained checkpoint would mark the input files
    // already-processed and write nothing on rerun.
    QueryDef(
      "q112_stream_sink",
      (s, dir) => {
        val gs = gateSession(s)
        val run = sinkSeq.incrementAndGet()
        val out = new java.io.File(s"target/graft_scratch/stream_sink_$run").getAbsolutePath
        // the counter is per-JVM: an earlier process may have left the
        // same-numbered scratch dirs, and a leftover CHECKPOINT pins
        // the old run's source path and offsets — always start clean
        def wipe(p: String): Unit = {
          def rec(f: java.io.File): Unit = {
            if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rec))
            f.delete(): Unit
          }
          rec(new java.io.File(p))
        }
        wipe(out)
        wipe(s"${out}_ck")
        val q = graft.streaming.EventStreams
          .toIdempotentParquet(
            eventsStream(gs, dir).select("event_id", "event_type", "value"),
            out
          )
          .option("checkpointLocation", s"${out}_ck")
          .trigger(Trigger.AvailableNow())
          .start()
        try q.awaitTermination()
        finally {
          q.stop()
          org.apache.spark.sql.graftshims.StreamingStateHygiene.unloadAllStateStores()
        }
        gs.read
          .parquet(out)
          .groupBy("event_type")
          .agg(
            count(lit(1)).as("n"),
            sum(Exact.milli(col("value"))).as("value_milli")
          )
          .orderBy("event_type")
      },
      Some("""SELECT event_type, count(*) AS n,
            CAST(sum(CAST(round(value*1000) AS BIGINT)) AS BIGINT) AS value_milli
          FROM events GROUP BY 1 ORDER BY 1""")
    ),

    // ------------------------------------------------------------------
    // E15 (streaming, transformWithState): the events replay through
    // the typed arbitrary-state API (EventStreams.RunningTotals:
    // ValueState per user on the RocksDB provider — required by the
    // API and the at-scale store choice). Update mode on a bounded
    // single-batch replay emits one (user_id, n) row per user; the
    // oracle states the same count per user. Only the integer event
    // COUNT goes through the gate: the processor's running double
    // total sums in state-iteration order (order-dependent low bits —
    // pinned by the MemoryStream spec instead). Dedicated session
    // clone: the RocksDB provider conf must not leak into the other
    // gate replays.
    QueryDef(
      "q113_stream_typed_state",
      (s, dir) => {
        val gs = gateSession(s, rocksdb = true)
        import gs.implicits._
        val ev = eventsStream(gs, dir)
          .select("event_id", "ts", "user_id", "event_type", "value")
          .as[graft.streaming.Event]
        drainToTable(
          gs,
          graft.streaming.EventStreams
            .runningTotals(ev)
            .toDF("user_id", "n", "total")
            .select("user_id", "n"),
          "update"
        ).orderBy("user_id")
      },
      Some("""SELECT user_id, CAST(count(*) AS BIGINT) AS n
          FROM events GROUP BY 1 ORDER BY 1""")
    ),

    // ------------------------------------------------------------------
    // E15 (streaming observability): the per-micro-batch
    // StreamingQueryProgress metrics of the q88 tumbling-window gate
    // replay, AS A QUERYABLE TABLE — rows/sec, batch duration, and
    // state-store row counts are what users size clusters and
    // watermarks from. Rows-only (durations and rates are
    // measurements); StreamMetricsSpec pins the deterministic columns
    // (input-row conservation, state rows == open window groups, one
    // stateful operator) and asserts the batch-duration budget.
    QueryDef(
      "q132_stream_metrics",
      (s, dir) => {
        val gs = gateSession(s)
        val (_, progress) = drainWithProgress(
          gs,
          graft.streaming.EventStreams.windowedCounts(eventsStream(gs, dir)),
          "complete"
        )
        progressTable(gs, progress)
      },
      None
    ),

    // ------------------------------------------------------------------
    // E15 × E13 (streaming index ingest): a live embedding stream
    // lands in the PERSISTENT IVF index — each micro-batch is assigned
    // to the existing cells and appended into the partitioned layout
    // via IvfIndex.append (a pure projection + append write; no refit,
    // no shuffle), which is exactly how a serving index tracks a
    // growing corpus: the quantizer never moves under the probes, and
    // ingest cost is O(batch). After the drain, the probe serves the
    // grown corpus — IvfStreamSpec pins the result bit-identical to
    // q139's batch append (same assignment path, same data).
    // Exactly-once caveat, stated plainly: append into the shared cell
    // directories is idempotent only at micro-batch granularity (the
    // checkpoint won't re-run a COMMITTED batch, but a mid-batch crash
    // could leave a partial append). A production deployment lands
    // each batch in its own staging directory (the q112 idempotent
    // recipe) and folds it into the cell layout with the q124-style
    // compaction job, or writes through a transactional table format.
    // Rows-only: KMeans cells are implementation-defined.
    QueryDef(
      "q141_stream_ivf_ingest",
      (s, dir) => {
        val gs = gateSession(s)
        val idx = Similarity.freshIndexDir("ivf_stream")
        val ck = Similarity.freshIndexDir("ivf_stream_ck")
        def emb(df: DataFrame) =
          df.select(col("vec_id"), expr("transform(embedding, x -> cast(x AS double))").as("v"))
            .withColumn("norm", sqrt(expr("aggregate(v, cast(0 AS double), (a, x) -> a + x*x)")))
        val e = emb(gs.read.parquet(s"$dir/embeddings.parquet"))
        val base = e.filter(col("vec_id") % 4 =!= 3)
        val cents = graft.operators.IvfIndex.fitCentroids(base, k = 16, maxIter = 5, seed = 42L)
        graft.operators.IvfIndex.writeLayout(base, cents, idx)

        val schema = gs.read.parquet(s"$dir/embeddings.parquet").schema
        val stream = emb(
          gs.readStream
            .schema(schema)
            .option("pathGlobFilter", "embeddings.parquet")
            .parquet(dir)
        ).filter(col("vec_id") % 4 === 3)
        val q = stream.writeStream
          .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
            graft.operators.IvfIndex.append(batch, idx)
          }
          .option("checkpointLocation", ck)
          .trigger(Trigger.AvailableNow())
          .start()
        try q.awaitTermination()
        finally {
          q.stop()
          org.apache.spark.sql.graftshims.StreamingStateHygiene.unloadAllStateStores()
        }
        graft.operators.IvfIndex.probe(
          gs,
          idx,
          e.filter(col("vec_id") < 10)
            .select(col("vec_id").as("q_id"), col("v").as("qv"), col("norm").as("qn")),
          nprobe = 2,
          topK = 5
        )
      },
      None
    ),

    // ------------------------------------------------------------------
    // E15 × E12 (streaming admission): q146's incremental near-dup
    // check run LIVE over a stream of newly crawled documents — see
    // [[runAdmissionStream]] for the micro-batch-independence contract
    // (arriving docs stage into parquet; verdicts are recomputed over
    // the staged set each batch, so the drained result equals the
    // batch q146 run NO MATTER how the source splits into
    // micro-batches — StreamAdmissionSpec pins that equality under a
    // forced 3-batch replay). The collected rows are admission
    // VERDICTS — pair ids + a score, the same driver-resident scale as
    // every memory-sink gate result, never document bodies. Rows-only
    // here because the oracle already certifies the shared plan
    // through q146; the stream adds only micro-batching, which the
    // spec pins.
    QueryDef(
      "q149_stream_admission",
      (s, dir) => {
        val gs = gateSession(s)
        val corpus = Tables(gs, dir, "documents")
          .select("doc_id", "text")
          .filter(col("doc_id") % 5 =!= 4)
        val schema = gs.read.parquet(s"$dir/documents.parquet").schema
        val stream = gs.readStream
          .schema(schema)
          .option("pathGlobFilter", "documents.parquet")
          .parquet(dir)
          .filter(col("doc_id") % 5 === 4)
          .select("doc_id", "text")
        runAdmissionStream(gs, corpus, stream)
      },
      None
    ),

    // ------------------------------------------------------------------
    // E15 × E13 (streaming index deletes — q141's ingest pattern over
    // the FORGET side of the lifecycle): a live stream of
    // forget-request ids lands in the persistent IVF index via
    // IvfIndex.delete per micro-batch — each batch appends its ids to
    // the tombstone table (request cost: one tiny write, never a
    // cell-file rewrite), and probes hide the forgotten set
    // immediately. This is the GDPR erasure stream a serving
    // deployment actually runs: deletes arrive continuously, the
    // physical rewrite stays a separately-scheduled compaction
    // (IvfIndex.compact, q145). Tombstone appends are naturally
    // idempotent at the PROBE level (the anti-join ignores duplicate
    // ids), so a replayed micro-batch cannot change results — a
    // stronger recovery story than q141's append caveat. Post-drain
    // probe is spec-pinned bit-identical to the batch q145 delete.
    // Rows-only: KMeans cells are implementation-defined.
    QueryDef(
      "q155_stream_ivf_delete",
      (s, dir) => {
        val gs = gateSession(s)
        val idx = Similarity.freshIndexDir("ivf_stream_delete")
        val ck = Similarity.freshIndexDir("ivf_stream_delete_ck")
        def emb(df: DataFrame) =
          df.select(col("vec_id"), expr("transform(embedding, x -> cast(x AS double))").as("v"))
            .withColumn("norm", sqrt(expr("aggregate(v, cast(0 AS double), (a, x) -> a + x*x)")))
        val e = emb(gs.read.parquet(s"$dir/embeddings.parquet"))
        val cents = graft.operators.IvfIndex.fitCentroids(e, k = 16, maxIter = 5, seed = 42L)
        graft.operators.IvfIndex.writeLayout(e, cents, idx)

        val schema = gs.read.parquet(s"$dir/embeddings.parquet").schema
        val forgets = gs.readStream
          .schema(schema)
          .option("pathGlobFilter", "embeddings.parquet")
          .parquet(dir)
          .filter(col("vec_id") % 7 === 0)
          .select("vec_id")
        val q = forgets.writeStream
          .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
            graft.operators.IvfIndex.delete(batch.toDF(), idx)
          }
          .option("checkpointLocation", ck)
          .trigger(Trigger.AvailableNow())
          .start()
        try q.awaitTermination()
        finally {
          q.stop()
          org.apache.spark.sql.graftshims.StreamingStateHygiene.unloadAllStateStores()
        }
        graft.operators.IvfIndex.probe(
          gs,
          idx,
          e.filter(col("vec_id") < 10)
            .select(col("vec_id").as("q_id"), col("v").as("qv"), col("norm").as("qn")),
          nprobe = 2,
          topK = 5
        )
      },
      None
    ),

    // ------------------------------------------------------------------
    // E15 × E5 (streaming sketch): q159's count-min sketch maintained
    // LIVE — each micro-batch of arriving documents reduces to its own
    // ≤ d·w partial counter table (Sketches.counterTable) appended to
    // a staging table; the merged sketch is the (j, b)-sum of the
    // partials. This is the mergeability sketches exist for: partial
    // counter matrices ADD, so the drained result is bit-identical to
    // the one-shot batch sketch under ANY micro-batch split —
    // StreamSketchSpec forces a 3-file/3-batch replay and pins the
    // equality, and the shared q159 oracle certifies the drained
    // output end to end. Per-batch cost is O(batch tokens) + one
    // ≤ d·w write; nothing corpus-scaled ever recomputes.
    QueryDef(
      "q168_stream_count_min",
      (s, dir) => {
        val gs = gateSession(s)
        val schema = gs.read.parquet(s"$dir/documents.parquet").schema
        val stream = gs.readStream
          .schema(schema)
          .option("pathGlobFilter", "documents.parquet")
          .parquet(dir)
        runSketchStream(gs, Tables(gs, dir, "documents"), stream)
      },
      Some(Sketches.cmsOracle)
    ),

    // ------------------------------------------------------------------
    // E15 × E5 (streaming KMV): the q192 distinct-count sketch
    // maintained LIVE over arriving lineitem batches — each micro-batch
    // reduces to its own per-scope bottom-k sketch rows (≤ k rows per
    // scope per batch, Sketches.kmvSketchRows) appended to a staging
    // table; the drained report re-cuts the distinct-union of the
    // partials. This is KMV's mergeability (bottom-k of a union lives
    // inside the union of bottom-ks), so the drained result is
    // bit-identical to the batch sketch under ANY micro-batch split —
    // StreamKmvSpec forces a 3-file/3-batch replay and pins equality
    // with batch q192's sketch columns; the dedicated sketch-only
    // oracle certifies the drained output end to end. Per-batch cost
    // is O(batch) + one ≤ k·scopes write; history never re-read.
    QueryDef(
      "q199_stream_kmv",
      (s, dir) => {
        val gs = gateSession(s)
        val schema = gs.read.parquet(s"$dir/lineitem.parquet").schema
        val stream = gs.readStream
          .schema(schema)
          .option("pathGlobFilter", "lineitem.parquet")
          .parquet(dir)
        runKmvStream(gs, stream)
      },
      Some(Sketches.kmvReportOracle)
    ),

    // ------------------------------------------------------------------
    // E15 × q177 (streaming funnel): the order-sensitive first-touch
    // funnel maintained live over the event stream. Funnel steps are
    // a function of each user's WHOLE history (the first view can
    // arrive after a click that then mustn't count), so this uses the
    // q149 stage-and-recompute contract: batches stage into parquet,
    // counts recompute over the staged set per batch — the drained
    // result equals batch q177 under ANY micro-batch split
    // (StreamFunnelSpec forces a 3-file/3-batch replay), and the
    // shared q177 oracle hash-checks the drained output end to end.
    QueryDef(
      "q179_stream_funnel",
      (s, dir) => {
        val gs = gateSession(s)
        runFunnelStream(gs, eventsStream(gs, dir))
      },
      Some(Extras.funnelOracleSql)
    ),

    // ------------------------------------------------------------------
    // E15 × q176 (streaming inverted-index maintenance): the LAST
    // persisted index gains its live gate — q176's full lifecycle
    // driven by streams instead of batch calls. Two drains against the
    // same layout: the crawl stream appends each micro-batch's
    // postings into the bucket directories (cost O(batch tokens); doc
    // postings are disjoint rows, so no merge and no re-read — the
    // exactly-once caveat is q141's, stated there), then the erasure
    // stream tombstones each batch's doc ids (one tiny write per
    // batch; duplicate ids are idempotent at lookup, q155's stronger
    // recovery story). Compaction stays a separately-scheduled batch
    // maintenance job — exactly how a deployment runs it — folding the
    // accumulated tombstones into the layout before the final lookup.
    // The drained lookup carries q176's oracle: build+ingest+erase+
    // compact is hash-checked end to end, and StreamInvertedSpec pins
    // drained == batch q176 under a forced 3-file/3-batch replay.
    QueryDef(
      "q184_stream_inverted",
      (s, dir) => {
        val gs = gateSession(s)
        val docs = Tables(gs, dir, "documents")
        val schema = gs.read.parquet(s"$dir/documents.parquet").schema
        def docStream =
          gs.readStream
            .schema(schema)
            .option("pathGlobFilter", "documents.parquet")
            .parquet(dir)
        runInvertedMaintenance(
          gs,
          docs.filter(col("doc_id") % 5 =!= 4),
          docStream.filter(col("doc_id") % 5 === 4).select("doc_id", "text"),
          docStream.filter(col("doc_id") % 13 === 0).select("doc_id")
        )
      },
      Some(Retrieval.invertedMaintainOracle)
    ),

    // ------------------------------------------------------------------
    // E15 × E1 (streaming version-store ingest): the lakehouse write
    // path live — each micro-batch of arriving documents commits as a
    // table VERSION (one batch directory + one log entry, O(batch);
    // see [[runVersionedIngest]] for the recovery contract), so the
    // continuous-ingest table keeps full time travel and CDC over its
    // live history. ORACLE-EXACT: the drained head must read back as
    // the base slice plus every streamed document, which the oracle
    // restates as a plain filter of `documents`; StreamVersionedSpec
    // pins a forced 3-batch replay content-equal and diffs v0 → head
    // CDC across the drain.
    QueryDef(
      "q186_stream_versioned",
      (s, dir) => {
        val gs = gateSession(s)
        val docs = Tables(gs, dir, "documents")
        val schema = gs.read.parquet(s"$dir/documents.parquet").schema
        runVersionedIngest(
          gs,
          docs.filter(col("doc_id") % 3 === 0),
          gs.readStream
            .schema(schema)
            .option("pathGlobFilter", "documents.parquet")
            .parquet(dir)
            .filter(col("doc_id") % 3 === 1)
        )
      },
      Some("""SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars
        FROM documents WHERE doc_id % 3 IN (0, 1) ORDER BY doc_id""")
    ),

    // ------------------------------------------------------------------
    // E15 × E1 (streaming CDC apply): the OTHER half of the lakehouse
    // write path — q186 lands append-only batches; this gate lands an
    // UPSERT stream (a re-crawl feed carrying refreshed versions of
    // known documents interleaved with brand-new ones) as one
    // `commitMerge` per micro-batch, the standard CDC-apply loop.
    // Copy-on-write per batch: each merge's touched-file probe is a
    // key-only semi join and only hit files rewrite, so per-batch cost
    // scales with the keys the batch actually names. Batches apply in
    // arrival order — a later batch's version of a key replaces an
    // earlier one's, which is exactly CDC semantics; the fixture's
    // batches carry disjoint keys, so the drained head is
    // split-invariant and shares q185's oracle (StreamMergeSpec pins
    // drained == batch q185 under a forced 3-batch replay).
    QueryDef(
      "q189_stream_merge",
      (s, dir) => {
        val gs = gateSession(s)
        val docs = Tables(gs, dir, "documents")
        val schema = gs.read.parquet(s"$dir/documents.parquet").schema
        val src = gs.readStream
          .schema(schema)
          .option("pathGlobFilter", "documents.parquet")
          .parquet(dir)
        runMergeStream(
          gs,
          Similarity.freshIndexDir("versioned_merge_stream"),
          docs.filter(col("doc_id") % 3 === 0),
          src
            .filter(col("doc_id") % 6 === 0)
            .withColumn("lang", lit("xx"))
            .withColumn("n_chars", col("n_chars") + 7)
            .unionByName(src.filter(col("doc_id") % 3 === 1))
        )
      },
      Some(Versioned.mergeOracle)
    ),

    // ------------------------------------------------------------------
    // E15 × E12 (streaming index-served admission — the BOUNDED
    // production loop q149's stage-and-recompute honestly isn't): each
    // micro-batch is admitted against the persisted ShingleIndex and
    // then FOLDED IN (append = rows + one df segment, O(batch)), so
    // per-batch cost never grows with history and the corpus text is
    // never re-shingled. The semantics are the order-sensitive online
    // ones a deployment actually wants — batch N's verdicts see every
    // earlier batch as corpus — which under the registered single-file
    // drain coincide exactly with the one-shot q146 definition, so the
    // shared oracle certifies the index-served path end to end;
    // StreamIndexAdmissionSpec pins the multi-batch case against a
    // sequential admit-then-fold reference recompute.
    QueryDef(
      "q191_stream_index_admission",
      (s, dir) => {
        val gs = gateSession(s)
        val docs = Tables(gs, dir, "documents").select("doc_id", "text")
        val schema = gs.read.parquet(s"$dir/documents.parquet").schema
        runIndexAdmissionStream(
          gs,
          docs.filter(col("doc_id") % 5 =!= 4),
          gs.readStream
            .schema(schema)
            .option("pathGlobFilter", "documents.parquet")
            .parquet(dir)
            .filter(col("doc_id") % 5 === 4)
            .select("doc_id", "text")
        )
      },
      Some(Dedup.admissionOracle)
    ),

    // ------------------------------------------------------------------
    // E15 × governance (streaming erasure propagation — q202's
    // workflow as a deployment actually runs it): a LIVE stream of
    // right-to-be-forgotten requests drives, per micro-batch, one
    // copy-on-write delete commit whose CDC (the store's confirmation
    // of what actually held data, not the raw request) tombstones BOTH
    // persisted indexes — inverted postings and the near-dup admission
    // index, whose delete writes the negative df segment so document
    // frequencies stay exact between compactions. Compaction folds
    // everything after the drain. Erasure is a set union, so the
    // drained state is independent of the request batching
    // (StreamErasureSpec forces a 3-batch replay); the oracle restates
    // the full evidence table — census, keyword lookups, admission
    // index row/df totals — over the corpus minus every forgotten
    // subject, so one subject resurfacing through ANY path breaks the
    // hash. ORACLE-EXACT.
    QueryDef(
      "q206_stream_erasure",
      (s, dir) => {
        val gs = gateSession(s)
        val docs = Tables(gs, dir, "documents")
        val schema = gs.read.parquet(s"$dir/documents.parquet").schema
        runErasureStream(
          gs,
          docs.filter(col("doc_id") % 2 === 0),
          gs.readStream
            .schema(schema)
            .option("pathGlobFilter", "documents.parquet")
            .parquet(dir)
            .filter(col("doc_id") % 2 === 0 && col("doc_id") % 17 === 2)
            .select("doc_id")
        )
      },
      Some("""WITH corpus AS (
          SELECT * FROM documents WHERE doc_id % 2 = 0 AND doc_id % 17 <> 2
        ), toks AS (
          SELECT doc_id, tok, count(*) AS tf
          FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM corpus)
          WHERE len(tok) > 0 GROUP BY 1, 2
        ), shtok AS (
          SELECT doc_id, string_split(text, ' ') AS ws FROM corpus
          WHERE len(string_split(text, ' ')) >= 3
        ), sh AS (
          SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS g
          FROM (SELECT doc_id, ws, unnest(range(1, len(ws)-1)) AS i FROM shtok)
        ), rows AS (
          SELECT 'census' AS kind, lang AS k, CAST(count(*) AS BIGINT) AS v
          FROM corpus GROUP BY lang
          UNION ALL
          SELECT 'lookup', CAST(doc_id AS VARCHAR), CAST(sum(tf) AS BIGINT)
          FROM toks WHERE tok IN ('spark', 'join')
          GROUP BY doc_id HAVING count(DISTINCT tok) = 2
          UNION ALL
          SELECT 'shingle', 'rows', count(*) FROM sh
          UNION ALL
          SELECT 'shingle', 'df_total', count(*) FROM sh)
        SELECT kind, k, v FROM rows ORDER BY kind, k, v""")
    ),

    // ------------------------------------------------------------------
    // E15 × E1 (streaming merge-on-read deletes): the delete-queue
    // shape at 100 TB — every micro-batch of takedown/erasure ids
    // commits as ONE deletion vector (O(matched) positions written,
    // zero data files touched, where q206's copy-on-write loop pays a
    // file rewrite per batch), and one post-drain compactMor folds the
    // accumulated vectors in a single rewrite. The drained head is
    // batching-independent (deletes are a set union) and the oracle
    // restates it over `documents` minus the streamed ids; the
    // compaction being a logical no-op is certified by q208's oracle
    // and MorSpec. ORACLE-EXACT; StreamMorSpec pins the 3-batch
    // replay, the one-DV-commit-per-batch version history, and the
    // untouched data layout before the fold.
    QueryDef(
      "q210_stream_mor_delete",
      (s, dir) => {
        val gs = gateSession(s)
        val docs = Tables(gs, dir, "documents")
        val schema = gs.read.parquet(s"$dir/documents.parquet").schema
        runMorDeleteStream(
          gs,
          Similarity.freshIndexDir("mor_stream_store"),
          docs,
          gs.readStream
            .schema(schema)
            .option("pathGlobFilter", "documents.parquet")
            .parquet(dir)
            .filter(col("doc_id") % 19 === 5)
            .select("doc_id")
        )
      },
      Some("""SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars
        FROM documents WHERE doc_id % 19 <> 5 ORDER BY doc_id""")
    ),

    // ------------------------------------------------------------------
    // E15 × E1/E11 (streaming feed-view maintenance): the live rollup
    // loop q216 runs in batch — each micro-batch lands as one append
    // COMMIT and the feed view syncs to the new safe head in the same
    // tick, so the per-lang aggregate is never more than one batch
    // behind the table and each sync costs the BATCH's rows (the view
    // never re-reads the source). After the drain a takedown delete
    // lands and the final sync RETRACTS it from the rollup — the
    // correction path a watermark-windowed streaming agg can't
    // express (arbitrarily old rows leave the aggregate exactly).
    // Append order never affects a census, so the drained view is
    // split-invariant; ORACLE-EXACT (per-lang count + char mass over
    // base ∪ streamed minus the takedown). StreamFeedViewSpec pins a
    // forced 3-batch replay equal, one sync commit per batch, and
    // view == direct aggregate mid-drain.
    QueryDef(
      "q219_stream_feed_view",
      (s, dir) => {
        val gs = gateSession(s)
        val docs = Tables(gs, dir, "documents")
        val schema = gs.read.parquet(s"$dir/documents.parquet").schema
        runFeedViewStream(
          gs,
          Similarity.freshIndexDir("feedview_stream_src"),
          Similarity.freshIndexDir("feedview_stream_view"),
          docs.filter(col("doc_id") % 3 === 0).select("doc_id", "lang", "n_chars"),
          gs.readStream
            .schema(schema)
            .option("pathGlobFilter", "documents.parquet")
            .parquet(dir)
            .filter(col("doc_id") % 3 === 1)
            .select("doc_id", "lang", "n_chars")
        )
      },
      Some("""SELECT lang AS k, CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(n_chars) AS BIGINT) AS sum_val
        FROM documents
        WHERE doc_id % 3 IN (0, 1) AND doc_id % 11 <> 4
        GROUP BY lang ORDER BY k""")
    ),

    // ------------------------------------------------------------------
    // E15 × E1/E11/E12 (streaming sample-view maintenance): q232's
    // governed inspection sample kept live — each micro-batch lands as
    // one append COMMIT and the sample syncs to the new safe head in
    // the same tick (each sync O(batch + buf × touched groups); the
    // source is never re-scanned after init). Pure-insert folds are
    // min-merge associative, so the drained sample is SPLIT-INVARIANT
    // — bit-equal to the from-scratch bottom-buf of base ∪ streamed
    // regardless of how the stream batched (StreamSampleViewSpec pins
    // a forced 3-batch replay). After the drain an erasure delete
    // lands and the final sync RETRACTS the erased members — groups
    // under-fill rather than refilling from once-evicted rows, the
    // governance contract inspection samples owe. ORACLE-EXACT: the
    // associativity collapses the replay to two SQL steps (bottom-buf
    // of the union, minus the erased keys, re-ranked to k).
    QueryDef(
      "q233_stream_sample_view",
      (s, dir) => {
        val gs = gateSession(s)
        val docs = Tables(gs, dir, "documents")
        val schema = gs.read.parquet(s"$dir/documents.parquet").schema
        runSampleViewStream(
          gs,
          Similarity.freshIndexDir("sampleview_stream_src"),
          Similarity.freshIndexDir("sampleview_stream_view"),
          docs.filter(col("doc_id") % 3 === 0).select("doc_id", "lang", "n_chars"),
          gs.readStream
            .schema(schema)
            .option("pathGlobFilter", "documents.parquet")
            .parquet(dir)
            .filter(col("doc_id") % 3 === 1)
            .select("doc_id", "lang", "n_chars")
        )
      },
      Some("""WITH u AS (
          SELECT lang AS grp, CAST(doc_id AS VARCHAR) AS key,
                 CAST(n_chars AS BIGINT) AS val, md5(CAST(doc_id AS VARCHAR)) AS h
          FROM documents WHERE doc_id % 3 IN (0, 1)),
        s1 AS (SELECT grp, key, val, h FROM (
            SELECT grp, key, val, h,
                   row_number() OVER (PARTITION BY grp ORDER BY h, key) AS rn FROM u)
          WHERE rn <= 8),
        s2 AS (SELECT * FROM s1 WHERE CAST(key AS BIGINT) % 11 <> 4),
        ranked AS (
          SELECT grp, key, val,
                 row_number() OVER (PARTITION BY grp ORDER BY h, key) AS rn FROM s2)
        SELECT grp, CAST(rn AS BIGINT) AS rn, key, val
        FROM ranked WHERE rn <= 5 ORDER BY grp, rn""")
    ),

    // ------------------------------------------------------------------
    // E15 × E1/E13 (streaming as-of index maintenance): q234's
    // time-travel-consistent text search over a table BUILT LIVE —
    // one append commit + one index sync per micro-batch (sync
    // O(batch tokens), idempotent by overwrite: a replayed batch
    // rewrites its own segment instead of duplicating postings), then
    // a post-drain erasure whose sync tombstones the forgotten docs
    // at their version. The output probes EVERY version of the
    // streamed history: v0 = the base corpus, v1 = base ∪ the
    // streamed batch, v2 = minus the erased docs — each answered from
    // ONE index. ORACLE-EXACT: DuckDB re-derives all three states'
    // conjunctive hits; a posting leaking across versions (the
    // streaming-index failure mode) breaks the hash.
    QueryDef(
      "q251_stream_asof_search",
      (s, dir) => {
        val gs = gateSession(s)
        val docs = Tables(gs, dir, "documents")
        val schema = gs.read.parquet(s"$dir/documents.parquet").schema
        runAsOfSearchStream(
          gs,
          Similarity.freshIndexDir("asof_stream_src"),
          Similarity.freshIndexDir("asof_stream_idx"),
          docs.filter(col("doc_id") % 3 === 0).select("doc_id", "text"),
          gs.readStream
            .schema(schema)
            .option("pathGlobFilter", "documents.parquet")
            .parquet(dir)
            .filter(col("doc_id") % 3 =!= 0)
            .select("doc_id", "text")
        )
      },
      Some("""WITH s0 AS (SELECT doc_id, text FROM documents WHERE doc_id % 3 = 0),
        s1 AS (SELECT doc_id, text FROM documents),
        s2 AS (SELECT * FROM s1 WHERE doc_id % 13 <> 0),
        states AS (
          SELECT 0 AS v, * FROM s0 UNION ALL SELECT 1, * FROM s1
          UNION ALL SELECT 2, * FROM s2),
        toks AS (
          SELECT v, doc_id, tok, count(*) AS tf
          FROM (SELECT v, doc_id, unnest(string_split(text, ' ')) AS tok FROM states)
          WHERE len(tok) > 0 GROUP BY 1, 2, 3)
        SELECT CAST(v AS BIGINT) AS v, doc_id, CAST(sum(tf) AS BIGINT) AS score
        FROM toks WHERE tok IN ('spark', 'join')
        GROUP BY v, doc_id HAVING count(DISTINCT tok) = 2
        ORDER BY v, doc_id""")
    ),

    // ------------------------------------------------------------------
    // E15 × E1/E11 (streaming JOIN-view maintenance): q228's delta-join
    // IVM kept live — the one IVM surface that still lacked its gate
    // twin. Each micro-batch of fact rows lands as ONE append commit on
    // A and the view syncs the exact two-term delta (ΔA⋈B@head +
    // A@cursor⋈ΔB) in the same tick. After the drain the DIMENSION
    // side moves — an en payload update plus a LATE-ARRIVING zh join
    // key (the view must grow rows for docs it streamed long before) —
    // and a fact takedown lands; the final sync folds all three in one
    // merge commit, with the retraction algebra netting the
    // delete×update overlap to zero before the merge sees it. Inner
    // joins of weighted multiplicities are batch-order-independent, so
    // the drained view is split-invariant (StreamJoinViewSpec pins the
    // forced 3-batch replay AND that the broadcast and co-partitioned
    // SMJ delta regimes drain bit-equal). ORACLE-EXACT: the final
    // A@head ⋈ B@head restated over `documents`.
    QueryDef(
      "q253_stream_join_view",
      (s, dir) => {
        val gs = gateSession(s)
        val docs = Tables(gs, dir, "documents")
        val schema = gs.read.parquet(s"$dir/documents.parquet").schema
        runJoinViewStream(
          gs,
          Similarity.freshIndexDir("joinview_stream_a"),
          Similarity.freshIndexDir("joinview_stream_b"),
          Similarity.freshIndexDir("joinview_stream_view"),
          docs.filter(col("doc_id") % 3 === 0).select("doc_id", "lang", "n_chars"),
          docs,
          gs.readStream
            .schema(schema)
            .option("pathGlobFilter", "documents.parquet")
            .parquet(dir)
            .filter(col("doc_id") % 3 === 1)
            .select("doc_id", "lang", "n_chars")
        )
      },
      Some("""SELECT lang, doc_id, n_chars,
               CAST(1000 + ascii(substr(lang, 2, 1))
                    + CASE WHEN lang = 'en' THEN 7 ELSE 0 END AS BIGINT) AS w,
               CAST(1 AS BIGINT) AS mult
        FROM documents
        WHERE doc_id % 3 IN (0, 1) AND doc_id % 11 <> 4 AND lang <> 'de'
        ORDER BY doc_id""")
    ),

    // ------------------------------------------------------------------
    // E15 × E14 (streaming CUSUM drift screen): q258's changepoint
    // detector run live. CUSUM is a WHOLE-HISTORY statistic — the
    // target is the all-days mean, the score is a prefix-min identity
    // over the full series, and the alarm is the first crossing — so
    // per-batch incremental updates would be order-wrong; the gate
    // stages each micro-batch (one append, O(batch)) and recomputes
    // the day-scaled detector over the staged set after the drain
    // (the q179 funnel contract). Recompute cost is the daily rollup,
    // O(staged events) with a days×types-scaled window — the honest
    // price of a statistic with no incremental form. Drained output
    // hash-checks against the SAME SQL as batch q258, so the gate is
    // split-invariant by construction.
    QueryDef(
      "q268_stream_cusum",
      (s, dir) => {
        val gs = gateSession(s)
        val schema = gs.read.parquet(s"$dir/events.parquet").schema
        runCusumStream(
          gs,
          gs.readStream
            .schema(schema)
            .option("pathGlobFilter", "events.parquet")
            .parquet(dir)
            .select("event_type", "ts")
        )
      },
      Some(Extras.cusumOracleSql)
    ),

    // ------------------------------------------------------------------
    // E15 × E5/E7 (streaming retention cohorts): q257's cohort matrix
    // live. Cohort membership is WHOLE-HISTORY (a user's cohort is
    // their global first-activity day — a later batch can only move it
    // EARLIER, retroactively re-attributing every prior cell), so the
    // gate stages each micro-batch and recomputes post-drain, the
    // q179/q268 contract. Drained output hash-checks against the SAME
    // SQL as batch q257 — split-invariant by construction.
    QueryDef(
      "q274_stream_cohort",
      (s, dir) => {
        val gs = gateSession(s)
        val schema = gs.read.parquet(s"$dir/events.parquet").schema
        runCohortStream(
          gs,
          gs.readStream
            .schema(schema)
            .option("pathGlobFilter", "events.parquet")
            .parquet(dir)
            .select("user_id", "ts")
        )
      },
      Some(Extras.cohortOracleSql)
    ),

    // ------------------------------------------------------------------
    // E15 × q282 (streaming covering-index maintenance, round 14): the
    // CDC-maintained covering index driven live — each micro-batch
    // commits to the versioned table and the index syncs its window
    // (one O(batch) fold into one LSM segment); after the drain an
    // update and an erasure land and the final sync folds both. The
    // drained point lookups and census are served from the INDEX alone
    // (the in-query require from q282 carries over via the shared
    // read path) and hash-check against the same final-state oracle
    // a batch build would produce; StreamCoveringSpec pins a forced
    // 3-batch replay equal to the single-batch run (per-window folds
    // compose because latest-wins is associative across segments).
    QueryDef(
      "q286_stream_covering_index",
      (s, dir) => {
        val gs = gateSession(s)
        val docs = Tables(gs, dir, "documents")
        val schema = gs.read.parquet(s"$dir/documents.parquet").schema
        runCoveringIndexStream(
          gs,
          docs.filter(col("doc_id") % 2 === 0).select("doc_id", "lang", "n_chars"),
          gs.readStream
            .schema(schema)
            .option("pathGlobFilter", "documents.parquet")
            .parquet(dir)
            .filter(col("doc_id") % 2 === 1)
            .select("doc_id", "lang", "n_chars")
        )
      },
      Some("""WITH final AS (
          SELECT doc_id, lang,
                 CAST(n_chars + CASE WHEN lang = 'zh' THEN 1000 ELSE 0 END AS BIGINT)
                   AS n_chars
          FROM documents WHERE doc_id % 7 <> 5)
        SELECT probe, doc_id, lang, n_chars FROM (
          SELECT 'lookup' AS probe, doc_id, lang, n_chars FROM final
          WHERE doc_id IN (3, 10, 35, 77, 110, 154, 231, 308, 385, 462)
          UNION ALL
          SELECT 'census', count(*), lang, CAST(sum(n_chars) AS BIGINT)
          FROM final GROUP BY lang)
        ORDER BY probe, doc_id, lang""")
    ),

    // ------------------------------------------------------------------
    // E15 × q283 (streaming write-audit-publish, round 14): the WAP
    // gate live — every micro-batch COMMITS to the table (a real
    // version), is AUDITED post-write, and the catalog pin advances
    // ONLY for clean batches; a batch carrying planted defects lands
    // as an unpublished version that catalog-routed readers provably
    // never see, and the post-drain remediation (delete the defective
    // rows at the head) re-audits and publishes. Whatever the source
    // split, the same defect rows exist and the same remediation
    // removes them, so the drained published state is split-invariant
    // (StreamWapSpec forces a 3-batch replay: each held batch stays
    // unpublished while any clean batch publishes around it — the
    // ship-what-passed semantics WAP exists for).
    QueryDef(
      "q293_stream_wap",
      (s, dir) => {
        val gs = gateSession(s)
        val docs = Tables(gs, dir, "documents")
        val schema = gs.read.parquet(s"$dir/documents.parquet").schema
        runWapStream(
          gs,
          docs.filter(col("doc_id") % 3 === 0).select("doc_id", "lang", "n_chars"),
          gs.readStream
            .schema(schema)
            .option("pathGlobFilter", "documents.parquet")
            .parquet(dir)
            .filter(col("doc_id") % 3 =!= 0)
            .select("doc_id", "lang", "n_chars")
        )
      },
      Some("""SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars
        FROM documents
        WHERE NOT (doc_id % 3 <> 0 AND doc_id % 13 = 4)
        ORDER BY doc_id""")
    ),

    // ------------------------------------------------------------------
    // E15 × q275 (streaming bitmap-index maintenance, round 14): the
    // q184 inverted-index pattern applied to the bitmap index — the
    // crawl stream lands each micro-batch as one OR-mergeable segment
    // (O(batch); existing segments never read), the erasure stream
    // lands each batch as one segment-versioned delete mask (a set
    // union — request-scaled, idempotent), and compaction stays the
    // separately-scheduled batch job, folding everything before the
    // final census. Split-invariance is BY CONSTRUCTION: appends are
    // disjoint key bits folded by bit_or (associative/commutative) and
    // masks a bit union, so the folded words are identical under any
    // micro-batch split — StreamBitmapSpec pins drained == batch q275
    // under a forced 3-file/3-batch replay, and the drained census
    // carries q275's oracle end to end.
    QueryDef(
      "q279_stream_bitmap",
      (s, dir) => {
        val gs = gateSession(s)
        val docs = Tables(gs, dir, "documents")
        val schema = gs.read.parquet(s"$dir/documents.parquet").schema
        def docStream =
          gs.readStream
            .schema(schema)
            .option("pathGlobFilter", "documents.parquet")
            .parquet(dir)
        runBitmapMaintenance(
          gs,
          docs.filter(col("doc_id") % 2 === 0).select("doc_id", "lang"),
          docStream.filter(col("doc_id") % 2 === 1).select("doc_id", "lang"),
          docStream.filter(col("doc_id") % 7 === 3).select("doc_id")
        )
      },
      Some(Views.bitmapMaintainOracle)
    ),

    // ------------------------------------------------------------------
    // E15 × q289 (streaming SCD2, round 14): the type-2 dimension
    // projected from a table that was BUILT live — the crawl drains
    // as per-batch insert commits, the post-drain maintenance window
    // (zh update, erasure, en update) lands exactly q289's three
    // commits, and the same one-window-pass projection reconstructs
    // every key's validity intervals from the full commit log. Commit
    // NUMBERS depend on how the source split, so the output maps them
    // to the split-invariant epoch coordinate: every drain commit is
    // epoch 0 (a pure-insert drain of disjoint keys opens intervals
    // and closes none), the k-th maintenance commit is epoch k — under
    // any micro-batching the remapped intervals are IDENTICAL, and the
    // drained output shares q289's closed-form oracle verbatim
    // (StreamScd2Spec pins a forced 3-batch replay == the single-
    // commit batch build).
    QueryDef(
      "q299_stream_scd2",
      (s, dir) => {
        val gs = gateSession(s)
        val schema = gs.read.parquet(s"$dir/documents.parquet").schema
        runScd2Stream(
          gs,
          gs.readStream
            .schema(schema)
            .option("pathGlobFilter", "documents.parquet")
            .parquet(dir)
            .select("doc_id", "lang", "n_chars")
        )
      },
      Some(Versioned.scd2OracleSql)
    ),

    // ------------------------------------------------------------------
    // E15 × q301 (streaming moments sketch, round 14): the mergeable-
    // by-addition property driven live — every micro-batch reduces to
    // ≤ |types| partial power-sum rows (the sketch state), the store
    // accumulates partials, and the drained merge + shape derivation
    // hash-matches q301's batch SQL. Split-invariance is BY ALGEBRA:
    // integer sums are associative/commutative, so any micro-batching
    // of the source folds to the identical five integers per type
    // (StreamMomentsSpec pins a forced 3-batch replay == q301).
    QueryDef(
      "q302_stream_moments",
      (s, dir) => {
        val gs = gateSession(s)
        val schema = gs.read.parquet(s"$dir/events.parquet").schema
        runMomentsStream(
          gs,
          gs.readStream
            .schema(schema)
            .option("pathGlobFilter", "events.parquet")
            .parquet(dir)
            .select("event_type", "value")
        )
      },
      Some(Sketches.momentsOracleSql)
    ),

    // ------------------------------------------------------------------
    // E15 × q297 (streaming branch workflow, round 14): the whole
    // crawl-ingest pipeline runs ON A BRANCH — every micro-batch
    // commits to the shared table log and advances only the BRANCH
    // pin; main's head is REQUIREd untouched inside every single
    // batch (the isolation guarantee, checked live, not post-hoc).
    // After the drain an erasure lands on the branch and the audited
    // whole-workflow result merges to main as ONE atomic snapshot
    // (fast-forward — main never moved). Whatever the source split,
    // main history is exactly two snapshots: the pre-branch base and
    // the merged final state — split-invariant by construction, and
    // the ORACLE restates both as plain filters of `documents`.
    QueryDef(
      "q306_stream_branch",
      (s, dir) => {
        val gs = gateSession(s)
        val docs = Tables(gs, dir, "documents")
        val schema = gs.read.parquet(s"$dir/documents.parquet").schema
        runBranchStream(
          gs,
          docs.filter(col("doc_id") % 2 === 0).select("doc_id", "lang", "n_chars"),
          gs.readStream
            .schema(schema)
            .option("pathGlobFilter", "documents.parquet")
            .parquet(dir)
            .filter(col("doc_id") % 2 === 1)
            .select("doc_id", "lang", "n_chars")
        )
      },
      Some("""WITH snaps AS (
          SELECT 0 AS snap, doc_id, n_chars FROM documents WHERE doc_id % 2 = 0
          UNION ALL
          SELECT 1, doc_id, n_chars FROM documents WHERE doc_id % 7 <> 5)
        SELECT CAST(snap AS BIGINT) AS snap, count(*) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS sum_chars
        FROM snaps GROUP BY snap ORDER BY snap""")
    ),

    // ------------------------------------------------------------------
    // E15 × q300 (streaming DP release, round 14): the governed
    // release over a LIVE-ingested event log. Contribution bounding
    // is whole-history (a user's presence clamp and per-user cap span
    // batches), so this is a stage-and-recompute gate like q274's
    // cohorts: batches land in the store, the release recomputes over
    // everything staged. The noise is seed-deterministic, so the
    // drained release shares q300's oracle under any split.
    QueryDef(
      "q309_stream_dp",
      (s, dir) => {
        val gs = gateSession(s)
        val schema = gs.read.parquet(s"$dir/events.parquet").schema
        runDpStream(
          gs,
          gs.readStream
            .schema(schema)
            .option("pathGlobFilter", "events.parquet")
            .parquet(dir)
            .select("user_id", "event_type")
        )
      },
      Some(Corpus.dpOracleSql)
    ),

    // ------------------------------------------------------------------
    // E15 × q316 (streaming exact quantiles, round 15): the exact
    // global percentiles computed over a LIVE stream with MERGEABLE
    // state — each micro-batch reduces to its per-user partial cent
    // sums (one O(batch) aggregate appended to the store; never raw
    // rows), and the drained answer re-aggregates the partials and
    // runs the shared distributed-rank body. Split-invariant because
    // per-user sums are associative: however the stream splits, each
    // user's total — and therefore every rank and every percentile —
    // is identical to the batch run's. Shares q316's oracle.
    QueryDef(
      "q318_stream_quantiles",
      (s, dir) => {
        val gs = gateSession(s)
        val schema = gs.read.parquet(s"$dir/events.parquet").schema
        runQuantilesStream(
          gs,
          gs.readStream
            .schema(schema)
            .option("pathGlobFilter", "events.parquet")
            .parquet(dir)
            .select("user_id", "event_type", "value")
        )
      },
      Some(Extras.exactQuantilesOracleSql)
    ),

    // ------------------------------------------------------------------
    // CHANGE FEED AS A STREAMING SOURCE (round 16): q216's incremental
    // aggregate view, driven by a GENUINE Structured Streaming source
    // over the version store's `_cdf` + commit log
    // (graft.streaming.CdfSourceProvider) instead of hand-polled feed
    // windows — the read side that completes the store's streaming
    // loop, Delta's readChangeFeed shape. One offset = one committed
    // version; maxVersionsPerBatch=1 rate-limits the drain to one
    // commit per micro-batch (REQUIREd from the query's own progress
    // records), and each batch folds through FeedView.foldEvents —
    // the SAME fold body as the batch sync, idempotent under replay
    // because the cursor rides inside the fold's merge commit. The
    // history crosses append, CoW delete, update, and MOR delete;
    // shares q216's oracle, so a window the source dropped, split
    // mid-commit, or double-delivered breaks the hash. ORACLE-EXACT;
    // CdfSourceSpec pins restart-from-checkpoint continuity and
    // replay idempotence.
    QueryDef(
      "q321_cdf_stream_feed_view",
      (s, dir) => {
        val gs = gateSession(s)
        runCdfFeedViewStream(gs, dir)
      },
      Some("""SELECT lang AS k, CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(CASE WHEN lang = 'zh' THEN n_chars + 1000 ELSE n_chars END) AS BIGINT)
                 AS sum_val
        FROM documents
        WHERE doc_id % 3 = 0 AND doc_id % 5 <> 0 AND doc_id % 7 <> 3
        GROUP BY lang ORDER BY k""")
    )
  )

  /** q316's exact quantiles driven live: per-batch per-user partial
    * cent sums (the mergeable state — O(batch users) per batch),
    * re-aggregated at drain and ranked by the shared distributed-rank
    * body. */
  private[graft] def runQuantilesStream(gs: SparkSession, stream: DataFrame): DataFrame = {
    val staging = Similarity.freshIndexDir("quant_staging")
    // foreachBatch is at-least-once: a batch replayed after a post-write
    // failure must REWRITE its own partials, not append them twice (a
    // blind append would double-count the replayed users' spend and
    // shift every quantile). Each batch therefore lands in its own
    // batch_id=<n> directory with overwrite mode — the idempotent
    // file-sink recipe every other staged gate here uses
    // (EventStreams.writeBatch).
    val q = stream.writeStream
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
          graft.streaming.EventStreams.writeBatch(
            batch
              .toDF()
              .groupBy("user_id")
              .agg(Extras.purchaseCents.as("px")),
            batchId,
            staging
          )
      }
      .option("checkpointLocation", Similarity.freshIndexDir("quant_stream_ck"))
      .trigger(Trigger.AvailableNow())
      .start()
    try q.awaitTermination()
    finally {
      q.stop()
      org.apache.spark.sql.graftshims.StreamingStateHygiene.unloadAllStateStores()
    }
    Extras.exactQuantiles(
      gs.read
        .parquet(staging)
        .groupBy("user_id")
        .agg(sum("px").as("x"))
    )
  }

  /** q216's feed-view fixture driven through the CDF STREAMING SOURCE:
    * the same commit history (append, CoW delete, update, MOR delete),
    * the same per-lang rollup — but the feed windows arrive as
    * micro-batches from `readStream.format(CdfSourceProvider)`, one
    * commit per batch (maxVersionsPerBatch = 1), each folded by
    * [[graft.operators.FeedView.foldEvents]]. The drain REQUIREs the
    * rate limit actually held: exactly 4 data-carrying micro-batches
    * for the 4 post-init commits. */
  private[graft] def runCdfFeedViewStream(gs: SparkSession, dir: String): DataFrame = {
    import graft.operators.{FeedView, TableVersions}
    val src = Similarity.freshIndexDir("cdfsrc_store")
    val view = Similarity.freshIndexDir("cdfsrc_view")
    // a THIRD of the corpus: the gate exercises the source's windowing
    // and fold machinery, whose cost is per-commit, not per-row — the
    // full-corpus fixture bought nothing but bench wall-time
    val docs = Tables(gs, dir, "documents")
      .filter(col("doc_id") % 3 === 0)
      .select(col("doc_id"), col("lang"), col("n_chars"))
    TableVersions.commitAppend(docs.filter(col("doc_id") % 2 === 0).repartition(4), src) // v0
    FeedView.init(gs, src, view, "lang", "n_chars") // cursor = 0
    TableVersions.commitAppend(docs.filter(col("doc_id") % 2 === 1), src) // v1
    TableVersions.commitDelete(gs, src, "doc_id % 5 = 0") // v2
    TableVersions.commitUpdate(
      gs,
      src,
      "lang = 'zh'",
      _.withColumn("n_chars", col("n_chars") + 1000)
    ) // v3
    TableVersions.commitDeleteMor(gs, src, "doc_id % 7 = 3") // v4
    val stream = gs.readStream
      .format("graft.streaming.CdfSourceProvider")
      .option("path", src)
      .option("startingVersion", "0") // the init snapshot's version
      .option("maxVersionsPerBatch", "1")
      .load()
    val q = stream.writeStream
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          if (!batch.isEmpty) {
            val upTo = batch.agg(max(col("_commit_version"))).head().getLong(0)
            FeedView.foldEvents(gs, view, batch.toDF(), "lang", "n_chars", upTo): Unit
          }
      }
      .option("checkpointLocation", Similarity.freshIndexDir("cdfsrc_ck"))
      .trigger(Trigger.AvailableNow())
      .start()
    try q.awaitTermination()
    finally {
      q.stop()
      org.apache.spark.sql.graftshims.StreamingStateHygiene.unloadAllStateStores()
    }
    val dataBatches = q.recentProgress.count(_.numInputRows > 0)
    require(
      dataBatches == 4,
      s"maxVersionsPerBatch=1 must drain the 4 commits as 4 micro-batches, saw $dataBatches"
    )
    require(FeedView.cursor(gs, view) == 4L, "stream drain must leave the cursor at v4")
    FeedView.read(gs, view).orderBy("k")
  }

  /** q234's as-of index driven live: one append commit + one index
    * sync per micro-batch (each sync O(batch tokens), idempotent by
    * overwrite — a replayed batch rewrites its own segment), then a
    * post-drain erasure delete whose sync tombstones the forgotten
    * docs AT THEIR VERSION. Returns conjunctive probes AS OF every
    * version of the streamed history — time-travel-consistent search
    * over a table that was built live. */
  private[graft] def runAsOfSearchStream(
      gs: SparkSession,
      srcDir: String,
      idxDir: String,
      base: DataFrame,
      stream: DataFrame
  ): DataFrame = {
    graft.operators.TableVersions.commitAppend(base, srcDir)
    graft.operators.AsOfIndex.init(gs, srcDir, idxDir)
    val q = stream.writeStream
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          graft.operators.TableVersions.commitAppend(batch.toDF(), srcDir): Unit
          graft.operators.AsOfIndex.sync(gs, srcDir, idxDir): Unit
      }
      .option("checkpointLocation", Similarity.freshIndexDir("asof_stream_ck"))
      .trigger(Trigger.AvailableNow())
      .start()
    try q.awaitTermination()
    finally {
      q.stop()
      org.apache.spark.sql.graftshims.StreamingStateHygiene.unloadAllStateStores()
    }
    graft.operators.TableVersions.commitDelete(gs, srcDir, "doc_id % 13 = 0")
    graft.operators.AsOfIndex.sync(gs, srcDir, idxDir)
    val head = graft.operators.TableVersions.currentVersion(gs, srcDir)
    (0L to head)
      .map(v =>
        graft.operators.AsOfIndex
          .conjunctiveAsOf(gs, idxDir, Seq("spark", "join"), v)
          .select(lit(v).as("v"), col("doc_id"), col("score"))
      )
      .reduce(_ unionByName _)
      .orderBy("v", "doc_id")
  }

  /** q228's delta-join view driven live: one fact append commit + one
    * view sync per micro-batch; after the drain the dimension updates,
    * a late join key arrives, and a fact takedown lands — all folded
    * by the final sync. `broadcastMaxRows` selects the delta-join
    * regime (broadcast vs co-partitioned SMJ) for every sync. Returns
    * the drained joined rows. */
  private[graft] def runJoinViewStream(
      gs: SparkSession,
      aDir: String,
      bDir: String,
      viewDir: String,
      baseA: DataFrame,
      allDocs: DataFrame,
      stream: DataFrame,
      broadcastMaxRows: Long = 100000L
  ): DataFrame = {
    import graft.operators.{JoinView, TableVersions}
    val w = (lit(1000) + ascii(substring(col("lang"), 2, 1))).cast("long").as("w")
    val dims = allDocs.select("lang").distinct().select(col("lang"), w)
    TableVersions.commitAppend(baseA, aDir)
    TableVersions.commitAppend(dims.filter(!col("lang").isin("de", "zh")).coalesce(1), bDir)
    JoinView.init(gs, aDir, bDir, viewDir, "lang", Seq("doc_id", "n_chars"), Seq("w"))
    def syncNow(): Unit =
      JoinView.sync(
        gs,
        aDir,
        bDir,
        viewDir,
        "lang",
        Seq("doc_id", "n_chars"),
        Seq("w"),
        broadcastMaxRows
      ): Unit
    val q = stream.writeStream
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          TableVersions.commitAppend(batch.toDF(), aDir): Unit
          syncNow()
      }
      .option("checkpointLocation", Similarity.freshIndexDir("joinview_stream_ck"))
      .trigger(Trigger.AvailableNow())
      .start()
    try q.awaitTermination()
    finally {
      q.stop()
      org.apache.spark.sql.graftshims.StreamingStateHygiene.unloadAllStateStores()
    }
    // the dimension moves and a takedown lands AFTER the drain — the
    // final sync must fold a payload update, a late join key, and a
    // fact retraction in one window
    TableVersions.commitUpdate(gs, bDir, "lang = 'en'", _.withColumn("w", col("w") + 7))
    TableVersions.commitAppend(dims.filter(col("lang") === "zh").coalesce(1), bDir)
    TableVersions.commitDelete(gs, aDir, "doc_id % 11 = 4")
    syncNow()
    JoinView.read(gs, viewDir).orderBy("doc_id")
  }

  /** q232's sample fold driven live: one append commit + one sample
    * sync per micro-batch, post-drain erasure retracted by the final
    * sync. Returns the drained top-5 per group. */
  private[graft] def runSampleViewStream(
      gs: SparkSession,
      srcDir: String,
      viewDir: String,
      base: DataFrame,
      stream: DataFrame
  ): DataFrame = {
    graft.operators.TableVersions.commitAppend(base, srcDir)
    graft.operators.SampleView.init(gs, srcDir, viewDir, "lang", "doc_id", "n_chars", buf = 8)
    val q = stream.writeStream
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          graft.operators.TableVersions.commitAppend(batch.toDF(), srcDir): Unit
          graft.operators.SampleView
            .sync(gs, srcDir, viewDir, "lang", "doc_id", "n_chars", buf = 8): Unit
      }
      .option("checkpointLocation", Similarity.freshIndexDir("sampleview_stream_ck"))
      .trigger(Trigger.AvailableNow())
      .start()
    try q.awaitTermination()
    finally {
      q.stop()
      org.apache.spark.sql.graftshims.StreamingStateHygiene.unloadAllStateStores()
    }
    // an erasure lands after the drain — the sample must RETRACT it
    graft.operators.TableVersions.commitDelete(gs, srcDir, "doc_id % 11 = 4")
    graft.operators.SampleView.sync(gs, srcDir, viewDir, "lang", "doc_id", "n_chars", buf = 8)
    graft.operators.SampleView.read(gs, viewDir, k = 5).orderBy("grp", "rn")
  }

  /** Admit-then-fold streaming admission against the persisted shingle
    * index (q191): per batch, verdicts come from ShingleIndex.admit
    * (reads persisted rows + summed df segments — nothing re-shingles
    * the corpus) and the batch then appends into the index, becoming
    * corpus for every later batch. Collected rows are admission
    * VERDICTS (pair ids + a score), the same driver-resident scale as
    * every memory-sink gate result.
    */
  private[graft] def runIndexAdmissionStream(
      gs: SparkSession,
      corpus: DataFrame,
      stream: DataFrame
  ): DataFrame = {
    val idx = Similarity.freshIndexDir("shingle_stream_idx")
    graft.operators.ShingleIndex.build(corpus, idx)
    val resultSchema =
      graft.operators.ShingleIndex.admit(gs, idx, corpus.limit(0), Dedup.PairMinJaccard).schema
    val verdicts =
      new java.util.concurrent.atomic.AtomicReference[Seq[org.apache.spark.sql.Row]](Seq.empty)
    val q = stream.writeStream
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          // the batch feeds two actions (admit, append) — materialize
          // once so the source isn't re-read per consumer
          val staged = batch.toDF().localCheckpoint()
          verdicts.set(
            verdicts.get() ++ graft.operators.ShingleIndex
              .admit(gs, idx, staged, Dedup.PairMinJaccard)
              .collect()
              .toSeq
          )
          graft.operators.ShingleIndex.append(staged, idx)
      }
      .option("checkpointLocation", Similarity.freshIndexDir("shingle_stream_ck"))
      .trigger(Trigger.AvailableNow())
      .start()
    try q.awaitTermination()
    finally {
      q.stop()
      org.apache.spark.sql.graftshims.StreamingStateHygiene.unloadAllStateStores()
    }
    gs.createDataFrame(java.util.Arrays.asList(verdicts.get(): _*), resultSchema)
      .orderBy("d_new", "d_old")
  }

  /** Drive an upsert stream into the version store: one
    * [[graft.operators.TableVersions.commitMerge]] per micro-batch
    * against the caller's table dir, then the projected head. Each
    * batch must carry distinct keys (commitMerge enforces it); across
    * batches, later versions of a key replace earlier ones in arrival
    * order — CDC-apply semantics.
    */
  private[graft] def runMergeStream(
      gs: SparkSession,
      tdir: String,
      base: DataFrame,
      upserts: DataFrame
  ): DataFrame = {
    graft.operators.TableVersions.commitAppend(base, tdir)
    val q = upserts.writeStream
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          graft.operators.TableVersions.commitMerge(batch.toDF(), tdir, "doc_id"): Unit
      }
      .option("checkpointLocation", Similarity.freshIndexDir("versioned_merge_ck"))
      .trigger(Trigger.AvailableNow())
      .start()
    try q.awaitTermination()
    finally {
      q.stop()
      org.apache.spark.sql.graftshims.StreamingStateHygiene.unloadAllStateStores()
    }
    graft.operators.TableVersions
      .readVersion(gs, tdir, graft.operators.TableVersions.currentVersion(gs, tdir))
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .orderBy("doc_id")
  }

  /** Drive a live document stream INTO the version store: each
    * micro-batch lands as one `commitAppend` — a new immutable batch
    * directory plus one log entry, cost O(batch), the existing table
    * never re-read — which is exactly how continuous ingest meets the
    * lakehouse contract: every micro-batch is a table version, so time
    * travel and CDC work over the live history (the spec diffs v0 →
    * head across the drain). Exactly-once caveat is q141's, one level
    * stronger here: a COMMITTED batch is never re-run (checkpoint),
    * and a mid-batch crash leaves at worst an orphaned data directory
    * whose log entry was never written — invisible to readers, since
    * reads resolve strictly through the log. The drained head's
    * CONTENT is split-invariant (append order never affects a table);
    * version NUMBERS honestly depend on the micro-batching, so the
    * query returns content keyed by doc_id and the spec pins the
    * forced 3-batch replay content-equal.
    */
  private[graft] def runVersionedIngest(
      gs: SparkSession,
      base: DataFrame,
      stream: DataFrame
  ): DataFrame =
    runVersionedIngestInto(gs, Similarity.freshIndexDir("versioned_stream"), base, stream)

  /** [[runVersionedIngest]] against a caller-owned table dir — the
    * spec drains into a dir it keeps so it can time-travel and CDC
    * across the drain afterwards. */
  private[graft] def runVersionedIngestInto(
      gs: SparkSession,
      tdir: String,
      base: DataFrame,
      stream: DataFrame
  ): DataFrame = {
    graft.operators.TableVersions.commitAppend(base, tdir)
    val q = stream.writeStream
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          graft.operators.TableVersions.commitAppend(batch.toDF(), tdir): Unit
      }
      .option("checkpointLocation", Similarity.freshIndexDir("versioned_stream_ck"))
      .trigger(Trigger.AvailableNow())
      .start()
    try q.awaitTermination()
    finally {
      q.stop()
      org.apache.spark.sql.graftshims.StreamingStateHygiene.unloadAllStateStores()
    }
    val head = graft.operators.TableVersions.currentVersion(gs, tdir)
    graft.operators.TableVersions
      .readVersion(gs, tdir, head)
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .orderBy("doc_id")
  }

  /** Commit-per-batch ingest with a feed-view sync in the same tick
    * (q219), then one post-drain takedown delete + final sync. The
    * view state is groups-scaled, each sync is batch-scaled —
    * [[graft.operators.FeedView]]'s contract, exercised live. */
  private[graft] def runFeedViewStream(
      gs: SparkSession,
      srcDir: String,
      viewDir: String,
      base: DataFrame,
      stream: DataFrame
  ): DataFrame = {
    graft.operators.TableVersions.commitAppend(base, srcDir)
    graft.operators.FeedView.init(gs, srcDir, viewDir, "lang", "n_chars")
    val q = stream.writeStream
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          graft.operators.TableVersions.commitAppend(batch.toDF(), srcDir): Unit
          graft.operators.FeedView.sync(gs, srcDir, viewDir, "lang", "n_chars"): Unit
      }
      .option("checkpointLocation", Similarity.freshIndexDir("feedview_stream_ck"))
      .trigger(Trigger.AvailableNow())
      .start()
    try q.awaitTermination()
    finally {
      q.stop()
      org.apache.spark.sql.graftshims.StreamingStateHygiene.unloadAllStateStores()
    }
    // a takedown lands after the drain — the view must RETRACT it
    graft.operators.TableVersions.commitDelete(gs, srcDir, "doc_id % 11 = 4")
    graft.operators.FeedView.sync(gs, srcDir, viewDir, "lang", "n_chars")
    graft.operators.FeedView.read(gs, viewDir).orderBy("k")
  }

  /** Drive the q202 erasure workflow with a LIVE forget stream — the
    * governance loop as a deployment runs it: each micro-batch of
    * right-to-be-forgotten requests lands as ONE copy-on-write delete
    * commit, and the commit's CDC (not the raw request — the store
    * confirms what actually held data) drives tombstones into BOTH
    * persisted indexes: the inverted index and the near-dup admission
    * index (whose delete also writes the negative df segment, so
    * document frequencies stay exact between compactions). Compaction
    * runs once after the drain — the separately-scheduled maintenance
    * job. Erasure is a set union, so the drained state is independent
    * of how the requests split into batches (StreamErasureSpec pins a
    * forced 3-batch replay); the evidence table is q202's, restated by
    * the oracle over the corpus minus every forgotten subject.
    */
  private[graft] def runErasureStream(
      gs: SparkSession,
      base: DataFrame,
      forgets: DataFrame
  ): DataFrame = {
    val tdir = Similarity.freshIndexDir("erasure_stream_store")
    val idxDir = Similarity.freshIndexDir("erasure_stream_inv")
    val sidxDir = Similarity.freshIndexDir("erasure_stream_shingle")
    graft.operators.TableVersions.commitAppend(base.repartition(8, col("source")), tdir)
    graft.operators.InvertedIndex.build(base.select("doc_id", "text"), idxDir)
    graft.operators.ShingleIndex.build(base.select("doc_id", "text"), sidxDir)
    val q = forgets.writeStream
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          // forget requests are usually human-scale, but a backfilled
          // erasure batch is not — the key set reaches the delete as a
          // DataFrame (key-only semi join), never a collected IN-list
          val ids = batch.select("doc_id").distinct()
          if (!ids.isEmpty) {
            val prev = graft.operators.TableVersions.currentVersion(gs, tdir)
            val v = graft.operators.TableVersions
              .commitDeleteKeys(ids, tdir, "doc_id")
            val confirmed = graft.operators.TableVersions
              .changes(gs, tdir, "doc_id", prev, v)
              .filter(col("change_type") === "delete")
              .select("doc_id")
              .localCheckpoint()
            graft.operators.InvertedIndex.delete(confirmed, idxDir)
            graft.operators.ShingleIndex.delete(confirmed, sidxDir)
          }
      }
      .option("checkpointLocation", Similarity.freshIndexDir("erasure_stream_ck"))
      .trigger(Trigger.AvailableNow())
      .start()
    try q.awaitTermination()
    finally {
      q.stop()
      org.apache.spark.sql.graftshims.StreamingStateHygiene.unloadAllStateStores()
    }
    graft.operators.InvertedIndex.compact(gs, idxDir)
    graft.operators.ShingleIndex.compact(gs, sidxDir)
    val head = graft.operators.TableVersions.currentVersion(gs, tdir)
    val census = graft.operators.TableVersions
      .readVersion(gs, tdir, head)
      .groupBy("lang")
      .agg(count(lit(1)).as("v"))
      .select(lit("census").as("kind"), col("lang").as("k"), col("v"))
    val lookup = graft.operators.InvertedIndex
      .conjunctiveQuery(gs, idxDir, Seq("spark", "join"))
      .select(
        lit("lookup").as("kind"),
        col("doc_id").cast("string").as("k"),
        col("score").cast("long").as("v")
      )
    val shingleRows = graft.operators.ShingleIndex
      .liveRows(gs, sidxDir)
      .agg(count(lit(1)).as("v"))
      .select(lit("shingle").as("kind"), lit("rows").as("k"), col("v"))
    val shingleDf = graft.operators.ShingleIndex
      .dfTable(gs, sidxDir)
      .agg(coalesce(sum("df"), lit(0L)).as("v"))
      .select(lit("shingle").as("kind"), lit("df_total").as("k"), col("v"))
    census
      .unionByName(lookup)
      .unionByName(shingleRows)
      .unionByName(shingleDf)
      .orderBy("kind", "k", "v")
  }

  /** Drive a delete stream through the MERGE-ON-READ path: each
    * micro-batch of doc ids lands as one deletion-vector commit —
    * O(matched rows) written, ZERO data files touched — so sustained
    * delete traffic (erasure queues, moderation takedowns) costs
    * vector appends, not file rewrites; ONE [[graft.operators
    * .TableVersions.compactMor]] after the drain folds every vector
    * into a single rewrite, the separately-scheduled maintenance job.
    * Deletes are a set union, so the drained head is independent of
    * the batching (StreamMorSpec pins the forced 3-batch replay), and
    * the oracle restates the head over `documents` minus the streamed
    * ids.
    */
  private[graft] def runMorDeleteStream(
      gs: SparkSession,
      tdir: String,
      base: DataFrame,
      deletes: DataFrame
  ): DataFrame = {
    graft.operators.TableVersions.commitAppend(base.repartition(8, col("source")), tdir)
    val q = deletes.writeStream
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          val ids = batch.select("doc_id").distinct()
          if (!ids.isEmpty) {
            graft.operators.TableVersions
              .commitDeleteMorKeys(ids, tdir, "doc_id"): Unit
          }
      }
      .option("checkpointLocation", Similarity.freshIndexDir("mor_stream_ck"))
      .trigger(Trigger.AvailableNow())
      .start()
    try q.awaitTermination()
    finally {
      q.stop()
      org.apache.spark.sql.graftshims.StreamingStateHygiene.unloadAllStateStores()
    }
    graft.operators.TableVersions.compactMor(gs, tdir)
    graft.operators.TableVersions
      .readVersion(gs, tdir, graft.operators.TableVersions.currentVersion(gs, tdir))
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .orderBy("doc_id")
  }

  /** Drive q176's inverted-index lifecycle with LIVE streams: build on
    * `baseDocs`, drain `ingest` appending each micro-batch's postings
    * (cost O(batch tokens); doc postings are disjoint rows, so no
    * merge and no re-read of the layout), then drain `forgets`
    * tombstoning each batch's doc ids (one tiny write per batch;
    * duplicate ids are idempotent at lookup). Compaction runs once
    * after the drains — the separately-scheduled batch maintenance
    * job a deployment actually uses — and the final conjunctive
    * lookup carries q176's oracle semantics. Micro-batch independence
    * is structural here (appends are disjoint rows, tombstones a set
    * union), unlike the stage-and-recompute gates: the drained layout
    * is the same file set under any source split, which
    * StreamInvertedSpec pins with a forced 3-file/3-batch replay.
    */
  private[graft] def runInvertedMaintenance(
      gs: SparkSession,
      baseDocs: DataFrame,
      ingest: DataFrame,
      forgets: DataFrame
  ): DataFrame = {
    val idx = Similarity.freshIndexDir("inverted_stream")
    graft.operators.InvertedIndex.build(baseDocs, idx)
    def drain(src: DataFrame, ckPrefix: String)(
        sink: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row] => Unit
    ): Unit = {
      val q = src.writeStream
        .foreachBatch {
          (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
            sink(batch)
        }
        .option("checkpointLocation", Similarity.freshIndexDir(ckPrefix))
        .trigger(Trigger.AvailableNow())
        .start()
      try q.awaitTermination()
      finally {
        q.stop()
        org.apache.spark.sql.graftshims.StreamingStateHygiene.unloadAllStateStores()
      }
    }
    drain(ingest, "inv_ingest_ck") { batch =>
      graft.operators.InvertedIndex.append(batch.toDF(), idx)
    }
    drain(forgets, "inv_forget_ck") { batch =>
      graft.operators.InvertedIndex.delete(batch.toDF(), idx)
    }
    graft.operators.InvertedIndex.compact(gs, idx)
    graft.operators.InvertedIndex
      .conjunctiveQuery(gs, idx, Seq("spark", "join"))
      .orderBy(col("score").desc, col("doc_id"))
  }

  /** Drive q283's write-audit-publish with LIVE streams: each
    * micro-batch commits (defects PLANTED on doc_id % 13 = 4 rows —
    * n_chars forced negative), is audited post-write, and publishes
    * its catalog pin only when clean; dirty batches stay unpublished
    * (asserted mid-drain: the catalog head never serves a negative
    * n_chars). Post-drain, remediation deletes the defective rows at
    * the table head, re-audits, and publishes — so the drained
    * published state is the clean corpus regardless of how the source
    * split scattered the defects. Returns the catalog-routed head.
    */
  private[graft] def runWapStream(
      gs: SparkSession,
      base: DataFrame,
      stream: DataFrame
  ): DataFrame = {
    import graft.operators.{Catalog, TableVersions}
    val cat = Similarity.freshIndexDir("wap_stream_cat")
    val tdir = Similarity.freshIndexDir("wap_stream_store")
    Catalog.transact(gs, cat) { _ =>
      val v0 = TableVersions.commitAppend(base, tdir)
      Map("docs" -> Catalog.Pin(tdir, v0))
    }
    def violations(v: Long): Long =
      TableVersions.readVersion(gs, tdir, v).filter(col("n_chars") <= 0).count()
    val q = stream.writeStream
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          // the crawl batch arrives with planted defects
          val dirty = batch
            .toDF()
            .withColumn(
              "n_chars",
              when(col("doc_id") % 13 === 4, lit(-1L)).otherwise(col("n_chars"))
            )
          val v = TableVersions.commitAppend(dirty, tdir)
          if (violations(v) == 0L)
            Catalog.transact(gs, cat)(_ => Map("docs" -> Catalog.Pin(tdir, v))): Unit
      }
      .option("checkpointLocation", Similarity.freshIndexDir("wap_stream_ck"))
      .trigger(Trigger.AvailableNow())
      .start()
    try q.awaitTermination()
    finally {
      q.stop()
      org.apache.spark.sql.graftshims.StreamingStateHygiene.unloadAllStateStores()
    }
    // no published snapshot ever served a defective row
    require(
      Catalog
        .readTable(gs, cat, Catalog.head(gs, cat), "docs")
        .filter(col("n_chars") <= 0)
        .isEmpty,
      "a published snapshot served an unaudited defect"
    )
    // remediation: one audited delete commit publishes everything else
    val vFix = TableVersions.commitDelete(gs, tdir, "n_chars <= 0")
    require(violations(vFix) == 0L, "remediation must pass its audit")
    Catalog.transact(gs, cat)(_ => Map("docs" -> Catalog.Pin(tdir, vFix)))
    Catalog
      .readTable(gs, cat, Catalog.head(gs, cat), "docs")
      .orderBy("doc_id")
  }

  /** Drive q289's SCD2 projection over a LIVE-built table: drain the
    * crawl as per-batch insert commits (disjoint keys — nothing
    * closes), land the q289 maintenance window after the drain, then
    * project the validity intervals from the whole commit log and
    * remap commit numbers to the split-invariant epoch coordinate
    * (drain commits → 0, k-th maintenance commit → k). */
  private[graft] def runScd2Stream(gs: SparkSession, stream: DataFrame): DataFrame = {
    import graft.operators.TableVersions
    val tdir = Similarity.freshIndexDir("scd2_stream_store")
    val q = stream.writeStream
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          TableVersions.commitAppend(batch.toDF(), tdir): Unit
      }
      .option("checkpointLocation", Similarity.freshIndexDir("scd2_stream_ck"))
      .trigger(Trigger.AvailableNow())
      .start()
    try q.awaitTermination()
    finally {
      q.stop()
      org.apache.spark.sql.graftshims.StreamingStateHygiene.unloadAllStateStores()
    }
    val drainHead = TableVersions.currentVersion(gs, tdir)
    TableVersions.commitUpdate(gs, tdir, "lang = 'zh'", _.withColumn("n_chars", col("n_chars") + 1000))
    TableVersions.commitDelete(gs, tdir, "doc_id % 7 = 5")
    TableVersions.commitUpdate(gs, tdir, "lang = 'en'", _.withColumn("n_chars", col("n_chars") + 7))
    Versioned
      .scd2Projection(gs, tdir)
      .select(
        col("doc_id"),
        col("lang"),
        col("n_chars"),
        greatest(col("from_version") - drainHead, lit(0L)).as("from_version"),
        when(col("to_version") === -1L, -1L)
          .otherwise(col("to_version") - drainHead)
          .as("to_version")
      )
      .orderBy("doc_id", "from_version")
  }

  /** q297's branch workflow driven live: the base publishes on main,
    * the crawl drains as commits that advance only the BRANCH pin
    * (main's head REQUIREd untouched inside every batch), a post-drain
    * erasure lands on the branch, and the audited whole-workflow state
    * merges to main as one atomic snapshot. Returns the main-history
    * census — two snapshots under any source split. */
  private[graft] def runBranchStream(
      gs: SparkSession,
      base: DataFrame,
      stream: DataFrame
  ): DataFrame = {
    import graft.operators.{Catalog, TableVersions}
    val cat = Similarity.freshIndexDir("branch_stream_cat")
    val tdir = Similarity.freshIndexDir("branch_stream_docs")
    Catalog.transact(gs, cat) { _ =>
      val v0 = TableVersions.commitAppend(base, tdir)
      Map("docs" -> Catalog.Pin(tdir, v0))
    }
    val bdir = Catalog.createBranch(gs, cat, "ingest", fromSnap = 0L)
    val q = stream.writeStream
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          val v = TableVersions.commitAppend(batch.toDF(), tdir)
          Catalog.transact(gs, bdir)(pins => pins + ("docs" -> Catalog.Pin(tdir, v))): Unit
          // the live isolation guarantee: the branch's commits must be
          // invisible on main WHILE the stream runs, not just at the end
          require(
            Catalog.head(gs, cat) == 0L && Catalog.pinsAt(gs, cat, 0L)("docs").version == 0L,
            "branch commits leaked onto main mid-drain"
          )
      }
      .option("checkpointLocation", Similarity.freshIndexDir("branch_stream_ck"))
      .trigger(Trigger.AvailableNow())
      .start()
    try q.awaitTermination()
    finally {
      q.stop()
      org.apache.spark.sql.graftshims.StreamingStateHygiene.unloadAllStateStores()
    }
    // post-drain maintenance on the branch, then one atomic landing
    val vErase = TableVersions.commitDelete(gs, tdir, "doc_id % 7 = 5")
    Catalog.transact(gs, bdir)(pins => pins + ("docs" -> Catalog.Pin(tdir, vErase)))
    val merged = Catalog.merge(gs, cat, "ingest")
    require(merged == 1L, s"fast-forward merge must publish main snapshot 1, got $merged")
    val sess = gs
    import sess.implicits._
    (0L to Catalog.head(gs, cat))
      .map { snap =>
        val r = Catalog
          .readTable(gs, cat, snap, "docs")
          .agg(count(lit(1)), sum("n_chars"))
          .head()
        (snap, r.getLong(0), r.getLong(1))
      }
      .toDF("snap", "n_docs", "sum_chars")
      .orderBy("snap")
  }

  /** q300's DP release driven live — stage-and-recompute, because
    * contribution bounding is whole-history (presence clamps and
    * per-user caps span micro-batches; partial noisy releases would
    * compose budgets, not counts). */
  private[graft] def runDpStream(gs: SparkSession, stream: DataFrame): DataFrame = {
    val staging = Similarity.freshIndexDir("dp_staging")
    val q = stream.writeStream
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          batch.toDF().write.mode("append").parquet(staging)
      }
      .option("checkpointLocation", Similarity.freshIndexDir("dp_stream_ck"))
      .trigger(Trigger.AvailableNow())
      .start()
    try q.awaitTermination()
    finally {
      q.stop()
      org.apache.spark.sql.graftshims.StreamingStateHygiene.unloadAllStateStores()
    }
    Corpus.dpRelease(gs.read.parquet(staging))
  }

  /** q301's moments sketch driven live: each micro-batch reduces to
    * its per-type partial power sums (one O(batch) aggregate — the
    * mergeable sketch state), appended to the store; the drained
    * merge is one tiny sum over partial rows. */
  private[graft] def runMomentsStream(gs: SparkSession, stream: DataFrame): DataFrame = {
    val staging = Similarity.freshIndexDir("moments_staging")
    val q = stream.writeStream
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          val typed = batch
            .toDF()
            .select(
              col("event_type"),
              expr("CAST(round(value * 100) AS BIGINT)").as("c")
            )
          Sketches
            .momentPartials(typed, Seq(col("event_type")))
            .write
            .mode("append")
            .parquet(staging)
      }
      .option("checkpointLocation", Similarity.freshIndexDir("moments_stream_ck"))
      .trigger(Trigger.AvailableNow())
      .start()
    try q.awaitTermination()
    finally {
      q.stop()
      org.apache.spark.sql.graftshims.StreamingStateHygiene.unloadAllStateStores()
    }
    Sketches.momentStats(gs.read.parquet(staging)).orderBy("event_type")
  }

  /** Drive q282's covering index with LIVE streams: one table commit +
    * one index sync per micro-batch (each sync folds exactly its CDC
    * window into one LSM segment — O(batch), the table never re-read);
    * after the drain an UPDATE and an ERASURE land and the final sync
    * folds both through the same change feed. Split-invariance holds
    * because latest-wins is associative across segments: however the
    * stream splits, a key's final state is its last commit's state.
    * Returns the q282-shaped lookup + census, served from the index.
    */
  private[graft] def runCoveringIndexStream(
      gs: SparkSession,
      base: DataFrame,
      stream: DataFrame
  ): DataFrame = {
    import graft.operators.{CoveringIndex, TableVersions}
    val tdir = Similarity.freshIndexDir("cov_stream_store")
    val idx = Similarity.freshIndexDir("cov_stream_idx")
    val key = "doc_id"
    val cols = Seq("lang", "n_chars")
    TableVersions.commitAppend(base, tdir)
    CoveringIndex.init(gs, tdir, idx, key, cols)
    val q = stream.writeStream
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          TableVersions.commitAppend(batch.toDF(), tdir): Unit
          CoveringIndex.sync(gs, tdir, idx, key, cols): Unit
      }
      .option("checkpointLocation", Similarity.freshIndexDir("cov_stream_ck"))
      .trigger(Trigger.AvailableNow())
      .start()
    try q.awaitTermination()
    finally {
      q.stop()
      org.apache.spark.sql.graftshims.StreamingStateHygiene.unloadAllStateStores()
    }
    // post-drain maintenance window: an update and an erasure fold
    // through the same feed in one final sync
    TableVersions.commitUpdate(gs, tdir, "lang = 'zh'", _.withColumn("n_chars", col("n_chars") + 1000))
    TableVersions.commitDelete(gs, tdir, "doc_id % 7 = 5")
    CoveringIndex.sync(gs, tdir, idx, key, cols)
    val probeKeys = Seq(3L, 10L, 35L, 77L, 110L, 154L, 231L, 308L, 385L, 462L)
    val lookup = CoveringIndex.lookup(gs, idx, key, cols, probeKeys)
    require(
      lookup.inputFiles.nonEmpty && lookup.inputFiles.forall(_.contains("cov_stream_idx")),
      "lookup must read only the index"
    )
    val census = CoveringIndex
      .read(gs, idx, key, cols)
      .groupBy("lang")
      .agg(count(lit(1)).as("k"), sum("n_chars").as("n_chars"))
      .select(lit("census").as("probe"), col("k").as("doc_id"), col("lang"), col("n_chars"))
    lookup
      .select(lit("lookup").as("probe"), col("doc_id"), col("lang"), col("n_chars"))
      .unionByName(census)
      .orderBy("probe", "doc_id", "lang")
  }

  /** Drive q275's bitmap-index lifecycle with LIVE streams: build on
    * `base`, drain `ingest` landing each micro-batch as one
    * OR-mergeable segment, drain `forgets` landing each batch as one
    * segment-versioned delete mask, compact once after the drains (the
    * scheduled batch maintenance job), and return the q275 census.
    * Micro-batch independence is structural: segment bits fold by
    * bit_or (associative + commutative) and masks by bit union, so the
    * folded words are the same under any source split —
    * StreamBitmapSpec pins it with a forced 3-file/3-batch replay. */
  private[graft] def runBitmapMaintenance(
      gs: SparkSession,
      base: DataFrame,
      ingest: DataFrame,
      forgets: DataFrame
  ): DataFrame = {
    import graft.operators.BitmapIndex
    val idx = Similarity.freshIndexDir("bitmap_stream")
    BitmapIndex.build(base, "doc_id", "lang", idx)
    def drain(src: DataFrame, ckPrefix: String)(
        sink: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row] => Unit
    ): Unit = {
      val q = src.writeStream
        .foreachBatch {
          (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
            sink(batch)
        }
        .option("checkpointLocation", Similarity.freshIndexDir(ckPrefix))
        .trigger(Trigger.AvailableNow())
        .start()
      try q.awaitTermination()
      finally {
        q.stop()
        org.apache.spark.sql.graftshims.StreamingStateHygiene.unloadAllStateStores()
      }
    }
    drain(ingest, "bm_ingest_ck") { batch =>
      BitmapIndex.append(batch.toDF(), "doc_id", "lang", idx)
    }
    drain(forgets, "bm_forget_ck") { batch =>
      BitmapIndex.delete(batch.toDF(), "doc_id", idx)
    }
    BitmapIndex.compact(gs, idx)
    val sess = gs
    import sess.implicits._
    val perLang = BitmapIndex
      .valueCounts(gs, idx, "lang")
      .collect()
      .map(r => ("lang", r.getString(0), r.getLong(1)))
      .toSeq
    val or = Seq(("setop", "or:en|fr", BitmapIndex.unionCount(gs, idx, "lang", "en", "lang", "fr")))
    (perLang ++ or).toDF("probe", "k", "n").orderBy("probe", "k")
  }

  /** Drive an admission-check stream to completion and return the
    * final verdict table.
    *
    * Micro-batch independence, the property that makes this safe to
    * deploy against ANY source partitioning: q146's verdict definition
    * (the rare-shingle df ∈ [2,50] rule and the per-doc Jaccard
    * denominators) is a function of the corpus PLUS THE WHOLE new-doc
    * set, so verdicts computed batch-by-batch would depend on where
    * the stream happened to split (two new docs sharing a rare shingle
    * across a batch boundary would each see a different df). Arriving
    * batches therefore stage into a parquet side-table and each batch
    * RECOMPUTES the verdicts over the full staged set — later arrivals
    * refine earlier verdicts, and the drained result is bit-identical
    * to the one-shot batch q146 regardless of micro-batching
    * (StreamAdmissionSpec forces a 3-file/3-batch replay and pins the
    * equality). Per-batch cost grows with the staged set — the honest
    * price of exact batch-parity; the bounded production loop is
    * [[runIndexAdmissionStream]] (q191): admit each batch against the
    * persisted ShingleIndex, fold it in, never re-shingle the corpus.
    */
  private[graft] def runAdmissionStream(
      gs: SparkSession,
      corpus: DataFrame,
      stream: DataFrame
  ): DataFrame = {
    val staging = Similarity.freshIndexDir("admission_staging")
    val resultSchema =
      Dedup.admissionPairs(corpus, corpus.limit(0), Dedup.PairMinJaccard).schema
    val verdicts =
      new java.util.concurrent.atomic.AtomicReference[Seq[org.apache.spark.sql.Row]](Seq.empty)
    val q = stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        batch.write.mode("append").parquet(staging)
        val allNew = gs.read.parquet(staging)
        verdicts.set(
          Dedup.admissionPairs(corpus, allNew, Dedup.PairMinJaccard).collect().toSeq
        )
      }
      .trigger(Trigger.AvailableNow())
      .start()
    try q.awaitTermination()
    finally {
      q.stop()
      org.apache.spark.sql.graftshims.StreamingStateHygiene.unloadAllStateStores()
    }
    gs.createDataFrame(java.util.Arrays.asList(verdicts.get(): _*), resultSchema)
      .orderBy("d_new", "d_old")
  }

  /** Drive a count-min maintenance stream to completion and return the
    * final estimate table (see q168). Per micro-batch: the batch's
    * partial counter table appends to `staging`; after the drain the
    * merged sketch is one (j, b) summation — additive merge, the CMS
    * property that makes the result independent of how the source
    * split into batches. Probe keys/exact counts come from `static`
    * (the same corpus the stream delivers), so the output table is
    * directly comparable to — and hash-equal with — batch q159.
    */
  private[graft] def runSketchStream(
      gs: SparkSession,
      static: DataFrame,
      stream: DataFrame
  ): DataFrame = {
    val staging = Similarity.freshIndexDir("cms_staging")
    val ck = Similarity.freshIndexDir("cms_ck")
    val q = stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        Sketches
          .counterTable(Sketches.tokenCounts(batch.toDF()))
          .write
          .mode("append")
          .parquet(staging)
      }
      .option("checkpointLocation", ck)
      .trigger(Trigger.AvailableNow())
      .start()
    try q.awaitTermination()
    finally {
      q.stop()
      org.apache.spark.sql.graftshims.StreamingStateHygiene.unloadAllStateStores()
    }
    val merged = gs.read.parquet(staging).groupBy("j", "b").agg(sum("c").as("c"))
    Sketches.estimateTopK(Sketches.tokenCounts(static), merged)
  }

  /** Drive a lineitem stream to completion, maintaining per-scope KMV
    * sketches incrementally (see q199): per micro-batch the batch's
    * own bottom-k sketch rows append to staging; the final report
    * re-cuts the distinct-union — the sketch-merge path, never a
    * history re-read.
    */
  private[graft] def runKmvStream(gs: SparkSession, stream: DataFrame): DataFrame = {
    val staging = Similarity.freshIndexDir("kmv_staging")
    val ck = Similarity.freshIndexDir("kmv_ck")
    val q = stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        Sketches
          .kmvSketchRows(Sketches.pairHashes(batch.toDF()))
          .write
          .mode("append")
          .parquet(staging)
      }
      .option("checkpointLocation", ck)
      .trigger(Trigger.AvailableNow())
      .start()
    try q.awaitTermination()
    finally {
      q.stop()
      org.apache.spark.sql.graftshims.StreamingStateHygiene.unloadAllStateStores()
    }
    Sketches.kmvReport(gs.read.parquet(staging).distinct())
  }

  /** Drive an event stream to completion and return the q177 funnel
    * table computed over everything that arrived. Stage-and-recompute
    * (q149's contract): funnel steps depend on each user's WHOLE
    * history — a view arriving in a later batch than an earlier-timed
    * click changes that click's eligibility — so batches stage into
    * parquet and the counts are computed once over the drained set,
    * making the result independent of micro-batch boundaries.
    */
  /** q257's cohort matrix driven live via stage-and-recompute (cohort
    * membership is whole-history — see the q274 registration). */
  private[graft] def runCohortStream(gs: SparkSession, stream: DataFrame): DataFrame = {
    val staging = Similarity.freshIndexDir("cohort_staging")
    val ck = Similarity.freshIndexDir("cohort_ck")
    val q = stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        batch.toDF().write.mode("append").parquet(staging)
      }
      .option("checkpointLocation", ck)
      .trigger(Trigger.AvailableNow())
      .start()
    try q.awaitTermination()
    finally {
      q.stop()
      org.apache.spark.sql.graftshims.StreamingStateHygiene.unloadAllStateStores()
    }
    Extras.cohortReport(gs.read.parquet(staging))
  }

  /** q258's CUSUM detector driven live via stage-and-recompute (the
    * statistic has no incremental form — see the q268 registration). */
  private[graft] def runCusumStream(gs: SparkSession, stream: DataFrame): DataFrame = {
    val staging = Similarity.freshIndexDir("cusum_staging")
    val ck = Similarity.freshIndexDir("cusum_ck")
    val q = stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        batch.toDF().write.mode("append").parquet(staging)
      }
      .option("checkpointLocation", ck)
      .trigger(Trigger.AvailableNow())
      .start()
    try q.awaitTermination()
    finally {
      q.stop()
      org.apache.spark.sql.graftshims.StreamingStateHygiene.unloadAllStateStores()
    }
    Extras.cusumReport(gs.read.parquet(staging))
  }

  private[graft] def runFunnelStream(gs: SparkSession, stream: DataFrame): DataFrame = {
    val staging = Similarity.freshIndexDir("funnel_staging")
    val ck = Similarity.freshIndexDir("funnel_ck")
    val q = stream
      .select("user_id", "event_type", "ts")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        batch.toDF().write.mode("append").parquet(staging)
      }
      .option("checkpointLocation", ck)
      .trigger(Trigger.AvailableNow())
      .start()
    try q.awaitTermination()
    finally {
      q.stop()
      org.apache.spark.sql.graftshims.StreamingStateHygiene.unloadAllStateStores()
    }
    val (n1, n2, n3) = Extras.funnelCounts(gs.read.parquet(staging))
    import gs.implicits._
    Seq(
      ("1_view", n1, 1000000L),
      ("2_click", n2, if (n1 == 0) 0L else n2 * 1000000L / n1),
      ("3_purchase", n3, if (n1 == 0) 0L else n3 * 1000000L / n1)
    ).toDF("step", "n_users", "ppm_of_step1").orderBy("step")
  }
}
