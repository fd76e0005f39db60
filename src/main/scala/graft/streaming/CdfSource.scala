package graft.streaming

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.{LongType, StringType, StructType}

import graft.operators.TableVersions

/** CHANGE FEED AS A STRUCTURED STREAMING SOURCE — the read side that
  * completes the version store's streaming loop (everything already
  * streams INTO it; consumers of `_cdf` previously had to poll
  * [[TableVersions.changesFeed]] windows by hand). Delta Lake's
  * `readChangeFeed` is the public model.
  *
  * One OFFSET = one committed table VERSION, so a micro-batch is an
  * exact feed window `(start, end]` — whole commits, never a partial
  * one — and [[TableVersions.changesFeed]] IS the batch body: rows
  * carry the full image plus `_change_type` and `_commit_version`,
  * appends contribute their inserts, logical no-ops contribute
  * nothing, and a window crossing a RESTORE or a vacuumed horizon
  * refuses loudly rather than silently skipping changes. Offsets only
  * advance to [[TableVersions.safeHead]] — under concurrent writers a
  * claimed-but-uncommitted lower version fences the watermark, so a
  * consumer can never stream past an in-flight commit and miss it.
  *
  * RATE LIMIT: `maxVersionsPerBatch` caps how many commits one
  * micro-batch folds (default unbounded). At 100 TB this is the
  * backpressure knob: a consumer catching up over a week of history
  * processes bounded windows at its own pace instead of one
  * unboundedly large batch. Replay is deterministic by construction —
  * a checkpointed `(start, end]` window re-reads the same persisted
  * feed segments — which is what makes the usual idempotent sinks
  * exactly-once end-to-end.
  *
  * Implemented against the V1 `Source` API deliberately: its
  * `getBatch` returns a DataFrame, so the persisted feed segments flow
  * through the ordinary parquet scan (pushdown, codegen, AQE) instead
  * of a hand-rolled DSv2 PartitionReader re-implementing a parquet
  * reader row by row.
  *
  * Options: `path` (the versioned table dir, required),
  * `startingVersion` (stream the feed AFTER this version; default 0 —
  * consumers that initialized their state from a snapshot pass that
  * snapshot's version), `maxVersionsPerBatch` (default unbounded).
  */
class CdfSourceProvider extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "graft-cdf"

  private def pathOf(parameters: Map[String, String]): String =
    parameters.getOrElse(
      "path",
      throw new IllegalArgumentException("graft-cdf source requires option 'path' (the table dir)")
    )

  override def sourceSchema(
      sqlContext: SQLContext,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]
  ): (String, StructType) =
    ("graft-cdf", CdfSource.schemaFor(sqlContext.sparkSession, pathOf(parameters)))

  override def createSource(
      sqlContext: SQLContext,
      metadataPath: String,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]
  ): Source = {
    val dir = pathOf(parameters)
    val startingVersion = parameters.get("startingVersion").map(_.toLong).getOrElse(0L)
    val maxPerBatch = parameters.get("maxVersionsPerBatch").map(_.toLong).getOrElse(Long.MaxValue)
    require(maxPerBatch >= 1, s"maxVersionsPerBatch must be >= 1, got $maxPerBatch")
    new CdfSource(sqlContext.sparkSession, dir, startingVersion, maxPerBatch)
  }
}

object CdfSource {

  /** Feed schema: the table's head schema plus the two event columns. */
  def schemaFor(s: SparkSession, dir: String): StructType = {
    val head = TableVersions.currentVersion(s, dir)
    require(head >= 0, s"$dir not initialized")
    TableVersions
      .readVersion(s, dir, head)
      .schema
      .add("_change_type", StringType)
      .add("_commit_version", LongType)
  }
}

class CdfSource(
    spark: SparkSession,
    dir: String,
    startingVersion: Long,
    maxVersionsPerBatch: Long
) extends Source
    with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  import org.apache.spark.sql.connector.read.streaming.{Offset => OffsetV2, ReadLimit}

  override val schema: StructType = CdfSource.schemaFor(spark, dir)

  /** Offset = table version, serialized as its decimal string. */
  private case class VersionOffset(v: Long) extends Offset {
    override def json: String = v.toString
  }

  /** The engine hands back checkpointed offsets as SerializedOffset —
    * every Offset here round-trips through its json. */
  private def versionOf(o: OffsetV2): Long = o.json.trim.toLong

  /** High-water mark of windows already HANDED OUT (not merely
    * committed) — the rate limiter's floor for the legacy getOffset
    * path. Monotone; also advanced by getBatch/commit so a restart
    * from a checkpoint can never plan a window that runs backwards. */
  @volatile private var lastEnd: Long = startingVersion

  /** Trigger.AvailableNow: the head is FROZEN at query start — the
    * drain processes exactly the commits that existed then (in
    * rate-limited windows) and terminates, even if writers keep
    * committing. */
  @volatile private var availableNowCap: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(TableVersions.safeHead(spark, dir))

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  /** The admission-controlled offset path (what the engine uses for a
    * source implementing these interfaces — including every
    * AvailableNow micro-batch): the next window ends
    * `maxVersionsPerBatch` commits past the LAST window, never past
    * the (possibly frozen) safe head. */
  override def latestOffset(startOffset: OffsetV2, limit: ReadLimit): OffsetV2 = {
    val start = Option(startOffset).map(versionOf).getOrElse(startingVersion)
    val head = availableNowCap.getOrElse(TableVersions.safeHead(spark, dir))
    val capped = math.min(head, start + maxVersionsPerBatch)
    lastEnd = math.max(lastEnd, start)
    if (capped <= start) null
    else {
      lastEnd = math.max(lastEnd, capped)
      VersionOffset(capped)
    }
  }

  /** Legacy (non-admission-control) path — same rate limit, floored
    * by the handed-out high-water mark. */
  override def getOffset: Option[Offset] = {
    val head = TableVersions.safeHead(spark, dir)
    val capped = math.min(head, lastEnd + maxVersionsPerBatch)
    if (capped <= lastEnd) None
    else {
      lastEnd = capped
      Some(VersionOffset(capped))
    }
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val vOld = start.map(versionOf).getOrElse(startingVersion)
    val vNew = versionOf(end)
    lastEnd = math.max(lastEnd, vNew)
    val batch =
      if (vNew <= vOld) {
        // defensive: an empty (or replay-degenerate) window yields an
        // empty frame of the declared schema, never a crash
        spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
      } else TableVersions.changesFeed(spark, dir, vOld, vNew)
    // pin the declared column order — a schema-evolved feed window
    // could otherwise surface union-ordered columns — and tag the
    // frame streaming (the V1 contract; see StreamingFrames)
    org.apache.spark.sql.graftshims.StreamingFrames.asStreamingFrame(
      batch.select(schema.fieldNames.toIndexedSeq.map(col): _*)
    )
  }

  override def commit(end: Offset): Unit =
    lastEnd = math.max(lastEnd, versionOf(end))

  override def stop(): Unit = ()

  override def toString: String = s"CdfSource[$dir, after v$startingVersion]"
}
