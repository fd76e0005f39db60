package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** Pins the hidden-partitioning invariants q325's oracle cannot see:
  * the log-level file cut is exact under each file's OWN transform
  * (partition evolution), absence-safe for untransformed commits,
  * floor-exact for negative truncate buckets, and composed with
  * deletion vectors on the read path.
  */
class TransformPartitionSpec extends AnyFunSuite with SparkSpec {

  private def freshDir() = graft.queries.Similarity.freshIndexDir("tp_spec")

  /** 90 rows, one per day over 2024-01-01..2024-03-30. Timestamps are
    * parsed by the SESSION (pinned UTC), not the JVM default zone, so
    * the spec's expected day buckets hold on any host. */
  private def tsFixture() = {
    val s = spark
    import s.implicits._
    (0 until 90)
      .map { i =>
        val d = java.time.LocalDate.of(2024, 1, 1).plusDays(i.toLong)
        (i.toLong, s"$d 12:30:00", s"r$i")
      }
      .toDF("id", "ts_str", "tag")
      .withColumn("ts", to_timestamp(col("ts_str")))
      .select("id", "ts", "tag")
  }

  private def sortedRows(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("id").collect().map(_.toString).toSeq

  test("days pruning: result exact, file cut exact, flat commits absence-safe") {
    val dir = freshDir()
    val fx = tsFixture()
    // era 1: January, days-partitioned (31 buckets); era 2: the rest, FLAT
    TableVersions.commitAppendTransformed(
      fx.filter(col("ts") < lit("2024-02-01").cast("timestamp")), dir, "ts", "days")
    TableVersions.commitAppend(
      fx.filter(col("ts") >= lit("2024-02-01").cast("timestamp")).repartition(4), dir)
    val head = TableVersions.currentVersion(spark, dir)

    val lo = "2024-01-10"
    val hi = "2024-01-14 23:59:59"
    val pruned = TableVersions.readVersionTransformPruned(spark, dir, head, "ts", lo, hi)
    val twin = TableVersions
      .readVersion(spark, dir, head)
      .filter(col("ts") >= lit(lo).cast("timestamp") && col("ts") <= lit(hi).cast("timestamp"))
    assert(sortedRows(pruned) == sortedRows(twin))
    assert(pruned.count() == 5)

    // file-cut evidence: the pruned frame was assembled from an explicit
    // candidate list, so inputFiles IS the post-cut set — every days
    // file in it sits inside the bucket window, every flat file (no
    // __t_ segment) survives, and the cut is strictly smaller than the
    // full live set
    val loDay = java.time.LocalDate.parse("2024-01-10").toEpochDay
    val hiDay = java.time.LocalDate.parse("2024-01-14").toEpochDay
    val seg = "/__t_days_ts=(-?\\d+)/".r
    val files = pruned.inputFiles.toSeq
    val dayFiles = files.flatMap(f => seg.findFirstMatchIn(f).map(_.group(1).toLong))
    assert(dayFiles.nonEmpty && dayFiles.forall(d => d >= loDay && d <= hiDay))
    val allFiles = TableVersions.readVersion(spark, dir, head).inputFiles.length
    assert(files.length < allFiles, s"no cut: ${files.length} of $allFiles")
  }

  test("partition evolution: days and month eras coexist, each judged by its own transform") {
    val dir = freshDir()
    val fx = tsFixture()
    // era 1 (Jan): days; era 2 (Feb..Mar): month — the table was
    // re-specced without rewriting era 1
    TableVersions.commitAppendTransformed(
      fx.filter(col("ts") < lit("2024-02-01").cast("timestamp")), dir, "ts", "days")
    TableVersions.commitAppendTransformed(
      fx.filter(col("ts") >= lit("2024-02-01").cast("timestamp")), dir, "ts", "month")
    val head = TableVersions.currentVersion(spark, dir)

    // probe spans the era boundary: Jan 28 .. Feb 10
    val lo = "2024-01-28"
    val hi = "2024-02-10 23:59:59"
    val pruned = TableVersions.readVersionTransformPruned(spark, dir, head, "ts", lo, hi)
    val twin = TableVersions
      .readVersion(spark, dir, head)
      .filter(col("ts") >= lit(lo).cast("timestamp") && col("ts") <= lit(hi).cast("timestamp"))
    assert(sortedRows(pruned) == sortedRows(twin))

    // era-wise cut: only 4 of Jan's 31 day buckets, only Feb of the
    // two month buckets
    val files = pruned.inputFiles.toSeq
    val daySeg = "/__t_days_ts=(-?\\d+)/".r
    val monSeg = "/__t_month_ts=(-?\\d+)/".r
    val days = files.flatMap(f => daySeg.findFirstMatchIn(f).map(_.group(1).toLong)).distinct
    val months = files.flatMap(f => monSeg.findFirstMatchIn(f).map(_.group(1).toLong)).distinct
    assert(days.size == 4, s"day buckets: $days") // Jan 28..31
    assert(months == Seq(2024 * 12 + 1), s"month buckets: $months") // Feb only
  }

  test("trunc pruning is floor-exact for negative values") {
    val s = spark
    import s.implicits._
    val dir = freshDir()
    val fx = (-50L to 50L).map(i => (i, s"v$i")).toDF("k", "tag")
    TableVersions.commitAppendTransformed(fx, dir, "k", "trunc20")
    val head = TableVersions.currentVersion(spark, dir)
    val pruned = TableVersions.readVersionTransformPruned(spark, dir, head, "k", "-25", "5")
    val twin = TableVersions.readVersion(spark, dir, head).filter(col("k") >= -25 && col("k") <= 5)
    assert(
      pruned.orderBy("k").collect().map(_.getLong(0)).toSeq ==
        twin.orderBy("k").collect().map(_.getLong(0)).toSeq
    )
    // buckets present must be exactly {-40, -20, 0} (floor-div, not
    // truncate-toward-zero: -25 lives in bucket -40)
    val seg = "/__t_trunc20_k=(-?\\d+)/".r
    val buckets =
      pruned.inputFiles.toSeq.flatMap(f => seg.findFirstMatchIn(f).map(_.group(1).toLong)).distinct
    assert(buckets.sorted == Seq(-40L, -20L, 0L), s"buckets: $buckets")
  }

  test("optimizeTransformed: reclusters only non-conforming files, no-ops when conforming") {
    val dir = freshDir()
    val fx = tsFixture()
    TableVersions.commitAppendTransformed(
      fx.filter(col("ts") < lit("2024-02-01").cast("timestamp")), dir, "ts", "days")
    TableVersions.commitAppend(
      fx.filter(col("ts") >= lit("2024-02-01").cast("timestamp")).repartition(3), dir)
    val head = TableVersions.currentVersion(spark, dir)

    // recluster to MONTH: the days era AND the flat era both rewrite
    val v = TableVersions.optimizeTransformed(spark, dir, "ts", "month")
    assert(v == head + 1)
    // zero-job rule: a conforming table returns the current version
    assert(TableVersions.optimizeTransformed(spark, dir, "ts", "month") == v)

    // every live file now carries a month segment, and a probe equals
    // its filter twin
    val all = TableVersions.readVersion(spark, dir, v)
    assert(all.inputFiles.forall(_.contains("/__t_month_ts=")))
    assert(all.count() == 90)
    val pruned =
      TableVersions.readVersionTransformPruned(spark, dir, v, "ts", "2024-02-05", "2024-03-10")
    val twin = all.filter(
      col("ts") >= lit("2024-02-05").cast("timestamp") &&
        col("ts") <= lit("2024-03-10").cast("timestamp")
    )
    assert(sortedRows(pruned) == sortedRows(twin))
    // and the old layout still serves prior versions untouched
    assert(TableVersions.readVersion(spark, dir, head).count() == 90)
  }

  test("empty cut keeps schema and returns zero rows; DVs apply on the pruned path") {
    val dir = freshDir()
    val fx = tsFixture()
    TableVersions.commitAppendTransformed(fx, dir, "ts", "days")
    // out-of-range probe: no candidate file
    val none = TableVersions.readVersionTransformPruned(
      spark, dir, TableVersions.currentVersion(spark, dir), "ts", "2025-06-01", "2025-06-30")
    assert(none.count() == 0)
    assert(none.columns.toSeq == Seq("id", "ts", "tag"))

    // MOR delete a slice, then prune-read across it: vectors must apply
    TableVersions.commitDeleteMor(spark, dir, "id % 2 = 0")
    val head = TableVersions.currentVersion(spark, dir)
    val pruned =
      TableVersions.readVersionTransformPruned(spark, dir, head, "ts", "2024-01-05", "2024-01-20")
    // hi "2024-01-20" casts to MIDNIGHT, so Jan 20's 12:30 row (id 19)
    // is excluded: ids 4..18, odd only → 7
    assert(pruned.count() == 7)
    assert(pruned.filter(col("id") % 2 === 0).count() == 0)
  }
}
