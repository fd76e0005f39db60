package graft

import java.nio.file.{Files, Paths}

/** Benchmark main: runs every SparkEntry query against
  * `SPARK_GRAFT_SF_DIR` and reports per-query seconds.
  *
  * Measurement protocol (round 6): each query runs one UNRECORDED
  * warm-up pass plus three measured passes; the recorded figure is the
  * MEDIAN of the measured three. The warm-up pass pays that query's
  * cold costs — Janino compilation of its generated classes plus C2
  * JIT of the hot loops — which is 2-4× the steady-state cost for the
  * wide-aggregate and JSON-parsing queries (r4 recorded run-1-only
  * numbers and over-reported exactly those: q35 17.6s vs 3.4s warm);
  * a long-lived session pays that once per query shape, not per
  * execution, so the median of the post-warm-up runs is the faithful
  * steady-state figure, while the warm-up time remains auditable as
  * runs[0] in BENCH_detail.json. Between runs the harness sweeps SQL
  * cache + persisted RDDs and forces a GC, so no run inherits the
  * previous one's cached branches or un-reclaimed shuffle files.
  *
  * Execution is forced through the noop sink — a `count()` would let
  * Catalyst prune the whole select list and understate real query cost.
  * Failed queries are reported as explicit "ERROR:..." markers, never
  * as timings.
  *
  * Output protocol: the round harness keeps only the LAST few KB of
  * stdout, so one giant JSON line loses its own head with ~100 queries.
  * Per-query medians are therefore emitted as CHUNKED JSON lines (12
  * queries each, every line independently parseable), followed by one
  * compact headline line. The full per-run detail (warm-up + all
  * measured runs per query) is written to BENCH_detail.json in the
  * working directory.
  */
object Bench {
  // one unrecorded warm-up run + 3 measured runs per query (JMH-style):
  // run 1 pays that query's Janino compilation and C2 JIT of its hot
  // loops, which for several queries is 2-4x steady state (q65: 3.0s
  // warm-up vs 0.7s warm) — a cost a long-lived session pays once, not
  // per query. The recorded figure is the median of the three
  // POST-warm-up runs; the warm-up time is still visible as runs[0] in
  // BENCH_detail.json, so cold cost stays auditable.
  private val WarmupRuns = 1
  private val MeasuredRuns = 3
  private val RunsPerQuery = WarmupRuns + MeasuredRuns

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.get()
    // warm up codegen/classloading, parquet footers, AND the page cache:
    // a full scan of every input table once, so the first query touching
    // a table doesn't absorb its cold-disk read into the measured time
    spark.range(1000).selectExpr("sum(id) AS s").write.format("noop").mode("overwrite").save()
    for (t <- Seq("region", "nation", "customer", "supplier", "part", "orders",
                  "lineitem", "events", "documents", "embeddings"))
      Tables(spark, sfDir, t).write.format("noop").mode("overwrite").save()

    // iterative queries (transitive closure) cache intermediates; drop
    // them so later timings aren't skewed by leaked blocks. clearCache
    // only covers the SQL cache — localCheckpoint blocks live as
    // persisted RDDs and need the RDD-level unpersist. The explicit GC
    // lets the ContextCleaner reclaim dead shuffle files / broadcasts
    // NOW instead of letting tens of GB pile up and evict the page
    // cache (r3 recorded 57s for a query that runs in 2.6s standalone).
    def sweep(): Unit = HarnessUtil.sweep(spark)

    val results: Seq[(String, Either[String, Seq[Double]])] =
      SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        var err: Option[String] = None
        val runs = scala.collection.mutable.ArrayBuffer.empty[Double]
        var i = 0
        while (i < RunsPerQuery && err.isEmpty) {
          val t0 = System.nanoTime()
          try {
            fn(spark, sfDir).write.format("noop").mode("overwrite").save()
            runs += (System.nanoTime() - t0) / 1e9
          } catch {
            case e: Throwable =>
              System.err.println(s"[bench] $name failed: ${e.getMessage}")
              err = Some(e.getClass.getSimpleName)
          }
          sweep()
          i += 1
        }
        name -> err.toLeft(runs.toSeq)
      }

    def r3(v: Double): Double = math.rint(v * 1000) / 1000
    // median of the measured (post-warm-up) runs; a query that errored
    // before completing its warm-up has fewer runs — use what exists
    def median(xs: Seq[Double]): Double = {
      val measured = xs.drop(math.min(WarmupRuns, xs.size - 1))
      r3(measured.sorted.apply(measured.size / 2))
    }

    val medians: Seq[(String, Either[String, Double])] =
      results.map { case (k, v) => k -> v.map(median) }
    def entry(kv: (String, Either[String, Double])): String = kv match {
      case (k, Right(v))  => s""""$k":$v"""
      case (k, Left(err)) => s""""$k":"ERROR:$err""""
    }

    // full detail (every run of every query) → file, for offline reads
    val detail = results
      .map {
        case (k, Right(rs)) =>
          s""""$k":{"runs":[${rs.map(r3).mkString(",")}],"median":${median(rs)}}"""
        case (k, Left(err)) => s""""$k":{"error":"$err"}"""
      }
      .mkString("{", ",", "}")
    val total = r3(medians.collect { case (_, Right(v)) => v }.sum)
    val nerr = medians.count(_._2.isLeft)
    Files.writeString(
      Paths.get("BENCH_detail.json"),
      s"""{"metric":"total","value":$total,"unit":"sec","agg":"warmup${WarmupRuns}_median_of_${MeasuredRuns}",""" +
        s""""queries":$detail,"errors":$nerr,"sf":"$sfDir"}\n"""
    )

    // chunked per-query lines — each line is valid JSON on its own, so
    // the harness tail always carries complete, parseable entries
    medians.grouped(12).zipWithIndex.foreach { case (chunk, ci) =>
      println(s"""{"part":$ci,"queries":${chunk.map(entry).mkString("{", ",", "}")}}""")
    }
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","agg":"warmup${WarmupRuns}_median_of_${MeasuredRuns}","queries_timed":${medians.size - nerr},"errors":$nerr,"sf":"$sfDir"}"""
    )
    spark.stop()
  }
}
