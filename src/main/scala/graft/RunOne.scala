package graft

/** Dev utility: run a single named query against a testdata dir.
  *
  * Usage: runMain graft.RunOne <queryName> [sfDir] [show|count|explain|noop]
  *        runMain graft.RunOne stream [sfDir]   — live streaming drive:
  *        events parquet as a file stream → windowedCounts → memory sink
  */
object RunOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val mode = if (args.length > 2) args(2) else "show"
    val spark = GraftSession.get()
    if (name == "stream") {
      val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
      val events = Tables.normalizeEventsTs(
        spark.readStream
          .schema(schema)
          .option("pathGlobFilter", "events.parquet") // file source needs a dir
          .parquet(sfDir))
      val q = graft.streaming.EventStreams
        .windowedCounts(events)
        .writeStream
        .format("memory")
        .queryName("stream_probe")
        .outputMode("complete")
        .start()
      q.processAllAvailable()
      spark.table("stream_probe").orderBy("bucket_start", "event_type").show(10, truncate = false)
      println(s"stream rows=${spark.table("stream_probe").count()}")
      q.stop()
      spark.stop()
      return
    }
    // construction is timed too: iterative queries (BFS closure) run
    // eager actions while BUILDING the DataFrame
    val tc = System.nanoTime()
    val df = SparkEntry.queries(name)(spark, sfDir)
    val buildSec = (System.nanoTime() - tc) / 1e9
    mode match {
      case "show"    => df.show(20, truncate = false)
      case "count"   => println(s"rows=${df.count()}")
      case "explain" => df.explain("formatted")
      // execute, then print the FINAL adaptive plan — the only way to
      // see which exchange-reuse / broadcast decisions AQE actually
      // made at runtime (static explain shows only the initial plan)
      case "postplan" =>
        df.collect()
        println(df.queryExecution.executedPlan.toString)
      case "noop" =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        println(f"noop-exec ${(System.nanoTime() - t0) / 1e9}%.3f s (build $buildSec%.3f s)")
      // dump the result + this query's oracle SQL the way Verify does,
      // for a single-query DuckDB compare with check.py
      case m if m.startsWith("dump:") =>
        val out = m.drop(5)
        df.coalesce(1).write.mode("overwrite").parquet(s"$out/$name")
        val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
        val sql = SparkEntry.oracleSql.get(name).fold("{}") { q =>
          s"""{"$name": ${mapper.writeValueAsString(q)}}"""
        }
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"$out/oracle_sql.json"),
          sql.getBytes("UTF-8")
        ): Unit
      // noopN (e.g. noop3): repeat the full build+exec cycle N times with
      // the bench harness's inter-run cleanup — separates cold-JIT cost
      // (run 1) from the steady-state cost a warm multi-query session
      // pays (runs 2+), which is what Bench's median-of-3 records.
      case m if m.startsWith("noop") =>
        val n = m.drop(4).toInt
        for (i <- 1 to n) {
          val t0 = System.nanoTime()
          SparkEntry.queries(name)(spark, sfDir)
            .write.format("noop").mode("overwrite").save()
          println(f"noop-exec[$i] ${(System.nanoTime() - t0) / 1e9}%.3f s")
          HarnessUtil.sweep(spark)
        }
    }
    spark.stop()
  }
}
