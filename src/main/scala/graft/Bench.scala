package graft

/** Benchmark main: runs every SparkEntry query against
  * `SPARK_GRAFT_SF_DIR` and prints one JSON line with per-query seconds.
  *
  * Execution is forced through the noop sink — a `count()` would let
  * Catalyst prune the whole select list and understate real query cost.
  * Failed queries are reported as explicit "ERROR:..." markers, never as
  * timings.
  */
object Bench {
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
    val results: Seq[(String, Either[String, Double])] =
      SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        val t0 = System.nanoTime()
        val r =
          try {
            fn(spark, sfDir).write.format("noop").mode("overwrite").save()
            Right((System.nanoTime() - t0) / 1e9)
          } catch {
            case e: Throwable =>
              System.err.println(s"[bench] $name failed: ${e.getMessage}")
              Left(e.getClass.getSimpleName)
          }
        // iterative queries (transitive closure) cache intermediates;
        // drop them so later timings aren't skewed by leaked blocks.
        // clearCache only covers the SQL cache — localCheckpoint blocks
        // live as persisted RDDs and need the RDD-level unpersist.
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
        // ContextCleaner reclaims shuffle files / broadcasts only after
        // the JVM GCs their driver handles; without an explicit GC the
        // run accumulates dead shuffle data on disk, evicts the page
        // cache, and later queries absorb the re-read cost (r3 recorded
        // 57s for a query that runs in 2.6s standalone). GC cost is
        // <100ms per query, well below the noise floor.
        System.gc()
        name -> r
      }
    val qs = results
      .map {
        // 3-decimal seconds: full double precision doubled the line
        // length for zero information
        case (k, Right(v))  => s""""$k":${math.rint(v * 1000) / 1000}"""
        case (k, Left(err)) => s""""$k":"ERROR:$err""""
      }
      .mkString("{", ",", "}")
    val total = math.rint(results.collect { case (_, Right(v)) => v }.sum * 1000) / 1000
    val nerr = results.count(_._2.isLeft)
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$nerr,"sf":"$sfDir"}"""
    )
    // the round harness records only the LAST ~2000 chars of output; the
    // full line above can exceed that with ~90 queries, cutting off the
    // leading total. Repeat the headline in a compact trailing line so
    // the recorded tail always carries it.
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries_timed":${results.size - nerr},"errors":$nerr,"sf":"$sfDir"}"""
    )
    spark.stop()
  }
}
