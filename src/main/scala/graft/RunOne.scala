package graft

/** Dev utility: run a single named query against a testdata dir.
  *
  * Usage: runMain graft.RunOne <queryName> [sfDir] [show|count|explain|noop]
  */
object RunOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val mode = if (args.length > 2) args(2) else "show"
    val spark = GraftSession.get()
    val df = SparkEntry.queries(name)(spark, sfDir)
    mode match {
      case "show"    => df.show(20, truncate = false)
      case "count"   => println(s"rows=${df.count()}")
      case "explain" => df.explain("formatted")
      case "noop" =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        println(f"noop-exec ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
