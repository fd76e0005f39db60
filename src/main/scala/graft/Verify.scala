package graft
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val spark = GraftSession.get()
    new java.io.File(outDir).mkdirs()
    // queries that throw are recorded explicitly (name → exception) so a
    // failure can never silently vanish from the correctness report
    // (round-8 lesson: 29 erroring queries were invisible until diffed
    // against the previous round)
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    SparkEntry.queries.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        errors(name) = s"${e.getClass.getName}: ${String.valueOf(e.getMessage).take(500)}"
      }
      // queries cache intermediates; don't accumulate between dumps
      HarnessUtil.sweep(spark)
    }
    if (errors.nonEmpty) {
      val body = errors
        .map { case (k, v) => s"${HarnessUtil.jsonQuote(k)}: ${HarnessUtil.jsonQuote(v)}" }
        .mkString("{", ",", "}")
      Files.writeString(Paths.get(s"$outDir/errors.json"), body)
      System.err.println(s"[verify] ${errors.size} queries failed — see $outDir/errors.json")
    }
    // escaping shared with VerifySome — see HarnessUtil.jsonQuote
    def q(s: String): String = HarnessUtil.jsonQuote(s)
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
