package graft

import java.nio.file.{Files, Paths}

/** Dev utility: targeted Verify — dump only the named queries
  * (comma-separated in args(0)) plus their oracle SQL to an out dir,
  * for a local DuckDB compare of a subset while iterating (the full
  * `Verify` walks all ~114 queries; this takes minutes off the loop).
  *
  * Usage: runMain graft.VerifySome q35_ngram_jaccard,q67_dedup_clusters \
  *          [/root/testdata/sf0.01] [/tmp/verify_some]
  * then:  python3 .claude/skills/verify/check.py /tmp/verify_some <sfDir>
  */
object VerifySome {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val outDir = if (args.length > 2) args(2) else "/tmp/verify_some"
    val spark = GraftSession.get()
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      SparkEntry
        .queries(name)(spark, sfDir)
        .coalesce(1)
        .write
        .mode("overwrite")
        .parquet(s"$outDir/$name")
    }
    // same JSON escaping rules as Verify — one shared implementation
    def q(s: String): String = HarnessUtil.jsonQuote(s)
    val json = SparkEntry.oracleSql
      .filter(kv => names.contains(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
