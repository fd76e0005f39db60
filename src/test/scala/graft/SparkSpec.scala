package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.Suite

/** Shared local session for specs. Suites share one session via
  * getOrCreate; the forked test JVM tears it down at exit.
  */
trait SparkSpec { self: Suite =>
  lazy val spark: SparkSession = {
    val s = GraftSession.builder("local[4]", 4).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
