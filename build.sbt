ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "dbtjsonreadrspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// forward the forked JVM's stdout verbatim instead of re-logging each
// line with an "[info] " prefix — Bench/Verify emit machine-parsed JSON
// lines and the prefix breaks a strict json parse of the captured tail
run / outputStrategy := Some(StdoutOutput)
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // 16g default: the bench runs ~100 queries × 3 repeats in one JVM;
  // at 8g the old-gen fills with long-lived session state (codegen
  // cache, catalog, block manager) and the shuffle-heavy queries pay
  // inflated GC time late in the run. The contract machine has 128 GiB.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  // throughput collector: the bench is a single long-lived JVM running
  // ~115 queries x 3 repeats; G1's pause-time goal costs measurable
  // aggregate GC time inside the CPU-heavy explode/aggregate stages
  // (stage-level profiling showed multi-second jvmGCTime there).
  // Override with SPARK_GRAFT_GC=G1GC to compare.
  s"-XX:+Use${sys.env.getOrElse("SPARK_GRAFT_GC", "ParallelGC")}",
)
