package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the scale-oriented defaults this engine assumes.
  *
  * Designed for a real multi-executor cluster even though tests run on
  * `local[N]`: AQE re-plans shuffles at runtime (coalescing small
  * partitions, converting to broadcast joins, splitting skewed
  * partitions), and the shuffle-partition count is sized to the local
  * parallelism rather than the 200 default.
  *
  * Every entry point (Verify, Bench, tests) builds its session here so
  * configuration cannot drift between the correctness and bench paths.
  */
object GraftSession {

  /** Parallelism: env override, else all cores capped at 32 (the driver
    * contract runs local[32]; smaller machines shouldn't oversubscribe).
    */
  def defaultCpus: Int =
    sys.env
      .get("SPARK_GRAFT_CPUS")
      .map(_.toInt)
      .getOrElse(math.min(32, Runtime.getRuntime.availableProcessors()))

  def builder(master: String = s"local[$defaultCpus]", shufflePartitions: Int = defaultCpus): SparkSession.Builder =
    SparkSession
      .builder()
      .master(master)
      .appName("graft")
      // engine-native SQL functions (custom Catalyst expressions with
      // codegen) — see graft.functions
      .withExtensions(graft.functions.CosineSim.install)
      .withExtensions(graft.functions.RollingHash.install)
      .withExtensions(graft.functions.BloomSketch.install)
      .withExtensions(graft.functions.HashAggregates.install)
      .withExtensions(graft.functions.DistinctUpTo.install)
      .withExtensions(graft.functions.WordShingles.install)
      .withExtensions(graft.functions.CharNgrams.install)
      .withExtensions(graft.functions.Int8QuantizeStats.install)
      .withExtensions(graft.functions.TopKStructs.install)
      // optimizer rules (Rule[LogicalPlan]) — see graft.plans
      .withExtensions(graft.plans.ViewRewrite.install)
      .withExtensions(graft.plans.TopKRewrite.install)
      .withExtensions(graft.plans.JoinElim.install)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      // AQE stays ON by default (the 100 TB-correct setting: runtime
      // coalescing, broadcast conversion, skew splitting); the env
      // override exists for A/B measurement only
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // Shuffle files and broadcast blocks are reclaimed by the
      // ContextCleaner only when the JVM garbage-collects their driver
      // handles; the default periodic-GC interval (30min) lets tens of
      // GB of dead shuffle data pile up across a long multi-query run,
      // evicting the page cache and slowing later queries. One minute
      // keeps a long-lived session's disk footprint bounded.
      .config("spark.cleaner.periodicGC.interval", "1min")
      // ~80 registered queries generate well over the default 100 cached
      // codegen classes; evictions force Janino recompiles mid-run.
      .config("spark.sql.codegen.cache.maxEntries", "1000")
      // TypedImperativeAggregates (minhash_sig / simhash_agg /
      // distinct_up_to) run under ObjectHashAggregateExec, which by
      // default abandons hash aggregation after 128 distinct keys and
      // sort-aggregates the rest — for the shingle-keyed groupBys
      // (10^4-10^6 keys) that means sorting the whole exploded index
      // and serializing every partial buffer (measured 3× on q35).
      // 2^20 keys × ~100B average buffer ≈ 100MB per task keeps the
      // hash path for realistic key counts; past that the sort-based
      // spill path remains the safety net, so memory stays bounded on
      // adversarial key cardinalities.
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", (1 << 20).toString)
      // Some testdata generations store events.ts as INT64
      // TIMESTAMP(NANOS), which Spark's parquet reader rejects by
      // default. With this flag the scan surfaces nanos as a long and
      // Tables.events truncates to micros (schema-adaptive — current
      // generations store TIMESTAMP(US) and skip the conversion). Set
      // here (not in the loader) so building a plan never mutates
      // session state; harmless when no nanos column exists.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")

  def get(): SparkSession = {
    val spark = builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
