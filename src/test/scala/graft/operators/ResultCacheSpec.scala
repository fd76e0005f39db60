package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** Pins the cache-key semantics q237's require() sequence cannot:
  * structurally identical plans built through different code paths
  * share one entry, a different literal is a different entry, and a
  * commit to the source changes the key even for the same plan text.
  */
class ResultCacheSpec extends AnyFunSuite with SparkSpec {

  private def fresh(tag: String) = graft.queries.Similarity.freshIndexDir(tag)

  test("key sharing and invalidation follow (canonical plan, versions)") {
    val s = spark
    import s.implicits._
    val src = fresh("rc_src")
    TableVersions.commitAppend(
      (0L until 100L).map(i => (i, s"g${i % 3}")).toDF("id", "g"),
      src
    )
    def base = TableVersions.readVersion(spark, src, TableVersions.currentVersion(spark, src))
    // same query, two different construction styles -> same key
    val a = base.filter(col("id") > 10).groupBy("g").agg(count(lit(1)).as("n"))
    val b = base.where(col("id") > 10).groupBy(col("g")).agg(count(lit(1)).as("n"))
    def pins = Seq(src -> TableVersions.currentVersion(spark, src))
    val pins0 = pins
    val fpA = ResultCache.fingerprint(a, pins0)
    assert(fpA == ResultCache.fingerprint(b, pins0))
    // a different literal is a different query
    val c = base.filter(col("id") > 11).groupBy("g").agg(count(lit(1)).as("n"))
    assert(fpA != ResultCache.fingerprint(c, pins0))
    // any commit moves the key, same plan text or not
    TableVersions.commitAppend(Seq((500L, "g0")).toDF("id", "g"), src)
    val a2 = base.filter(col("id") > 10).groupBy("g").agg(count(lit(1)).as("n"))
    assert(fpA != ResultCache.fingerprint(a2, pins))
    // end to end: hit serves the identical rows
    val cache = fresh("rc_cache_spec")
    val (r1, h1) = ResultCache.run(spark, cache, Seq(src), a2)
    val (r2, h2) = ResultCache.run(spark, cache, Seq(src), a2)
    assert(!h1 && h2)
    assert(r1.collect().toSet == r2.collect().toSet)
  }

  test("evict drops exactly the entries pinned behind a source head; live hits survive") {
    val s = spark
    import s.implicits._
    val src = fresh("rc_ev_src")
    val cache = fresh("rc_ev_cache")
    TableVersions.commitAppend((0L until 50L).map(i => (i, i % 5)).toDF("id", "k"), src)
    def q() = TableVersions
      .readVersion(spark, src, TableVersions.currentVersion(spark, src))
      .groupBy("k")
      .agg(sum("id").as("sid"))
    val (_, h0) = ResultCache.run(spark, cache, Seq(src), q())
    assert(!h0)
    // commits + a second entry at the new head
    TableVersions.commitAppend(Seq((500L, 1L)).toDF("id", "k"), src)
    TableVersions.commitDelete(spark, src, "id = 3")
    val live = q()
    val (_, hLive) = ResultCache.run(spark, cache, Seq(src), live)
    assert(!hLive)
    val fs = new org.apache.hadoop.fs.Path(cache)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.listStatus(new org.apache.hadoop.fs.Path(cache)).length == 2)
    // maintain's hook sweeps the dead entry, keeps the live one
    val actions = TableVersions.maintain(spark, src, resultCacheDir = Some(cache))
    assert(actions.exists(_._1 == "evict_result_cache"), actions.toString)
    assert(fs.listStatus(new org.apache.hadoop.fs.Path(cache)).length == 1)
    // the surviving entry still hits with identical rows
    val (r, hit) = ResultCache.run(spark, cache, Seq(src), q())
    assert(hit)
    assert(r.collect().toSet == live.collect().toSet)
    // idempotent: a second sweep finds nothing
    assert(ResultCache.evict(spark, cache) == 0L)
  }

  test("a sweep never yanks an in-flight publish; empty husks still drop") {
    val s = spark
    import s.implicits._
    val cache = fresh("rc_inflight")
    val fs = new org.apache.hadoop.fs.Path(cache)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // the race window: a concurrent miss has written its staged data
    // but not yet the pins sidecar — exactly what another session's
    // entry looks like mid-publish
    val entry = new org.apache.hadoop.fs.Path(s"$cache/deadbeef00112233")
    Seq((1L, "a")).toDF("id", "g").write.parquet(s"$entry/data_staged_racer")
    assert(ResultCache.evict(spark, cache) == 0L, "sweep deleted an in-flight publish")
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$entry/data_staged_racer")))
    // a pins sidecar that is still being written (unreadable parquet)
    // is also skipped, not treated as a dead entry
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$entry/pins"))
    assert(ResultCache.evict(spark, cache) == 0L, "sweep deleted under a mid-write sidecar")
    // an EMPTY husk has no writer to damage — it drops
    val husk = new org.apache.hadoop.fs.Path(s"$cache/feedfacecafebeef")
    fs.mkdirs(husk)
    assert(ResultCache.evict(spark, cache) == 1L)
    assert(!fs.exists(husk) && fs.exists(entry))
  }
}
