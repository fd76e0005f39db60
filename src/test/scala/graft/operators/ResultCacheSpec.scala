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
    val fpA = ResultCache.fingerprint(spark, Seq(src), a)
    assert(fpA == ResultCache.fingerprint(spark, Seq(src), b))
    // a different literal is a different query
    val c = base.filter(col("id") > 11).groupBy("g").agg(count(lit(1)).as("n"))
    assert(fpA != ResultCache.fingerprint(spark, Seq(src), c))
    // any commit moves the key, same plan text or not
    TableVersions.commitAppend(Seq((500L, "g0")).toDF("id", "g"), src)
    val a2 = base.filter(col("id") > 10).groupBy("g").agg(count(lit(1)).as("n"))
    assert(fpA != ResultCache.fingerprint(spark, Seq(src), a2))
    // end to end: hit serves the identical rows
    val cache = fresh("rc_cache_spec")
    val (r1, h1) = ResultCache.run(spark, cache, Seq(src), a2)
    val (r2, h2) = ResultCache.run(spark, cache, Seq(src), a2)
    assert(!h1 && h2)
    assert(r1.collect().toSet == r2.collect().toSet)
  }
}
