package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** Pins what q242's oracle cannot: a schema-drifted landing file
  * refuses the whole sweep loudly with the store unchanged, a
  * conforming retry after removing the bad file succeeds, and
  * first-sweep initialization accepts any consistent schema.
  */
class AutoIngestSpec extends AnyFunSuite with SparkSpec {

  private def fresh(tag: String) = graft.queries.Similarity.freshIndexDir(tag)

  test("schema drift refuses the sweep; the store is untouched; retry works") {
    val s = spark
    import s.implicits._
    val (landing, store) = (fresh("ais_landing"), fresh("ais_store"))
    (0L until 40L)
      .map(i => (i, s"g${i % 3}"))
      .toDF("id", "g")
      .coalesce(1)
      .write
      .parquet(s"$landing/w1")
    assert(AutoIngest.discover(spark, landing, store) == 1L)
    val v0 = TableVersions.currentVersion(spark, store)
    // a drifted delivery: renamed column
    (40L until 50L)
      .map(i => (i, s"g${i % 3}"))
      .toDF("id", "grp")
      .coalesce(1)
      .write
      .parquet(s"$landing/w2")
    intercept[IllegalArgumentException] { AutoIngest.discover(spark, landing, store) }
    assert(TableVersions.currentVersion(spark, store) == v0, "refused sweep must not commit")
    // remove the bad wave; a conforming one ingests
    val fs = new org.apache.hadoop.fs.Path(landing)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$landing/w2"), true)
    (40L until 50L)
      .map(i => (i, s"g${i % 3}"))
      .toDF("id", "g")
      .coalesce(1)
      .write
      .parquet(s"$landing/w3")
    assert(AutoIngest.discover(spark, landing, store) == 1L)
    assert(
      TableVersions
        .readVersion(spark, store, TableVersions.currentVersion(spark, store))
        .count() == 50L
    )
    // provenance column really is the registry
    val seen = TableVersions
      .readVersion(spark, store, TableVersions.currentVersion(spark, store))
      .select("__ingest_src")
      .distinct()
      .collect()
      .map(_.getString(0))
      .toSet
    assert(seen.size == 2 && seen.forall(p => p.startsWith("w1/") || p.startsWith("w3/")))
  }

  test("provenance strips ONLY the leading prefix, even under regex-hostile dir names") {
    val s = spark
    import s.implicits._
    // a landing dir whose name holds regex metacharacters and a
    // sub-path that EMBEDS the landing dir's own name mid-path — the
    // two shapes an unanchored replace() mangles
    val landing = fresh("ais_meta") + "/zone+'a.b(1)"
    val store = fresh("ais_meta_store")
    val nested = s"$landing/deep/zone+'a.b(1)/w1"
    (0L until 10L).map(i => (i, i * 2)).toDF("id", "v").coalesce(1).write.parquet(nested)
    assert(AutoIngest.discover(spark, landing, store) == 1L)
    val seen = TableVersions
      .readVersion(spark, store, TableVersions.currentVersion(spark, store))
      .select("__ingest_src")
      .distinct()
      .collect()
      .map(_.getString(0))
    assert(seen.length == 1)
    // zone-relative: the embedded copy of the dir name survives intact
    assert(seen.head.startsWith("deep/zone+'a.b(1)/w1/"), seen.head)
    // idempotent: the seen-probe matches and the re-sweep is a no-op
    assert(AutoIngest.discover(spark, landing, store) == 0L)
  }
}
