package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, SparkSpec}

/** Pins the persistent-index deletion path (q145):
  *
  *  - a tombstoned probe is bit-identical to probing an index BUILT
  *    without the deleted vectors (same centroids) — the anti-join
  *    hides exactly the forgotten set, nothing more or less;
  *  - compaction changes no probe result while physically removing the
  *    rows and clearing the tombstone table;
  *  - dynamic partition pruning survives the tombstone anti-join — the
  *    delete path must not cost the probe its directory-level skip.
  */
class IvfDeleteSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  private def emb =
    graft.Tables(spark, dir, "embeddings")
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x AS double))").as("v"))
      .withColumn("norm", sqrt(expr("aggregate(v, cast(0 AS double), (a, x) -> a + x*x)")))

  private def probes =
    emb
      .filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("norm").as("qn"))

  private def freshDir(name: String): String = {
    val p = new java.io.File(s"target/graft_scratch/$name").getAbsolutePath
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete(): Unit
    }
    rm(new java.io.File(p))
    p
  }

  test("q145 tombstoned probe is bit-identical to an index built without the deleted vectors") {
    val cents = IvfIndex.fitCentroids(emb, k = 16, maxIter = 5, seed = 42L)
    val idx = freshDir("ivf_delete_spec_rebuild")
    IvfIndex.writeLayout(emb.filter(col("vec_id") % 7 =!= 0), cents, idx)
    val rebuilt = IvfIndex.probe(spark, idx, probes, nprobe = 2, topK = 5).collect().toSeq
    val tombstoned = SparkEntry.queries("q145_ivf_delete")(spark, dir).collect().toSeq
    assert(tombstoned.nonEmpty)
    assert(tombstoned == rebuilt)
  }

  test("compaction preserves probes, shrinks the files, and clears the tombstones") {
    val cents = IvfIndex.fitCentroids(emb, k = 16, maxIter = 5, seed = 42L)
    val idx = freshDir("ivf_delete_spec_compact")
    IvfIndex.writeLayout(emb, cents, idx)
    val nAll = emb.count()
    val nDel = emb.filter(col("vec_id") % 7 === 0).count()
    IvfIndex.delete(emb.filter(col("vec_id") % 7 === 0).select("vec_id"), idx)
    val before = IvfIndex.probe(spark, idx, probes, nprobe = 2, topK = 5).collect().toSeq
    IvfIndex.compact(spark, idx)
    val after = IvfIndex.probe(spark, idx, probes, nprobe = 2, topK = 5).collect().toSeq
    assert(after == before)
    assert(!new java.io.File(s"$idx/tombstones").exists())
    assert(spark.read.parquet(s"$idx/data").count() == nAll - nDel)
  }

  test("dynamic partition pruning survives the tombstone anti-join") {
    val cents = IvfIndex.fitCentroids(emb, k = 16, maxIter = 5, seed = 42L)
    val idx = freshDir("ivf_delete_spec_dpp")
    IvfIndex.writeLayout(emb, cents, idx)
    IvfIndex.delete(emb.filter(col("vec_id") % 7 === 0).select("vec_id"), idx)
    val plan = IvfIndex
      .probe(spark, idx, probes, nprobe = 2, topK = 5)
      .queryExecution
      .executedPlan
      .toString
    assert(plan.contains("dynamicpruning"), plan.take(4000))
    assert("PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(plan).isDefined, plan.take(4000))
  }
}
