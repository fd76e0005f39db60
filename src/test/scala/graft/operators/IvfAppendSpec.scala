package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, SparkSpec}

/** Pins the incremental IVF index maintenance path (q139):
  *
  *  - post-append probes are bit-identical to a full relayout of the
  *    union corpus under the same centroids — incremental ingest loses
  *    nothing vs rebuild while doing O(batch) work;
  *  - the batch assignment is a pure projection (no Exchange in the
  *    plan) — the map-side-only cost shape that makes per-batch ingest
  *    viable on a growing 100 TB corpus;
  *  - rerunnable in one session (fresh scratch dir per run).
  */
class IvfAppendSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  private def emb =
    graft.Tables(spark, dir, "embeddings")
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x AS double))").as("v"))
      .withColumn("norm", sqrt(expr("aggregate(v, cast(0 AS double), (a, x) -> a + x*x)")))

  test("q139 post-append probe is bit-identical to a union-corpus relayout with the same centroids") {
    val e = emb
    val base = e.filter(col("vec_id") % 4 =!= 3)
    // same fit as q139: quantizer sees only the base corpus
    val cents = IvfIndex.fitCentroids(base, k = 16, maxIter = 5, seed = 42L)
    val idx = new java.io.File("target/graft_scratch/ivf_rebuild_spec").getAbsolutePath
    def wipe(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(wipe))
      f.delete(): Unit
    }
    wipe(new java.io.File(idx))
    IvfIndex.writeLayout(e, cents, idx) // full relayout of the UNION corpus
    val probes = e
      .filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("norm").as("qn"))
    val rebuilt = IvfIndex.probe(spark, idx, probes, nprobe = 2, topK = 5).collect().toSeq

    val appended = SparkEntry.queries("q139_ivf_append")(spark, dir).collect().toSeq
    assert(appended.nonEmpty)
    assert(appended == rebuilt)
  }

  test("append assignment is a pure projection — no Exchange in the plan") {
    val cents = IvfIndex.fitCentroids(emb.filter(col("vec_id") % 4 =!= 3), k = 16)
    val plan = IvfIndex
      .assignCells(emb.filter(col("vec_id") % 4 === 3), cents)
      .queryExecution
      .executedPlan
      .toString
    assert(!plan.contains("Exchange"), plan.take(4000))
  }

  test("appended vectors land in their nearest-centroid cell") {
    val cents = IvfIndex.fitCentroids(emb.filter(col("vec_id") % 4 =!= 3), k = 16)
    val assigned = IvfIndex
      .assignCells(emb.filter(col("vec_id") % 4 === 3), cents)
      .select("vec_id", "v", "cell")
      .collect()
    assert(assigned.nonEmpty)
    assigned.take(50).foreach { r =>
      val v = r.getSeq[Double](1)
      // cents is cell-ascending and minBy keeps the first minimum, so
      // ties break to the lowest cell — the same order struct (d2, cell)
      // sorts under in assignCells
      val best = cents.minBy { case (_, c) =>
        var d = 0.0; var i = 0
        while (i < v.length) { val x = v(i) - c(i); d += x * x; i += 1 }
        d
      }
      assert(r.getInt(2) == best._1, s"vec ${r.getLong(0)}")
    }
  }

  test("q139 is rerunnable in one session (fresh index dir per run)") {
    val run = () => SparkEntry.queries("q139_ivf_append")(spark, dir).collect().toSeq
    assert(run() == run())
  }
}
