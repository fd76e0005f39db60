package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, SparkSpec}

/** Pins the persistent IVF index (q133): probe results bit-identical
  * to the in-memory IVF query (same seed/k/nprobe, parquet round-trips
  * doubles exactly), dynamic partition pruning actually in the probe's
  * data scan, and rerunnability (fresh index dir per run).
  */
class IvfIndexSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.01"
  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("q133 persisted-index probe is bit-identical to the in-memory IVF (q46)") {
    val persisted = run("q133_ivf_persist").collect().toSeq
    val inMemory = run("q46_ann_ivf").collect().toSeq
    assert(persisted.nonEmpty)
    assert(persisted == inMemory)
  }

  test("q133 probe scan carries a dynamic-partition-pruning filter on cell") {
    val df = run("q133_ivf_persist")
    val plan = df.queryExecution.executedPlan.toString
    // the broadcast cell join must reach the partitioned scan as a
    // directory-level skip, not a post-scan filter
    assert(plan.contains("dynamicpruning"), plan.take(4000))
    assert("PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(plan).isDefined, plan.take(4000))
  }

  test("q133 is rerunnable in one session (fresh index dir per run)") {
    assert(run("q133_ivf_persist").collect().toSeq == run("q133_ivf_persist").collect().toSeq)
  }
}
