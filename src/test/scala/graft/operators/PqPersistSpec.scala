package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, SparkSpec}

/** Pins the persistent PQ index (q154) and the codebook-fit guardrails:
  *
  *  - post-append probes are bit-identical to re-encoding the union
  *    corpus with the same codebooks — incremental maintenance loses
  *    nothing vs a rebuild;
  *  - the append-side encode is a pure projection (no Exchange), the
  *    property that makes ingest cost O(batch);
  *  - codebooks round-trip through parquet exactly;
  *  - a hung codebook fit fails in bounded time (the await is
  *    time-boxed and the job group cancelled) instead of wedging the
  *    driver.
  */
class PqPersistSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  private def emb =
    graft.Tables(spark, dir, "embeddings")
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x AS double))").as("v"))
      .withColumn("norm", sqrt(expr("aggregate(v, cast(0 AS double), (a, x) -> a + x*x)")))

  test("q154 post-append probe is bit-identical to re-encoding the union corpus") {
    val base = emb.filter(col("vec_id") % 4 =!= 3)
    val cb = PqIndex.fitCodebooks(base)
    val probes = emb
      .filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val rebuilt =
      PqIndex.adcTopK(PqIndex.encode(emb, cb), probes, cb, candK = 50, topK = 5).collect().toSeq
    val appended = SparkEntry.queries("q154_pq_persist")(spark, dir).collect().toSeq
    assert(appended.nonEmpty)
    assert(appended == rebuilt)
  }

  test("append-side encode through saved codebooks is exchange-free") {
    val idx = graft.queries.Similarity.freshIndexDir("pq_persist_spec")
    val cb = PqIndex.fitCodebooks(emb.filter(col("vec_id") % 4 =!= 3))
    PqIndex.saveCodebooks(spark, cb, idx)
    val plan = PqIndex
      .encode(emb.filter(col("vec_id") % 4 === 3), PqIndex.loadCodebooks(spark, idx))
      .queryExecution
      .executedPlan
      .toString
    assert(!plan.contains("Exchange"), plan.take(3000))
  }

  test("codebooks round-trip through parquet exactly") {
    val idx = graft.queries.Similarity.freshIndexDir("pq_roundtrip_spec")
    val cb = PqIndex.fitCodebooks(emb)
    PqIndex.saveCodebooks(spark, cb, idx)
    assert(PqIndex.loadCodebooks(spark, idx) == cb)
  }

  test("codebook fitting fails in bounded time on an expired timeout") {
    import scala.concurrent.duration._
    val t0 = System.nanoTime()
    intercept[IllegalStateException] {
      PqIndex.fitCodebooks(emb, timeout = 1.nanosecond)
    }: Unit
    // the await is the bound — well under a minute even with the
    // localCheckpoint of the training sample paid first
    assert((System.nanoTime() - t0) / 1e9 < 60.0)
  }

  test("non-divisible geometry fails loudly instead of coding a prefix") {
    intercept[IllegalArgumentException] {
      PqIndex.fitCodebooks(emb, m = 7, dim = 64)
    }: Unit
  }
}
