package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, SparkSpec, Tables}
import graft.operators.{IvfIndex, TableVersions}

/** Pins q169: an IVF index maintained purely from the CDC delta must
  * serve probes bit-identical to an index rebuilt from scratch on the
  * head version with the same centroids — across inserts, erasure
  * deletes, AND re-embed updates (the path that forces the
  * tombstone-fold before re-append).
  */
class CdcSyncSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("CDC-synced probe equals a head-version rebuild with the same quantizer") {
    val tdir = Similarity.freshIndexDir("cdc_spec_emb")
    val emb = Tables(spark, dir, "embeddings")
    TableVersions.commitAppend(emb.filter(col("vec_id") % 4 =!= 3), tdir)
    TableVersions.commitAppend(emb.filter(col("vec_id") % 4 === 3), tdir)
    TableVersions.commitDelete(spark, tdir, "vec_id % 7 = 0")
    TableVersions.commitUpdate(
      spark,
      tdir,
      "vec_id % 11 = 5",
      m => m.withColumn("embedding", expr("transform(embedding, x -> cast(-x AS float))"))
    )
    val (synced, cents) = Versioned.syncedProbe(spark, tdir, 0L, 3L)
    val syncedRows = synced.collect().toSeq
    assert(syncedRows.nonEmpty)

    // reference: fresh layout of the head version, identical centroids
    val head = TableVersions
      .readVersion(spark, tdir, 3L)
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x AS double))").as("v"))
      .withColumn("norm", sqrt(expr("aggregate(v, cast(0 AS double), (a, x) -> a + x*x)")))
    val refIdx = Similarity.freshIndexDir("cdc_spec_ref")
    IvfIndex.writeLayout(head, cents, refIdx)
    val probes = head
      .filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("norm").as("qn"))
    val rebuilt = IvfIndex.probe(spark, refIdx, probes, nprobe = 2, topK = 5).collect().toSeq
    assert(syncedRows == rebuilt)

    // the delta actually exercised all three change types
    val kinds = TableVersions
      .changes(spark, tdir, "vec_id", 0L, 3L)
      .select("change_type")
      .distinct()
      .collect()
      .map(_.getString(0))
      .toSet
    assert(kinds == Set("insert", "delete", "update"))

    // erased ids never surface as neighbors; updated ids still do
    val neighborIds = syncedRows.map(_.getLong(2)).toSet
    assert(neighborIds.forall(id => id % 7 != 0))
  }

  test("q169 is rerunnable and deterministic in one session") {
    val a = SparkEntry.queries("q169_cdc_index_sync")(spark, dir).collect().toSeq
    val b = SparkEntry.queries("q169_cdc_index_sync")(spark, dir).collect().toSeq
    assert(a.nonEmpty && a == b)
  }
}
