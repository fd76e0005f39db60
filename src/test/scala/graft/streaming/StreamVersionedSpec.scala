package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, SparkSpec}
import graft.operators.TableVersions

/** Pins the streaming version-store ingest gate (q186): the drained
  * head's CONTENT equals the batch union independent of micro-batch
  * split (append order never affects a table — versions differ, rows
  * don't), every micro-batch is a real table version (time travel
  * works mid-history), and CDC across the drain reports exactly the
  * streamed keys as inserts.
  */
class StreamVersionedSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.01"
  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("q186 drained head equals the batch union") {
    val got = run("q186_stream_versioned").collect().toSeq
    val expect = graft.Tables(spark, dir, "documents")
      .filter(col("doc_id") % 3 <= 1)
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .orderBy("doc_id")
      .collect()
      .toSeq
    assert(got.nonEmpty)
    assert(got == expect)
  }

  test("forced 3-batch replay: content equal, versions per batch, CDC reports the streamed inserts") {
    val docs = graft.Tables(spark, dir, "documents")
    val src = graft.queries.Similarity.freshIndexDir("versioned_multi_src")
    docs
      .filter(col("doc_id") % 3 === 1)
      .repartitionByRange(3, col("doc_id"))
      .write
      .mode("overwrite")
      .parquet(src)
    val schema = spark.read.parquet(src).schema
    val stream =
      spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(src)
    val tdir = graft.queries.Similarity.freshIndexDir("versioned_stream_spec")
    val streamed = graft.queries.StreamGate
      .runVersionedIngestInto(spark, tdir, docs.filter(col("doc_id") % 3 === 0), stream)
      .collect()
      .toSeq
    assert(streamed == run("q186_stream_versioned").collect().toSeq)
    // one version per micro-batch on top of the base commit
    assert(TableVersions.currentVersion(spark, tdir) == 3L)
    // time travel into the mid-drain history: v1 = base + first batch
    assert(
      TableVersions.readVersion(spark, tdir, 1L).count() >
        TableVersions.readVersion(spark, tdir, 0L).count()
    )
    // CDC across the drain: exactly the streamed doc_ids, all inserts
    val delta = TableVersions.changes(spark, tdir, "doc_id", 0L, 3L).collect()
    assert(delta.forall(_.getString(1) == "insert"))
    val expectIds = docs
      .filter(col("doc_id") % 3 === 1)
      .select("doc_id")
      .collect()
      .map(_.getLong(0))
      .toSet
    assert(delta.map(_.getLong(0)).toSet == expectIds)
  }

  test("q186 is rerunnable in one session") {
    assert(run("q186_stream_versioned").collect().toSeq == run("q186_stream_versioned").collect().toSeq)
  }
}
