package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, SparkSpec}
import graft.operators.TableVersions

/** Pins the streaming merge-on-read delete gate (q210): the drained
  * head is batching-independent, every micro-batch lands as exactly
  * one deletion-vector commit (no data file written until the fold),
  * and the post-drain compactMor leaves content untouched.
  */
class StreamMorSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.01"
  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("q210 forced 3-batch replay equals the single drain; one DV commit per batch") {
    val single = run("q210_stream_mor_delete").collect().toSeq
    assert(single.nonEmpty)

    val docs = graft.Tables(spark, dir, "documents")
    val ids = docs.filter(col("doc_id") % 19 === 5).select("doc_id")
    val src = graft.queries.Similarity.freshIndexDir("mor_multi_src")
    ids.repartitionByRange(3, col("doc_id")).write.mode("overwrite").parquet(src)
    val schema = spark.read.parquet(src).schema
    val tdir = graft.queries.Similarity.freshIndexDir("mor_stream_spec")
    val replay = graft.queries.StreamGate
      .runMorDeleteStream(
        spark,
        tdir,
        docs,
        spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(src)
      )
      .collect()
      .toSeq
    assert(replay == single, "drained head depends on the micro-batch split")

    // version history: base append + 3 DV commits + the fold
    assert(TableVersions.currentVersion(spark, tdir) == 4L)
    val hist = TableVersions.history(spark, tdir).collect()
    assert(hist.map(_.getString(1)).toSeq ==
      Seq("init", "mor_delete", "mor_delete", "mor_delete", "mor_compact"))
    // the three delete commits wrote vectors, no data files (n_add=0)
    assert(
      hist.filter(_.getString(1) == "mor_delete").forall(r => r.getAs[Long]("n_add") == 0L),
      "a streaming DV commit wrote data files"
    )
    assert(hist.filter(_.getString(1) == "mor_delete").forall(_.getAs[Boolean]("has_dv")))
    // fold is a logical no-op and the metadata count agrees
    assert(TableVersions.changes(spark, tdir, "doc_id", 3L, 4L).isEmpty)
    assert(TableVersions.countAt(spark, tdir, 4L) == single.size)
  }
}
