package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, SparkSpec}

/** Pins the live streaming ingest path into the persistent IVF index
  * (q141): micro-batches appended via IvfIndex.append must leave the
  * index in exactly the state batch maintenance (q139) produces — the
  * probe results are bit-identical, because both paths assign through
  * the same literal-centroid projection against the same persisted
  * quantizer. Also rerunnable: fresh index + checkpoint dirs per run.
  */
class IvfStreamSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.01"
  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("q141 stream-ingested index probes bit-identical to q139 batch append") {
    val streamed = run("q141_stream_ivf_ingest").collect().toSeq
    val batch = run("q139_ivf_append").collect().toSeq
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("q141 is rerunnable in one session (fresh index + checkpoint dirs per run)") {
    assert(run("q141_stream_ivf_ingest").collect().toSeq == run("q141_stream_ivf_ingest").collect().toSeq)
  }
}
