package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, SparkSpec}

/** Pins the live streaming delete path into the persistent IVF index
  * (q155): forget-request micro-batches landing via IvfIndex.delete
  * must leave probes in exactly the state the batch q145 delete
  * produces — bit-identical, because both paths append the same ids
  * into the tombstone table the probe anti-joins. Replay safety is
  * structural: duplicate tombstone ids cannot change an anti-join, so
  * a re-delivered batch is a no-op at the probe level. Also
  * rerunnable: fresh index + checkpoint dirs per run.
  */
class StreamDeleteSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.01"
  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("q155 stream-deleted index probes bit-identical to the batch q145 delete") {
    val streamed = run("q155_stream_ivf_delete").collect().toSeq
    val batch = run("q145_ivf_delete").collect().toSeq
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("q155 is rerunnable in one session (fresh index + checkpoint dirs per run)") {
    assert(run("q155_stream_ivf_delete").collect().toSeq == run("q155_stream_ivf_delete").collect().toSeq)
  }
}
