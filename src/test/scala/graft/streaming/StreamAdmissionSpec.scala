package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, SparkSpec}

/** Pins the live streaming admission path (q149): draining the
  * new-document stream through per-micro-batch admissionPairs must
  * produce exactly the batch q146 verdict set — the stream adds only
  * micro-batching, never a semantic difference. Also rerunnable
  * (fresh temp checkpoint per run).
  */
class StreamAdmissionSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.01"
  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("q149 streamed admission verdicts equal the batch q146 run") {
    val streamed = run("q149_stream_admission").collect().toSeq
    val batch = run("q146_incremental_neardup").collect().toSeq
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("q149 is rerunnable in one session") {
    assert(run("q149_stream_admission").collect().toSeq == run("q149_stream_admission").collect().toSeq)
  }
}
