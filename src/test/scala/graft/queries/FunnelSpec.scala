package graft.queries

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** Pins q177's order-sensitive funnel semantics on controlled
  * fixtures — the property the oracle (same formula, same data)
  * cannot distinguish from a naive per-type count.
  */
class FunnelSpec extends AnyFunSuite with SparkSpec {

  private def counts(rows: Seq[(Long, String, Long)]): (Long, Long, Long) = {
    val sess = spark
    import sess.implicits._
    val ev = rows
      .map { case (u, t, sec) => (u, t, new Timestamp(sec * 1000L)) }
      .toDF("user_id", "event_type", "ts")
    Extras.funnelCounts(ev)
  }

  test("a purchase before the first view never converts") {
    // user 1: purchase(1) < view(2) < click(3) — steps 1 and 2 only
    val got = counts(Seq((1L, "purchase", 1L), (1L, "view", 2L), (1L, "click", 3L)))
    assert(got == ((1L, 1L, 0L)))
  }

  test("full ordered journey converts all three steps") {
    val got = counts(Seq((1L, "view", 1L), (1L, "click", 2L), (1L, "purchase", 3L)))
    assert(got == ((1L, 1L, 1L)))
  }

  test("strictly-after: click at the same timestamp as the first view does not count") {
    val got = counts(Seq((1L, "view", 5L), (1L, "click", 5L)))
    assert(got == ((1L, 0L, 0L)))
  }

  test("first-touch: a later view cannot resurrect an earlier click") {
    // click(2) is before the FIRST view(1)? no — view(1) < click(2): converts.
    // user 2: click(1) < view(3) — the click precedes the first view, no step 2
    val got = counts(
      Seq((1L, "view", 1L), (1L, "click", 2L), (2L, "click", 1L), (2L, "view", 3L))
    )
    assert(got == ((2L, 1L, 0L)))
  }

  test("users without a view contribute to no step") {
    val got = counts(Seq((9L, "click", 1L), (9L, "purchase", 2L)))
    assert(got == ((0L, 0L, 0L)))
  }
}
