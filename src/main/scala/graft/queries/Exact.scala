package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.round

/** THE scaled-integer money/measure rule (README "Correctness model"):
  * fixed-point doubles are aggregated as exact integers so sums are
  * reduction-order independent and hash-identical across engines; the
  * one converting division back to double happens after the aggregate.
  * Single shared implementation — inline copies of this pattern drift
  * (e.g. a future negative-value rounding fix must land everywhere).
  */
object Exact {

  /** dollars.cc → exact integer cents */
  def cents(c: Column): Column = round(c * 100, 0).cast("long")

  /** 3-decimal fixed point → exact integer millis (events.value) */
  def milli(c: Column): Column = round(c * 1000, 0).cast("long")

  /** 6-decimal fixed point → exact integer micros */
  def e6(c: Column): Column = round(c * 1000000L, 0).cast("long")
}
