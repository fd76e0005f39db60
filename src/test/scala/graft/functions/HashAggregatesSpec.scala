package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** The native hash-signature aggregates vs their reference
  * formulations: SimHashAgg must be bit-identical to the 64-column
  * SUM(±1) majority vote it replaced; MinHashSig must equal a
  * driver-side recomputation of min(fmix64(h ^ seed_i)) per slot.
  */
class HashAggregatesSpec extends AnyFunSuite with SparkSpec {

  test("simhash_agg equals the 64-column SUM(±1) majority-vote formulation") {
    import spark.implicits._
    val toks = (1L to 400L)
      .map(i => (i % 7, s"tok_${i * 2654435761L % 97}"))
      .toDF("doc_id", "t")
      .select(col("doc_id"), xxhash64(col("t")).as("h"))
      .cache()

    val native = toks
      .groupBy("doc_id")
      .agg(expr("simhash_agg(h)").as("simhash"))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap

    val voteCols = (0 until 64).map(i =>
      sum(when(expr(s"shiftright(h, $i) & 1") === 1, 1L).otherwise(-1L)).as(s"v$i")
    )
    val simhash = (0 until 64)
      .map(i => when(col(s"v$i") > 0, lit(1L << i)).otherwise(lit(0L)))
      .reduce(_ bitwiseOR _)
    val reference = toks
      .groupBy("doc_id")
      .agg(voteCols.head, voteCols.tail: _*)
      .select(col("doc_id"), simhash.as("simhash"))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap

    assert(native == reference)
    toks.unpersist()
  }

  test("simhash_agg ignores NULLs; empty group of NULLs gives signature 0") {
    import spark.implicits._
    val df = Seq((1L, Some(5L)), (1L, None), (2L, None))
      .toDF("doc_id", "h")
    val out = df
      .groupBy("doc_id")
      .agg(expr("simhash_agg(h)").as("s"))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    // one hash = its own majority vote → signature = the hash's set bits
    assert(out(1L) == 5L)
    assert(out(2L) == 0L)
  }

  test("minhash_sig equals a driver-side recomputation of the slot minima") {
    import spark.implicits._
    val rows = (1L to 300L).map(i => (i % 5, i * 0x9e3779b97f4a7c15L))
    val df = rows.toDF("doc_id", "h")

    val native = df
      .groupBy("doc_id")
      .agg(expr("minhash_sig(h)").as("sig"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toVector)
      .toMap

    val expected = rows.groupBy(_._1).map { case (d, hs) =>
      d -> (0 until HashAggregates.MinHashSlots).map { i =>
        hs.map { case (_, h) =>
          HashAggregates.fmix64(h ^ HashAggregates.slotSeed(i))
        }.min
      }.toVector
    }

    assert(native == expected)
  }

  test("minhash_sig is a proper MinHash: signature of a union is the slotwise min") {
    import spark.implicits._
    val a = (1L to 50L).map(("a", _))
    val b = (30L to 90L).map(("b", _))
    val u = (a ++ b).map { case (_, h) => ("u", h) }
    val df = (a ++ b ++ u).toDF("g", "h")
    val sigs = df
      .groupBy("g")
      .agg(expr("minhash_sig(h)").as("sig"))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1).toVector)
      .toMap
    val slotwiseMin = sigs("a").zip(sigs("b")).map { case (x, y) => math.min(x, y) }
    assert(sigs("u") == slotwiseMin)
  }
}
