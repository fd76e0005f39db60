package graft.queries

import java.security.MessageDigest

import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, SparkSpec}

/** Pins q159 (count-min sketch), q162 (held-out bigram LM), and q165
  * (lexicon screen) against plain-Scala recomputations at sf0.001 —
  * independent implementations of the same definitions, no Spark and
  * no SQL, so an error shared by the query and its DuckDB oracle
  * (both engines parsing the same subtly-wrong formula) still fails
  * here.
  */
class SketchLmSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def md5hex(s: String): String =
    MessageDigest
      .getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x")
      .mkString

  private def docs(): Seq[(Long, Array[String])] = {
    val rows = spark.read
      .parquet(s"$dir/documents.parquet")
      .select("doc_id", "text")
      .collect()
    rows.toSeq.map(r => r.getLong(0) -> r.getString(1).split(" ").filter(_.nonEmpty))
  }

  test("q159 estimates equal an independent sketch recompute and never undercount") {
    val (d, w) = (4, 16)
    val toks = docs().flatMap(_._2)
    val exact = toks.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    def bucket(j: Int, tok: String): Long =
      java.lang.Long.parseLong(md5hex(s"$j:$tok").take(8), 16) % w
    // counters: the d×w matrix the relational formulation materializes
    val counters = Array.fill(d, w)(0L)
    exact.foreach { case (t, n) =>
      (0 until d).foreach(j => counters(j)(bucket(j, t).toInt) += n)
    }
    val top20 = exact.toSeq.sortBy { case (t, n) => (-n, t) }.take(20)
    val expected = top20.map { case (t, n) =>
      val est = (0 until d).map(j => counters(j)(bucket(j, t).toInt)).min
      (t, n, est, est - n)
    }.toSet

    val got = SparkEntry
      .queries("q159_count_min")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == expected)
    // the CMS contract: estimates may collide upward, never downward
    got.foreach { case (t, n, est, over) =>
      assert(est >= n, s"undercount for $t")
      assert(over == est - n)
    }
    // at w=16 < 31 token types, collisions must actually occur — the
    // regime that distinguishes a sketch from an exact counter
    assert(got.exists(_._4 > 0), "no collisions: sketch never exercised")
  }

  test("q162 scores match a plain recompute and no held-out doc leaks into training") {
    val all = docs().filter(_._2.length >= 2)
    def part(id: Long) = if (md5hex(id.toString).head < 'c') "train" else "heldout"
    val bigrams = all.map { case (id, ws) => (id, part(id), ws.init.zip(ws.tail)) }
    val train = bigrams.filter(_._2 == "train").flatMap(_._3)
    val c2 = train.groupBy(identity).map { case (p, xs) => p -> xs.size.toLong }
    val c1 = train.groupBy(_._1).map { case (a, xs) => a -> xs.size.toLong }
    val v = train.map(_._2).distinct.size.toLong
    val expected = bigrams
      .filter(_._2 == "heldout")
      .map { case (id, _, bgs) =>
        val pms = bgs.map { bg =>
          (c2.getOrElse(bg, 0L) + 1L) * 1000000L / (c1.getOrElse(bg._1, 0L) + v)
        }
        (id, bgs.length.toLong, pms.sum, pms.sum / bgs.length)
      }
      .toSet

    val got = SparkEntry
      .queries("q162_bigram_lm")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == expected)
    // leakage safety: every scored doc is in the held-out partition
    got.foreach { case (id, _, _, _) => assert(part(id) == "heldout", s"train doc $id scored") }
    assert(got.nonEmpty)
  }

  test("q165 hits/scores match a plain recompute; flag threshold honored") {
    val lex = Map("slow" -> 4L, "dup" -> 5L, "big" -> 2L, "small" -> 1L)
    val expected = docs()
      .map { case (id, ws) =>
        val hit = ws.filter(lex.contains)
        (id, hit.length.toLong, hit.map(lex).sum)
      }
      .filter(_._2 > 0)
      .map { case (id, h, sc) => (id, h, sc, sc >= 20) }
      .toSet
    val got = SparkEntry
      .queries("q165_lexicon_screen")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toSet
    assert(got == expected)
    // exact-token semantics: "bigger"/"dedup" style superstrings never
    // count — the recompute above matches only whole tokens, so any
    // substring matching in the query would break set equality; also
    // both flag states must be exercised at this scale
    assert(got.exists(_._4) && got.exists(!_._4), "threshold not exercised both ways")
  }
}
