package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, SparkSpec}

/** Pins the Viterbi unigram segmenter against brute-force enumeration
  * (same determinized objective, independently implemented) and the
  * full q174 pipeline against a plain-Scala recompute.
  */
class UnigramTokenizerSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** Independent reference: memoized recursion choosing min over
    * (piece count, −score, split point) — the documented total order —
    * versus the operator's iterative strict-improvement DP. */
  private def reference(word: String, vocab: Map[String, Long], maxLen: Int): Seq[String] = {
    val memo = scala.collection.mutable.Map.empty[Int, Option[(Int, Long, Int)]]
    def best(i: Int): Option[(Int, Long, Int)] =
      if (i == 0) Some((0, 0L, -1))
      else
        memo.getOrElseUpdate(
          i, {
            val opts = for {
              j <- math.max(0, i - maxLen) until i
              sc <- vocab.get(word.substring(j, i)).toSeq
              (pc, ps, _) <- best(j).toSeq
            } yield (pc + 1, ps + sc, j)
            if (opts.isEmpty) None
            else Some(opts.minBy { case (c, s, j) => (c, -s, j) })
          }
        )
    best(word.length) match {
      case None => fail(s"reference failed to segment '$word'")
      case Some(_) =>
        val out = scala.collection.mutable.ListBuffer.empty[String]
        var p = word.length
        while (p > 0) {
          val (_, _, j) = best(p).get
          out.prepend(word.substring(j, p))
          p = j
        }
        out.toSeq
    }
  }

  test("DP matches brute-force reference on random words; pieces concatenate back") {
    val rnd = new scala.util.Random(11)
    val alphabet = "abcdr"
    val vocabPieces = Seq("a", "b", "c", "d", "r", "ab", "ba", "cd", "abc", "dr", "abcd", "rab")
    val vocab = vocabPieces.map(p => p -> (100L - 7L * p.length + p.hashCode % 13)).toMap
    for (_ <- 1 to 300) {
      val w = (1 to (1 + rnd.nextInt(9))).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      val got = UnigramTokenizer.segment(w, vocab, 4)
      assert(got.mkString("") == w, s"'$w' not conserved: $got")
      assert(got == reference(w, vocab, 4), s"'$w'")
      // minimality: no segmentation has fewer pieces (brute force over cuts)
      val n = w.length
      val allSegs = (0 until (1 << math.max(0, n - 1))).flatMap { mask =>
        val cuts = (1 until n).filter(i => (mask & (1 << (i - 1))) != 0)
        val bounds = 0 +: cuts :+ n
        val seg = bounds.sliding(2).map { case Seq(a, b) => w.substring(a, b) }.toSeq
        if (seg.forall(p => p.length <= 4 && vocab.contains(p))) Some(seg) else None
      }
      assert(allSegs.map(_.length).min == got.length, s"'$w' not minimal")
    }
  }

  test("q174 census equals an independent plain-Scala pipeline recompute") {
    val docs = spark.read
      .parquet(s"$dir/documents.parquet")
      .select("text")
      .collect()
      .map(_.getString(0))
    val words = docs
      .flatMap(_.toLowerCase.split("[^a-z]+"))
      .filter(_.length >= 2)
      .groupBy(identity)
      .map { case (w, xs) => w -> xs.size.toLong }
    val pieceScores = words.toSeq
      .flatMap { case (w, c) =>
        for {
          st <- 0 until w.length
          en <- (st + 1) to math.min(st + 4, w.length)
        } yield (w.substring(st, en), c)
      }
      .groupBy(_._1)
      .map { case (p, xs) => p -> xs.map(_._2).sum }
    val top40 = pieceScores
      .filter(_._1.length >= 2)
      .toSeq
      .sortBy { case (p, s) => (-s, p) }
      .take(40)
    val vocab = (top40 ++ pieceScores.filter(_._1.length == 1)).toMap
    val census = words.toSeq
      .flatMap { case (w, c) =>
        UnigramTokenizer.segment(w, vocab, 4).map(p => (p, w, c))
      }
      .groupBy(_._1)
      .map { case (p, xs) =>
        (p, xs.map(_._3).sum, xs.map(_._2).distinct.size.toLong)
      }
      .toSeq
      .sortBy { case (p, uses, _) => (-uses, p) }
      .take(30)

    val got = SparkEntry
      .queries("q174_unigram_segment")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSeq
    assert(got == census)
  }

  test("q174 is deterministic across runs") {
    val a = SparkEntry.queries("q174_unigram_segment")(spark, dir).collect().toSeq
    val b = SparkEntry.queries("q174_unigram_segment")(spark, dir).collect().toSeq
    assert(a.nonEmpty && a == b)
  }
}
