package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, SparkSpec}

class TextOpsSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("PII redaction removes every email/phone and leaves clean text unchanged") {
    val sess = spark
    import sess.implicits._
    // strings with PII embedded at varied positions, plus PII-free rows
    val dirty = Seq(
      "reach me at jane.doe@example.com asap",
      "x 555-1234 y",
      "a.b@c.d then 999-0000 twice 111-2222",
      "email: A_1@host.io.",
      "no pii here at all",
      "almost@ but not an email",
      "digits 12-345 but not a phone"
    ).toDF("raw")
    // the production patterns — shared constants so this test can't
    // drift from what q70 actually redacts
    val emailRe = TextOps.EmailRe
    val phoneRe = TextOps.PhoneRe
    val out = dirty
      .select(
        col("raw"),
        regexp_replace(regexp_replace(col("raw"), emailRe, "<EMAIL>"), phoneRe, "<PHONE>")
          .as("clean")
      )
      .collect()
      .map(r => r.getString(0) -> r.getString(1))
      .toMap
    // no residual matches anywhere
    out.values.foreach { c =>
      assert(!c.matches(s".*$emailRe.*"), s"email survived: $c")
      assert(!c.matches(s".*$phoneRe.*"), s"phone survived: $c")
    }
    // every PII row got a placeholder; PII-free rows byte-identical
    assert(out("reach me at jane.doe@example.com asap") == "reach me at <EMAIL> asap")
    assert(out("x 555-1234 y") == "x <PHONE> y")
    assert(out("a.b@c.d then 999-0000 twice 111-2222") == "<EMAIL> then <PHONE> twice <PHONE>")
    assert(out("no pii here at all") == "no pii here at all")
    assert(out("almost@ but not an email") == "almost@ but not an email")
    assert(out("digits 12-345 but not a phone") == "digits 12-345 but not a phone")
  }

  test("q70 census: every doc reports the two injected PII items") {
    val rows = SparkEntry.queries("q70_pii_redact")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_pii") == 2L, s"doc ${r.getLong(0)}: expected 2 PII hits")
      assert(r.getAs[String]("clean_tail").contains("<PHONE>"))
    }
  }

  test("q69 funnel counts are monotonically non-increasing") {
    val rows = SparkEntry
      .queries("q69_filter_funnel")(spark, dir)
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
    assert(rows.map(_._1).toSeq == Seq("0_total", "1_length", "2_lang", "3_stopword"))
    val counts = rows.map(_._2)
    assert(counts.head > 0)
    counts.sliding(2).foreach { case Array(a, b) => assert(a >= b, s"funnel grew: $a -> $b") }
  }

  test("q140 BPE training: full (step, rank) grid, merges actually applied, deterministic") {
    val run = () =>
      SparkEntry
        .queries("q140_bpe_train")(spark, dir)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3), r.getLong(4)))
        .toSeq
    val rows = run()
    // 3 steps × top-5: the exact grid, positive counts
    assert(rows.map(r => (r._1, r._2)) == (for (s <- 1L to 3L; k <- 1L to 5L) yield (s, k)))
    assert(rows.forall(_._5 > 0))
    // the merge learned in step N can never survive as an adjacent pair
    // into step N+1 (the greedy fold merges every (ma, mb) adjacency,
    // and a merged symbol no longer equals ma) — so the winning pair
    // must be absent from all later count tables
    for (step <- 1L to 2L) {
      val (ma, mb) = rows.collectFirst { case (`step`, 1L, a, b, _) => (a, b) }.get
      assert(
        !rows.exists(r => r._1 > step && r._3 == ma && r._4 == mb),
        s"step-$step merge ($ma,$mb) reappeared later"
      )
    }
    assert(run() == rows)
  }

  test("q142 BPE encode: vocabulary complete, characters conserved, learned merges present") {
    val out = SparkEntry
      .queries("q142_bpe_encode")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSeq
    // the alphabet is [a-z] and 3 merges add ≤3 symbols, so ≤29 distinct
    // symbols exist and the LIMIT 30 is provably un-truncated — the
    // output IS the whole vocabulary
    assert(out.nonEmpty && out.size <= 29)
    // character conservation: encoding regroups characters into symbols
    // but never creates or destroys one — Σ cnt·len(sym) must equal the
    // corpus' total within-word character count
    val symChars = out.map { case (sym, cnt, _) => cnt * sym.length }.sum
    val corpusChars = graft.Tables(spark, dir, "documents")
      .select(explode(split(lower(col("text")), "[^a-z]+")).as("w"))
      .filter(length(col("w")) >= 2)
      .agg(sum(length(col("w"))))
      .collect()(0)
      .getLong(0)
    assert(symChars == corpusChars, s"$symChars chars in symbols vs $corpusChars in corpus")
    // the three learned merges must surface as multi-char symbols
    val learned = SparkEntry
      .queries("q140_bpe_train")(spark, dir)
      .collect()
      .collect { case r if r.getLong(1) == 1L => r.getString(2) + r.getString(3) }
    assert(learned.length == 3)
    learned.foreach(m => assert(out.exists(_._1 == m), s"merge $m missing from vocabulary"))
  }

  test("q144 typicality scores equal a plain-Scala recompute; output is the global bottom-25") {
    val docs = graft.Tables(spark, dir, "documents")
      .select("doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> r.getString(1))
    // recompute: within-word char bigrams, corpus frequencies, per-doc mean
    def bigrams(text: String): Seq[String] =
      text.toLowerCase
        .split("[^a-z]+")
        .filter(_.length >= 2)
        .flatMap(w => w.sliding(2))
        .toSeq
    val freq = docs.flatMap { case (_, t) => bigrams(t) }.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val want = docs.flatMap { case (id, t) =>
      val bs = bigrams(t)
      if (bs.isEmpty) None
      else {
        val sumF = bs.map(freq).sum
        Some((id, bs.length.toLong, sumF, sumF * 1000000L / bs.length))
      }
    }.sortBy { case (id, _, _, avg) => (avg, id) }.take(25).toSeq
    val got = SparkEntry
      .queries("q144_typicality")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == want)
  }

  test("BPE fold is exhaustively canonical: all {a,b} strings to length 10 x all merge pairs") {
    // reference greedy left-to-right merge
    def ref(word: String, ma: String, mb: String): String = {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      word.foreach { ch =>
        val s = ch.toString
        if (out.nonEmpty && out.last == ma && s == mb) out(out.length - 1) = ma + mb
        else out += s
      }
      out.mkString(" ")
    }
    val words = (1 to 10).flatMap { n =>
      (0 until (1 << n)).map { bits =>
        (0 until n).map(i => if (((bits >> i) & 1) == 0) 'a' else 'b').mkString
      }
    }
    val cases = for {
      w <- words
      (ma, mb) <- Seq(("a", "a"), ("a", "b"), ("b", "a"), ("b", "b"))
    } yield (w, ma, mb, ref(w, ma, mb))
    val sess = spark
    import sess.implicits._
    val got = cases
      .toDF("w", "ma", "mb", "want")
      .selectExpr(
        "want",
        """aggregate(slice(split(w, ''), 2, size(split(w, '')) - 1), element_at(split(w, ''), 1),
           (acc, x) -> CASE
             WHEN x = mb AND (acc = ma OR right(acc, length(ma)+1) = concat(' ', ma))
             THEN concat(left(acc, length(acc)-length(ma)), ma, mb)
             ELSE concat(acc, ' ', x) END) AS got"""
      )
      .collect()
    assert(got.length == cases.length)
    val bad = got.filter(r => r.getString(1) != r.getString(0))
    assert(bad.isEmpty, s"${bad.length} mismatches, first: ${bad.headOption}")
  }

  test("greedy BPE fold resolves overlapping runs canonically (aaaa -> aa aa)") {
    // the q140 merge fold, applied to adversarial symbol runs: because
    // a merged symbol no longer equals ma, "aaaa" must become "aa aa"
    // (canonical greedy), never "aa a a"
    val sess = spark
    import sess.implicits._
    val out = Seq("aaaa", "aaa", "ababab", "ba")
      .toDF("w")
      .selectExpr("w", "split(w, '') AS sym", "'a' AS ma", "'a' AS mb")
      .selectExpr("""aggregate(slice(sym, 2, size(sym)-1), element_at(sym, 1),
          (acc, x) -> CASE
            WHEN x = mb AND (acc = ma OR right(acc, length(ma)+1) = concat(' ', ma))
            THEN concat(left(acc, length(acc)-length(ma)), ma, mb)
            ELSE concat(acc, ' ', x) END) AS seq""")
      .collect()
      .map(_.getString(0))
      .toSeq
    assert(out == Seq("aa aa", "aa a", "a b a b a b", "b a"))
  }

  test("q75 date spine is dense: consecutive days, zero-filled gaps") {
    val rows = SparkEntry
      .queries("q75_date_spine")(spark, dir)
      .collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
    assert(rows.nonEmpty)
    rows.sliding(2).foreach {
      case Array((d1, _), (d2, _)) => assert(d2 == d1.plusDays(1), s"gap between $d1 and $d2")
      case _                       =>
    }
    // spine covers min..max inclusive; totals reconcile with the raw table
    val nOrders = graft.Tables(spark, dir, "orders").count()
    assert(rows.map(_._2).sum == nOrders)
  }
}
