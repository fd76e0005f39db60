package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, SparkSpec, Tables}

/** Independent driver-side recomputes for the corpus-curation queries
  * (q91/q93/q94) — the DuckDB oracle hash-checks them end-to-end in the
  * driver; these specs re-derive the same numbers from the raw text
  * with plain Scala collections, so a bug that happened to be mirrored
  * in the oracle SQL would still be caught.
  */
class CorpusSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.01"
  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  private lazy val texts: Map[Long, Array[String]] =
    Tables(spark, dir, "documents")
      .select("doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1))
      .toMap

  test("q91 repetition stats equal a plain-Scala recompute on every doc") {
    val got = run("q91_repetition_stats")
      .collect()
      .map(r =>
        r.getAs[Long]("doc_id") ->
          (r.getAs[Long]("n_bigrams"), r.getAs[Long]("top_bigram_n"),
            r.getAs[Long]("n_distinct_bigrams"), r.getAs[Long]("n_trigrams"),
            r.getAs[Long]("n_distinct_trigrams"))
      )
      .toMap
    val want = texts.collect {
      case (id, ws) if ws.length >= 3 =>
        val bgs = ws.sliding(2).map(_.mkString(" ")).toSeq
        val tgs = ws.sliding(3).map(_.mkString(" ")).toSeq
        val mode = bgs.groupBy(identity).values.map(_.size).max
        id -> (bgs.size.toLong, mode.toLong, bgs.distinct.size.toLong,
          tgs.size.toLong, tgs.distinct.size.toLong)
    }
    assert(got == want)
  }

  test("q93 corpus mix: totals, bounds, and ppm floor-division reconcile") {
    val rows = run("q93_corpus_mix").collect()
    assert(rows.nonEmpty)
    val grand = rows.map(_.getAs[Long]("total_tokens")).sum
    assert(rows.map(_.getAs[Long]("n_docs")).sum == texts.size)
    assert(grand == texts.values.map(_.length.toLong).sum)
    rows.foreach { r =>
      assert(r.getAs[Long]("min_tokens") <= r.getAs[Long]("max_tokens"))
      assert(r.getAs[Long]("share_ppm") ==
        r.getAs[Long]("total_tokens") * 1000000L / grand)
    }
    // floor division under-counts; the total can't exceed 1M or fall
    // more than one ulp-per-group below it
    val ppm = rows.map(_.getAs[Long]("share_ppm")).sum
    assert(ppm <= 1000000L && ppm > 1000000L - rows.length)
  }

  test("q94 chunk dedup equals a plain-Scala recompute on every doc") {
    val got = run("q94_chunk_dedup")
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> (r.getAs[Long]("n_chunks"), r.getAs[Long]("dup_chunks")))
      .toMap
    val chunks = texts.collect {
      case (id, ws) if ws.length >= 20 =>
        id -> ws.grouped(20).filter(_.length == 20).map(_.mkString(" ")).toSeq
    }
    val df = chunks.toSeq
      .flatMap { case (id, cs) => cs.distinct.map(_ -> id) }
      .groupBy(_._1)
      .map { case (g, xs) => g -> xs.map(_._2).distinct.size }
    val want = chunks.map { case (id, cs) =>
      id -> (cs.size.toLong, cs.count(df(_) >= 2).toLong)
    }
    assert(got == want)
  }

  test("q107 collocation scores equal the integer word2vec formula recomputed in Scala") {
    val uni = texts.values.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = uni.values.sum
    val bi = texts.values
      .flatMap(ws => ws.sliding(2).collect { case Array(a, b) => s"$a $b" })
      .groupBy(identity)
      .view
      .mapValues(_.size.toLong)
      .toMap
    val want = bi.toSeq
      .collect { case (g, cab) if cab > 5 =>
        val Array(a, b) = g.split(" ")
        (g, cab, ((cab - 5) * 1000000L * n) / (uni(a) * uni(b)))
      }
      .sortBy { case (g, _, s) => (-s, g) }
      .take(50)
    val got = run("q107_collocations")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSeq
    assert(got == want)
  }

  test("q110 stride-1 window dedup equals a plain-Scala recompute on every doc") {
    val wins = texts.collect {
      case (id, ws) if ws.length >= 20 =>
        id -> ws.sliding(20).map(_.mkString(" ")).toSeq
    }
    val docFreq = wins.toSeq
      .flatMap { case (id, gs) => gs.distinct.map(_ -> id) }
      .groupBy(_._1)
      .map { case (g, xs) => g -> xs.map(_._2).distinct.size }
    val want = wins.map { case (id, gs) =>
      id -> (gs.size.toLong, gs.count(docFreq(_) >= 2).toLong)
    }
    val got = run("q110_substring_dedup")
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got == want)
  }

  test("q138 corpus health satisfies its own accounting identities") {
    val rows = run("q138_corpus_health").collect()
    assert(rows.nonEmpty)
    val totalDocs = rows.map(_.getAs[Long]("n_docs")).sum
    assert(totalDocs == texts.size)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_docs")
      assert(r.getAs[Long]("n_unique_texts") >= 1 && r.getAs[Long]("n_unique_texts") <= n)
      assert(r.getAs[Long]("n_langs") >= 1)
      // quality is a convex combination of [0,1] terms -> mean micros in range
      val q = r.getAs[Long]("quality_mean_e6")
      assert(q >= 0L && q <= 1000000L)
      assert(r.getAs[Long]("dup_ppm") >= 0L && r.getAs[Long]("dup_ppm") < 1000000L)
      assert(r.getAs[Long]("pii_ppm") >= 0L && r.getAs[Long]("pii_ppm") <= 1000000L)
    }
  }
}
