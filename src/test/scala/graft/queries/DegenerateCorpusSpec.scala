package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, SparkSpec}

/** Degenerate-corpus robustness: at 100 TB, empty partitions, single-
  * row tables, and pathological duplication all occur — a query that
  * throws on them takes down a whole pipeline stage. Each fixture is a
  * real parquet directory with the production `documents` schema, so
  * the queries run their actual path end-to-end (scan included).
  *
  * Pinned behaviors, not just crash-freedom:
  *  - empty corpus → every query returns an EMPTY result (not an error);
  *  - single document → selection keeps nothing under a 20% budget
  *    (one doc exceeds it) and BPE still learns from the one doc;
  *  - all-identical documents → the near-dup screen's df ∈ [2, 50] cap
  *    deliberately drops shingles shared by >50 docs, so NO pairs form:
  *    mass-identical spam is exact-dedup's job (q19/q20 hash grouping),
  *    not the similarity path's — the documented division of labor.
  */
class DegenerateCorpusSpec extends AnyFunSuite with SparkSpec {

  private def writeDocs(name: String, rows: Seq[(Long, String, String, String, Long)]): String = {
    val dir = new java.io.File(s"target/graft_scratch/degenerate_$name").getAbsolutePath
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete(): Unit
    }
    rm(new java.io.File(dir))
    val sess = spark
    import sess.implicits._
    rows
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write
      .parquet(s"$dir/documents.parquet")
    dir
  }

  private val queriesUnderTest =
    Seq(
      "q140_bpe_train", "q142_bpe_encode", "q143_token_budget", "q144_typicality",
      "q35_ngram_jaccard",
      // round-10 second-half families: sketch, LM scoring, lexicon,
      // tokenizer, governance, and the inverted-index build+lookup
      // (whose empty-corpus index is a partitioned dir with no files —
      // the explicit-schema read path)
      "q159_count_min", "q162_bigram_lm", "q165_lexicon_screen",
      "q174_unigram_segment", "q175_k_anonymity",
      "q170_inverted_lookup", "q173_bm25_rank"
    )

  test("empty corpus: every query returns empty, none throws") {
    val dir = writeDocs("empty", Seq.empty)
    queriesUnderTest.foreach { q =>
      val out = SparkEntry.queries(q)(spark, dir).collect()
      assert(out.isEmpty, s"$q returned ${out.length} rows on an empty corpus")
    }
  }

  test("single document: BPE learns, typicality scores, budget keeps nothing") {
    val dir = writeDocs(
      "single",
      Seq((1L, "the quick brown fox jumps over the lazy dog", "en", "web", 43L))
    )
    // BPE: pairs exist within the one doc's words — training proceeds
    val bpe = SparkEntry.queries("q140_bpe_train")(spark, dir).collect()
    assert(bpe.nonEmpty && bpe.map(_.getLong(0)).distinct.sorted.toSeq == Seq(1L, 2L, 3L))
    // typicality: exactly one scored row
    assert(SparkEntry.queries("q144_typicality")(spark, dir).collect().length == 1)
    // token budget = total DIV 5 < the single doc's tokens → keep nothing
    assert(SparkEntry.queries("q143_token_budget")(spark, dir).collect().isEmpty)
    // no pair partner → no near-dups
    assert(SparkEntry.queries("q35_ngram_jaccard")(spark, dir).collect().isEmpty)
    // bigram LM: the one doc md5-lands in the HELD-OUT split, so the
    // training side is empty — the vv≥1 guard must keep the smoothed
    // denominator defined (ANSI mode would otherwise raise DIVIDE_BY_ZERO)
    val lm = SparkEntry.queries("q162_bigram_lm")(spark, dir).collect()
    assert(lm.length == 1 && lm.head.getLong(3) >= 0L)
    // unigram tokenizer: vocabulary from the one doc still segments it
    assert(SparkEntry.queries("q174_unigram_segment")(spark, dir).collect().nonEmpty)
    // count-min: estimates for the doc's own tokens, all exact (no
    // collisions can undercount; with so few tokens most land alone)
    val cms = SparkEntry.queries("q159_count_min")(spark, dir).collect()
    assert(cms.nonEmpty && cms.forall(r => r.getLong(2) >= r.getLong(1)))
    // k-anonymity: a 1-doc cell generalizes or suppresses, never 'exact'
    val ka = SparkEntry.queries("q175_k_anonymity")(spark, dir).collect()
    assert(ka.length == 1 && ka.head.getAs[String]("disposition") == "suppress")
  }

  test("100 identical documents: similarity screen defers to exact dedup by design") {
    val text = ("alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon")
    val dir = writeDocs("identical", (1L to 100L).map(i => (i, text, "en", "web", text.length.toLong)))
    // every shingle has df=100 > 50 → df cap drops them all → zero pairs
    assert(SparkEntry.queries("q35_ngram_jaccard")(spark, dir).collect().isEmpty)
    // the incremental admission inherits the same rule
    assert(SparkEntry.queries("q146_incremental_neardup")(spark, dir).collect().isEmpty)
    // the EXACT path does catch them: every doc's one 20-token chunk is
    // shared by all 100 docs, so q94 reports it as duplicated
    val chunks = SparkEntry
      .queries("q94_chunk_dedup")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(chunks.length == 100)
    chunks.foreach { case (_, n, dup) => assert(n == 1L && dup == 1L) }
  }
}
