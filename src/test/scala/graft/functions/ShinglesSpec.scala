package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** `word_shingles(text, n)` must be bit-identical to the higher-order
  * formulation it replaces in the dedup family:
  * array_distinct(transform(sequence(1, size(ws)-(n-1)),
  *                          i -> concat_ws(' ', slice(ws, i, n))))
  * over ws = split(text, ' ') — including element ORDER
  * (first-occurrence), empty-token handling (leading / embedded /
  * trailing spaces) and non-ASCII payloads.
  */
class ShinglesSpec extends AnyFunSuite with SparkSpec {

  private def hof(n: Int): String =
    s"""array_distinct(transform(sequence(1, size(split(t, ' ')) - ${n - 1}),
        i -> concat_ws(' ', slice(split(t, ' '), i, $n))))"""

  private val tricky = Seq(
    "the quick brown fox jumps over the lazy dog",
    "a b c",
    "a a a a a a",                       // heavy duplication
    "a  b   c d",                        // consecutive spaces -> empty words
    " leading and trailing ",            // boundary empty words
    "naïve café 東京 タワー is über cool",  // multibyte UTF-8
    "one two three one two three one two three", // repeated shingles
    "🦀 rust 🦀 rust 🦀 rust crab",       // astral plane
    "x y",                               // fewer words than n after filter
    "tab\tseparated stays one\ttoken here"
  )

  test("word_shingles(3) == HOF chain on tricky corpus (values AND order)") {
        import spark.implicits._
    val df = tricky.toDF("t").filter(size(split(col("t"), " ")) >= 3)
    val diff = df
      .select(expr("word_shingles(t, 3)").as("nat"), expr(hof(3)).as("ref"))
      .filter(col("nat") =!= col("ref"))
    assert(diff.count() === 0)
  }

  test("word_shingles(5) == HOF chain on tricky corpus") {
        import spark.implicits._
    val df = tricky.toDF("t").filter(size(split(col("t"), " ")) >= 5)
    val diff = df
      .select(expr("word_shingles(t, 5)").as("nat"), expr(hof(5)).as("ref"))
      .filter(col("nat") =!= col("ref"))
    assert(diff.count() === 0)
  }

  test("word_shingles == HOF chain on the documents table (n=3 and n=5)") {
        val docs = spark.read
      .parquet("/root/testdata/sf0.01/documents.parquet")
      .select(col("text").as("t"))
    for (n <- Seq(3, 5)) {
      val filtered = docs.filter(size(split(col("t"), " ")) >= n)
      val diff = filtered
        .select(expr(s"word_shingles(t, $n)").as("nat"), expr(hof(n)).as("ref"))
        .filter(col("nat") =!= col("ref"))
      assert(diff.count() === 0, s"n=$n diverged from the HOF formulation")
    }
  }

  test("fewer than n words yields an empty array; empty string too") {
        import spark.implicits._
    val out = Seq("one two", "", "   ", "single").toDF("t")
      .select(size(expr("word_shingles(t, 3)")).as("n"))
      .collect()
      .map(_.getInt(0))
    // "   " splits into 4 empty words -> 2 shingles ("  " dedup'd? no:
    // shingles "  " and "  " are identical -> 1 distinct)
    assert(out.toSeq === Seq(0, 0, 1, 0))
  }

  test("null text propagates null") {
        import spark.implicits._
    val out = Seq[Option[String]](None, Some("a b c"))
      .toDF("t")
      .select(expr("word_shingles(t, 3)").as("sh"))
      .collect()
    assert(out(0).isNullAt(0))
    assert(!out(1).isNullAt(0))
  }

  test("foldable non-Literal n is accepted; NULL n fails analysis cleanly") {
    // 1+2 is foldable IntegerType at analysis time but NOT a Literal
    // (constant folding runs in the optimizer) — it must evaluate, not
    // crash analysis
    val r = spark.sql("SELECT word_shingles('a b c d', 1 + 2) AS s").collect().head
    assert(r.getSeq[String](0) == Seq("a b c", "b c d"))
    // a NULL n must be an AnalysisException, not a MatchError
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT word_shingles('a b c', CAST(NULL AS INT))").collect()
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT word_ngrams('a b c', CAST(NULL AS INT))").collect()
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT char_ngrams('abc', CAST(NULL AS INT))").collect()
    }
  }
}
