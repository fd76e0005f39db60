package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** `char_ngrams(t, 2)` must be bit-identical to the q33 HOF chain
  * `filter(zip_with(split(t,''), slice(split(t,''), 2, size(...)),
  * (a,b) -> concat(a,b)), x -> x IS NOT NULL)` — including code-point
  * (not UTF-16) stepping; `word_ngrams(t, n)` must match the
  * non-distinct transform/slice/concat_ws chain from q91.
  */
class CharNgramsSpec extends AnyFunSuite with SparkSpec {

  private val hofBigrams =
    """filter(zip_with(split(t, ''), slice(split(t, ''), 2, size(split(t, ''))),
                       (a, b) -> concat(a, b)),
              x -> x IS NOT NULL)"""

  private def hofWordNgrams(n: Int): String =
    s"""transform(sequence(1, size(split(t, ' ')) - ${n - 1}),
         i -> concat_ws(' ', slice(split(t, ' '), i, $n)))"""

  private val tricky = Seq(
    "the quick brown fox",
    "a",
    "",
    "aa",
    "ababab",
    "naïve café 東京 über",
    "🦀x🦀y🦀",                     // astral plane: 4-byte UTF-8 code points
    "  spaces  count too ",
    "tab\there"
  )

  test("char_ngrams(2) == the q33 zip_with chain (values AND order, incl. astral)") {
    import spark.implicits._
    val diff = tricky.toDF("t")
      .select(expr("char_ngrams(t, 2)").as("nat"), expr(hofBigrams).as("ref"))
      .filter(col("nat") =!= col("ref"))
    assert(diff.count() === 0)
  }

  test("char_ngrams(2) == the zip_with chain on the documents table (lowercased)") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.01/documents.parquet")
      .select(lower(col("text")).as("t"))
    val diff = docs
      .select(expr("char_ngrams(t, 2)").as("nat"), expr(hofBigrams).as("ref"))
      .filter(col("nat") =!= col("ref"))
    assert(diff.count() === 0)
  }

  test("word_ngrams(n) == the q91 transform chain for n=2,3 on docs with >= n words") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.01/documents.parquet")
      .select(col("text").as("t"))
    for (n <- Seq(2, 3)) {
      val filtered = docs.filter(size(split(col("t"), " ")) >= n)
      val diff = filtered
        .select(expr(s"word_ngrams(t, $n)").as("nat"), expr(hofWordNgrams(n)).as("ref"))
        .filter(col("nat") =!= col("ref"))
      assert(diff.count() === 0, s"n=$n diverged")
    }
  }

  test("word_ngrams keeps duplicates that word_shingles drops") {
    import spark.implicits._
    val r = Seq("a b a b a b").toDF("t")
      .select(
        size(expr("word_ngrams(t, 2)")).as("all"),
        size(expr("word_shingles(t, 2)")).as("distinct")
      )
      .collect()
      .head
    assert(r.getInt(0) === 5)
    assert(r.getInt(1) === 2) // "a b" and "b a"
  }
}
