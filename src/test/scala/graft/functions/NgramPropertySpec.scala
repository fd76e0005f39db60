package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** Property-based equivalence for the native n-gram codegen
  * expressions against their built-in HOF formulations, on RANDOM
  * unicode text — the hand-picked tricky corpora in ShinglesSpec /
  * CharNgramsSpec pin known traps (empty tokens, astral plane); this
  * spec sweeps the space between them. Raw ScalaCheck generators with
  * pinned seeds (reproducible; the scalatestplus bridge is not on the
  * offline classpath).
  */
class NgramPropertySpec extends AnyFunSuite with SparkSpec {

  /** Random text over a hostile alphabet: ASCII letters, spaces
    * (including runs → empty tokens), accented BMP chars, an astral
    * emoji, and the empty string. */
  private val genText: Gen[String] =
    Gen.listOf(
      Gen.frequency(
        5 -> Gen.alphaNumChar.map(_.toString),
        3 -> Gen.const(" "),
        1 -> Gen.const("é"),
        1 -> Gen.const("🦀") // 🦀
      )
    ).map(_.mkString)

  private def sample(n: Int, seed: Long): Seq[String] = {
    val p = Gen.Parameters.default
    (0 until n).flatMap(i => genText.apply(p, Seed(seed + i)))
  }

  test("word_shingles == array_distinct over the transform/slice HOF chain on random text") {
    val sess = spark
    import sess.implicits._
    val df = sample(200, 7L).toDF("t")
    val bad = df
      .select(
        col("t"),
        expr("word_shingles(t, 3)").as("native"),
        // CASE guard: sequence(1, 0) DESCENDS in Spark (the quirk the
        // production HOF chains always had to guard against)
        expr("""CASE WHEN size(split(t, ' ')) >= 3 THEN array_distinct(
             transform(sequence(1, size(split(t, ' ')) - 2),
                       i -> array_join(slice(split(t, ' '), i, 3), ' ')))
             ELSE array() END""").as("hof")
      )
      .filter(not(col("native") <=> col("hof")))
      .collect()
    assert(bad.isEmpty, bad.take(3).mkString("\n"))
  }

  test("word_ngrams == the non-distinct transform/slice chain on random text") {
    val sess = spark
    import sess.implicits._
    val df = sample(200, 11L).toDF("t")
    val bad = df
      .select(
        col("t"),
        expr("word_ngrams(t, 2)").as("native"),
        expr("""CASE WHEN size(split(t, ' ')) >= 2 THEN
               transform(sequence(1, size(split(t, ' ')) - 1),
                         i -> array_join(slice(split(t, ' '), i, 2), ' '))
             ELSE array() END""").as("hof")
      )
      .filter(not(col("native") <=> col("hof")))
      .collect()
    assert(bad.isEmpty, bad.take(3).mkString("\n"))
  }

  test("char_ngrams == the substring chain on random text (code-point stepping)") {
    val sess = spark
    import sess.implicits._
    val df = sample(200, 13L).toDF("t")
    val bad = df
      .select(
        col("t"),
        expr("char_ngrams(t, 2)").as("native"),
        expr("""CASE WHEN length(t) >= 2 THEN
               transform(sequence(1, length(t) - 1), i -> substring(t, i, 2))
             ELSE array() END""").as("hof")
      )
      .filter(not(col("native") <=> col("hof")))
      .collect()
    assert(bad.isEmpty, bad.take(3).mkString("\n"))
  }
}
