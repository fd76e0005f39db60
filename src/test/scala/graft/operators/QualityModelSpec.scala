package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** Pins the trained quality filter (QualityModel): the classifier
  * separates real docs from the injected garbage twins on the HOLDOUT
  * split (≥ 0.95 accuracy — anything lower means the plumbing, not
  * the separable fixture, is broken), the 0.5 gate actually filters,
  * and a refit reproduces the scores exactly (fixed partition layout
  * ⇒ deterministic LBFGS).
  */
class QualityModelSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("holdout separation, gate behavior, and refit determinism") {
    val scored = QualityModel.trainAndScore(spark, dir).localCheckpoint()
    val holdout = scored.filter(col("part") === "heldout")
    val n = holdout.count()
    assert(n > 50, s"holdout too small: $n")
    val correct = holdout
      .filter(
        (col("label") === 1.0 && col("pass") === 1L) ||
          (col("label") === 0.0 && col("pass") === 0L)
      )
      .count()
    assert(correct.toDouble / n >= 0.95, s"holdout accuracy ${correct.toDouble / n}")
    // the gate is a real filter: both verdicts occur, and garbage
    // passes at most rarely
    val passedGarbage = scored.filter(col("label") === 0.0 && col("pass") === 1L).count()
    val allGarbage = scored.filter(col("label") === 0.0).count()
    assert(passedGarbage.toDouble / allGarbage <= 0.05, s"garbage pass rate $passedGarbage/$allGarbage")
    // refit determinism: same layout, same scores
    val again = QualityModel
      .trainAndScore(spark, dir)
      .select("doc_id", "p_good")
      .collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
      .toMap
    val first = scored
      .select("doc_id", "p_good")
      .collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
      .toMap
    assert(again == first, "refit produced different scores")
  }
}
