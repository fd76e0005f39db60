package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** `int8_quantize_stats(e)` must be bit-identical to the five-HOF chain
  * it replaced in q119 — same max-abs scale (floored at 1e-30), same
  * `round()` (BigDecimal HALF_UP, ties away from zero), same reductions
  * — on real embeddings and on adversarial vectors (negatives, ties,
  * zero vectors, subnormals).
  */
class Int8QuantizeSpec extends AnyFunSuite with SparkSpec {

  /** The exact q119 formulation before the native expression. */
  private val hofChain =
    """named_struct(
         'q0',    element_at(q, 1),
         'q_sum', aggregate(q, 0, (a, x) -> a + x),
         'q_min', array_min(q),
         'q_max', array_max(q),
         'n_sat', size(filter(q, x -> abs(x) = 127)))"""

  private def hofDf(df: org.apache.spark.sql.DataFrame) =
    df.withColumn(
        "mx",
        expr("greatest(aggregate(e, cast(0 AS double), (a, x) -> greatest(a, abs(cast(x AS double)))), 1e-30d)")
      )
      .withColumn("q", expr("transform(e, x -> cast(round(cast(x AS double) * 127 / mx) AS int))"))
      .selectExpr("i", s"$hofChain AS ref")

  test("matches the HOF chain on the real embeddings table") {
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id").as("i"), col("embedding").as("e"))
    val nat = emb.selectExpr("i", "int8_quantize_stats(e) AS nat")
    val diff = nat
      .join(hofDf(emb), Seq("i"))
      .filter(col("nat") =!= col("ref"))
    assert(diff.count() == 0)
  }

  test("matches the HOF chain on adversarial vectors") {
    val sess = spark
    import sess.implicits._
    val tricky: Seq[(Long, Seq[Float])] = Seq(
      1L -> Seq(1.0f, -1.0f, 0.5f, -0.5f),          // exact half codes
      2L -> Seq(-3.7f, 2.2f, -0.001f, 3.7f),        // negative max-abs tie
      3L -> Seq(1e-35f, -1e-35f, 0f),               // subnormal: 1e-30 floor engages
      4L -> Seq(42.0f),                             // single element → q0 = ±127
      5L -> Seq(-42.0f),
      6L -> Seq(0.9999999f, -1.0000001f, 1.0f),     // near-tie magnitudes
      7L -> (1 to 64).map(k => ((k * 37 % 19) - 9).toFloat / 7f) // dense mixed
    )
    val df = tricky.toDF("i", "e").select(col("i"), col("e").cast("array<float>").as("e"))
    val nat = df.selectExpr("i", "int8_quantize_stats(e) AS nat")
    val joined = nat.join(hofDf(df), Seq("i"))
    val rows = joined.collect()
    assert(rows.length == tricky.size)
    rows.foreach(r => assert(r.getAs[Any]("nat") == r.getAs[Any]("ref"), r.toString))
  }

  test("empty vector and NULL element yield NULL (safe divergence from the ANSI-error HOF)") {
    val sess = spark
    import sess.implicits._
    val df = Seq(Tuple1(Seq.empty[Float])).toDF("e")
      .select(col("e").cast("array<float>").as("e"))
    assert(df.selectExpr("int8_quantize_stats(e) AS s").head.isNullAt(0))
    val withNull = spark.sql("SELECT int8_quantize_stats(array(CAST(1.0 AS FLOAT), CAST(NULL AS FLOAT))) AS s")
    assert(withNull.head.isNullAt(0))
  }

  test("same result when the expression appears twice in one codegen context") {
    // fixed local names in doGenCode would collide under Janino and
    // silently fall back to interpreted eval — assert the fused plan
    // still answers correctly with two instances
    val out = spark
      .sql("""SELECT int8_quantize_stats(array(CAST(2.0 AS FLOAT), CAST(-4.0 AS FLOAT))) AS a,
                     int8_quantize_stats(array(CAST(1.0 AS FLOAT), CAST(1.0 AS FLOAT))) AS b""")
      .head
    assert(out.getStruct(0).getInt(3) == 64)  // q_max of [2,-4]: 2·127/4 = 63.5 → HALF_UP 64
    assert(out.getStruct(0).getInt(2) == -127) // q_min: the max-abs element
    assert(out.getStruct(1).getInt(2) == 127) // q_min of [1,1] → [127,127]
  }
}
