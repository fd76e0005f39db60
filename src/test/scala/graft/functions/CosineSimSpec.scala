package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

class CosineSimSpec extends AnyFunSuite with SparkSpec {

  test("matches the higher-order-function formulation bit-for-bit") {
    val sess = spark
    import sess.implicits._
    val df = graft.Tables(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x AS double))").as("v"))
    val paired = df.as("a").crossJoin(df.as("b")).filter(col("a.vec_id") < col("b.vec_id")).limit(500)
      .select(
        expr("cosine_sim(a.v, b.v)").as("native"),
        (expr("aggregate(zip_with(a.v, b.v, (x, y) -> x * y), cast(0 AS double), (p, x) -> p + x)") /
          (sqrt(expr("aggregate(a.v, cast(0 AS double), (p, x) -> p + x*x)")) *
            sqrt(expr("aggregate(b.v, cast(0 AS double), (p, x) -> p + x*x)")))).as("hof")
      )
      .collect()
    assert(paired.nonEmpty)
    paired.foreach(r => assert(r.getDouble(0) == r.getDouble(1))) // exact, not approx
  }

  test("two occurrences in one projection stay in codegen (no Janino redefinition)") {
    // Regression: fixed local names in doGenCode collided when the
    // expression appeared twice in one codegen context, silently falling
    // back to interpreted eval. Disable the fallback so a compile error
    // fails the test instead of hiding.
    val prevFallback = spark.conf.get("spark.sql.codegen.fallback")
    val prevFactory  = spark.conf.get("spark.sql.codegen.factoryMode")
    try {
      spark.conf.set("spark.sql.codegen.fallback", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
      val rows = spark
        .sql("""SELECT cosine_sim(array(1.0d, 2.0d), array(2.0d, 1.0d)) AS c1,
                       cosine_sim(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c2
                FROM range(3)""")
        .collect()
      assert(rows.length == 3)
      rows.foreach { r =>
        assert(math.abs(r.getDouble(0) - 0.8) < 1e-15)
        assert(math.abs(r.getDouble(1) - 1.0) < 1e-15)
      }
    } finally {
      spark.conf.set("spark.sql.codegen.fallback", prevFallback)
      spark.conf.set("spark.sql.codegen.factoryMode", prevFactory)
    }
  }

  test("null inputs propagate, identical vectors give 1.0") {
    val one = spark.sql("SELECT cosine_sim(array(1.0d, 2.0d), array(1.0d, 2.0d)) AS c").collect().head
    assert(math.abs(one.getDouble(0) - 1.0) < 1e-15)
    val nul = spark.sql("SELECT cosine_sim(CAST(NULL AS ARRAY<DOUBLE>), array(1.0d)) AS c").collect().head
    assert(nul.isNullAt(0))
    val ortho = spark.sql("SELECT cosine_sim(array(1.0d, 0.0d), array(0.0d, 1.0d)) AS c").collect().head
    assert(ortho.getDouble(0) == 0.0)
  }

  test("mismatched lengths and zero vectors yield NULL, not a truncated score or NaN") {
    // corrupted embedding (wrong dim): must NOT silently truncate
    val short = spark.sql("SELECT cosine_sim(array(1.0d, 2.0d, 3.0d), array(1.0d, 2.0d)) AS c")
      .collect().head
    assert(short.isNullAt(0))
    // zero vector: cosine undefined; NaN would sort above every real
    // score in a descending window
    val zero = spark.sql("SELECT cosine_sim(array(0.0d, 0.0d), array(1.0d, 2.0d)) AS c")
      .collect().head
    assert(zero.isNullAt(0))
    // same corner cases through forced codegen (interpreted and
    // generated paths must agree)
    val prev = spark.conf.get("spark.sql.codegen.factoryMode")
    try {
      spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
      val rows = spark.sql(
        """SELECT cosine_sim(array(1.0d), array(1.0d, 2.0d)) AS a,
                  cosine_sim(array(0.0d), array(1.0d)) AS b
           FROM range(1)""").collect().head
      assert(rows.isNullAt(0) && rows.isNullAt(1))
    } finally spark.conf.set("spark.sql.codegen.factoryMode", prev)
  }

  test("a NULL element yields NULL, matching the HOF's null-poisoned fold") {
    // reading the slot as 0.0 would admit a plausible-but-wrong score
    // for a corrupt row — exactly what the zero-norm rule exists to stop
    val r = spark.sql(
      """SELECT cosine_sim(array(1.0d, CAST(NULL AS DOUBLE)), array(1.0d, 2.0d)) AS a,
                cosine_sim(array(1.0d, 2.0d), array(CAST(NULL AS DOUBLE), 2.0d)) AS b
         FROM range(1)""").collect().head
    assert(r.isNullAt(0) && r.isNullAt(1))
    val prev = spark.conf.get("spark.sql.codegen.factoryMode")
    try {
      spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
      val gen = spark.sql(
        """SELECT cosine_sim(array(1.0d, CAST(NULL AS DOUBLE)), array(1.0d, 2.0d)) AS a
           FROM range(1)""").collect().head
      assert(gen.isNullAt(0))
    } finally spark.conf.set("spark.sql.codegen.factoryMode", prev)
  }
}
