package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.Join
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** Pins what q241's oracle cannot: every guard rail refuses — filtered
  * dimensions, dimension-column references, outer joins, undeclared
  * pairs — and declare() itself rejects non-unique keys, nullable
  * foreign keys, and orphaned references. Eliminated and un-eliminated
  * plans agree on values.
  */
class JoinElimSpec extends AnyFunSuite with SparkSpec {

  private def fresh(tag: String) = graft.queries.Similarity.freshIndexDir(tag)

  private def joins(df: DataFrame): Int =
    df.queryExecution.optimizedPlan.collect { case j: Join => j }.size

  private def fixture(): (String, String) = {
    val s = spark
    import s.implicits._
    val (fact, dim) = (fresh("je_fact"), fresh("je_dim"))
    (0L until 300L)
      .map(i => (i, i % 20, (i * 7 % 100).toDouble))
      .toDF("row_id", "fk", "x")
      .write
      .mode("overwrite")
      .parquet(fact)
    (0L until 20L).map(k => (k, s"dim$k")).toDF("pk", "label").write.mode("overwrite").parquet(dim)
    (fact, dim)
  }

  test("declared FK eliminates; every guard rail keeps the join; values agree") {
    val (fact, dim) = fixture()
    JoinElim.declare(spark, fact, "fk", dim, "pk")
    try {
      def q(f: DataFrame, d: DataFrame) =
        f.join(d, col("fk") === col("pk")).groupBy("fk").agg(sum("x").as("sx"))
      val fd = spark.read.parquet(fact)
      val dd = spark.read.parquet(dim)
      val elim = q(fd, dd)
      assert(joins(elim) == 0, elim.queryExecution.optimizedPlan.toString)
      // values agree with the un-eliminated plan (undeclared twin dirs)
      val (fact2, dim2) = fixture()
      val full = q(spark.read.parquet(fact2), spark.read.parquet(dim2))
      assert(joins(full) == 1)
      assert(elim.collect().toSet == full.collect().toSet)

      // guard: referencing a dim column keeps the join
      val withDim = fd.join(dd, col("fk") === col("pk")).select("fk", "label")
      assert(joins(withDim) == 1)
      // guard: a filtered dimension keeps the join
      val filtered = fd.join(dd.filter(col("pk") > 10), col("fk") === col("pk")).select("fk", "x")
      assert(joins(filtered) == 1)
      // guard: outer joins keep the join
      val outer = fd.join(dd, col("fk") === col("pk"), "left").select("fk", "x")
      assert(joins(outer) == 1)

      // guard: a DERIVED column renamed to the fk is not the validated
      // column — values like fk+1 may be orphans, the join filters
      val derived = fd
        .withColumn("fk", col("fk") + 1)
        .join(dd, col("fk") === col("pk"))
        .groupBy("fk")
        .agg(sum("x").as("sx"))
      assert(joins(derived) == 1, derived.queryExecution.optimizedPlan.toString)

      // guard: an fk surfaced from a DIFFERENT relation in a fact side
      // that also contains the declared fact (union) was never
      // validated — rows from the other relation may be orphans
      val other = fresh("je_other")
      val s2 = spark
      import s2.implicits._
      Seq((9000L, 9999L, 1.0)).toDF("row_id", "fk", "x").write.mode("overwrite").parquet(other)
      val unioned = fd
        .unionByName(spark.read.parquet(other))
        .join(dd, col("fk") === col("pk"))
        .groupBy("fk")
        .agg(sum("x").as("sx"))
      assert(joins(unioned) == 1, unioned.queryExecution.optimizedPlan.toString)

      // guard: an fk null-extended by an outer join below (fact on the
      // null-producing side) can be NULL at the dim join — keep it
      val probe = fresh("je_probe")
      Seq((9999L, 1L)).toDF("row_id", "tag").write.mode("overwrite").parquet(probe)
      val nullExtended = spark.read
        .parquet(probe)
        .join(fd, Seq("row_id"), "left")
        .join(dd, col("fk") === col("pk"))
        .groupBy("fk")
        .agg(sum("x").as("sx"))
      assert(joins(nullExtended) == 2, nullExtended.queryExecution.optimizedPlan.toString)

      // positive: a FILTERED fact (and an inner self-equi-join below)
      // still eliminates — surviving fk values are a subset of the
      // validated ones, traced to the scan through the filter/join
      val filteredFact = fd
        .filter(col("x") > 10)
        .join(dd, col("fk") === col("pk"))
        .groupBy("fk")
        .agg(sum("x").as("sx"))
      assert(joins(filteredFact) == 0, filteredFact.queryExecution.optimizedPlan.toString)
    } finally JoinElim.undeclare(spark, fact, "fk")
    // undeclared: the join stays
    val fd = spark.read.parquet(fact)
    val dd = spark.read.parquet(dim)
    val after = fd.join(dd, col("fk") === col("pk")).groupBy("fk").agg(sum("x"))
    assert(joins(after) == 1)
  }

  test("declare() validates uniqueness, non-null and referential integrity") {
    val s = spark
    import s.implicits._
    val (fact, dim) = fixture()
    // non-unique pk
    val dupDim = fresh("je_dupdim")
    Seq((1L, "a"), (1L, "b")).toDF("pk", "label").write.mode("overwrite").parquet(dupDim)
    intercept[IllegalArgumentException] { JoinElim.declare(spark, fact, "fk", dupDim, "pk") }
    // nullable fk
    val nullFact = fresh("je_nullfact")
    Seq((1L, Option(2L)), (2L, None))
      .toDF("row_id", "fk")
      .write
      .mode("overwrite")
      .parquet(nullFact)
    intercept[IllegalArgumentException] { JoinElim.declare(spark, nullFact, "fk", dim, "pk") }
    // orphaned fk
    val orphanFact = fresh("je_orphan")
    Seq((1L, 99L)).toDF("row_id", "fk").write.mode("overwrite").parquet(orphanFact)
    intercept[IllegalArgumentException] { JoinElim.declare(spark, orphanFact, "fk", dim, "pk") }
  }
}
