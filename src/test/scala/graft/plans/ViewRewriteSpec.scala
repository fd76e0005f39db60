package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** Pins what q224's oracle cannot see: that the rewrite actually FIRES
  * (the optimized plan scans the view relation, not the base), and
  * that every soundness guard refuses — unmappable aggregates (avg,
  * count distinct), group-less aggregates, filters over non-group
  * columns, and unregistered bases all keep their base scan.
  */
class ViewRewriteSpec extends AnyFunSuite with SparkSpec {

  private def scannedRoots(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan
      .collect { case l: LogicalRelation =>
        l.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            fs.location.rootPaths.map(_.toString)
          case _ => Nil
        }
      }
      .flatten

  private def fixture(): (String, String) = {
    val s = spark
    import s.implicits._
    val base = graft.queries.Similarity.freshIndexDir("vr_base")
    val view = graft.queries.Similarity.freshIndexDir("vr_view")
    (0 until 400)
      .map(i => (i.toLong, s"l${i % 3}", s"s${i % 4}", (i % 17).toLong))
      .toDF("id", "lang", "source", "n")
      .write
      .mode("overwrite")
      .parquet(base)
    spark.read
      .parquet(base)
      .groupBy("lang", "source")
      .agg(
        count(lit(1)).as("cnt"),
        sum("n").as("sum_n"),
        min("n").as("min_n"),
        max("n").as("max_n")
      )
      .write
      .mode("overwrite")
      .parquet(view)
    ViewRewrite.register(
      spark,
      base,
      view,
      Seq("lang", "source"),
      Seq(
        ViewRewrite.ViewAgg("count", "", "cnt"),
        ViewRewrite.ViewAgg("sum", "n", "sum_n"),
        ViewRewrite.ViewAgg("min", "n", "min_n"),
        ViewRewrite.ViewAgg("max", "n", "max_n")
      )
    )
    (base, view)
  }

  test("rollup aggregate over the base is answered from the view, exactly") {
    val (base, view) = fixture()
    try {
      val q = spark.read
        .parquet(base)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_rows"), sum("n").as("sum_n"), max("n").as("max_n"))
      val roots = scannedRoots(q)
      assert(roots.nonEmpty && roots.forall(_.contains("vr_view")), s"scanned $roots")
      // values identical to the base-scan answer (computed with the
      // rewrite disabled by unregistering)
      val got = q.orderBy("lang").collect().map(_.toSeq)
      ViewRewrite.unregister(spark, base)
      val want = spark.read
        .parquet(base)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_rows"), sum("n").as("sum_n"), max("n").as("max_n"))
        .orderBy("lang")
      assert(scannedRoots(want).forall(_.contains("vr_base")))
      assert(got.toSeq == want.collect().map(_.toSeq).toSeq)
    } finally ViewRewrite.unregister(spark, base)
  }

  test("group-column filters ride the rewrite; non-group filters refuse it") {
    val (base, _) = fixture()
    try {
      val ok = spark.read
        .parquet(base)
        .filter(col("source") === "s1")
        .groupBy("lang")
        .agg(min("n").as("min_n"))
      assert(scannedRoots(ok).forall(_.contains("vr_view")))
      val got = ok.orderBy("lang").collect().map(_.toSeq)
      ViewRewrite.unregister(spark, base)
      val want =
        spark.read
          .parquet(base)
          .filter(col("source") === "s1")
          .groupBy("lang")
          .agg(min("n").as("min_n"))
          .orderBy("lang")
          .collect()
          .map(_.toSeq)
      assert(got.toSeq == want.toSeq)

      fixture() match {
        case (b2, _) =>
          try {
            val no = spark.read
              .parquet(b2)
              .filter(col("n") > 5) // row-level predicate: view has no rows
              .groupBy("lang")
              .agg(count(lit(1)).as("c"))
            assert(scannedRoots(no).forall(_.contains("vr_base")))
          } finally ViewRewrite.unregister(spark, b2)
      }
    } finally ViewRewrite.unregister(spark, base)
  }

  test("unmappable shapes keep their base scan: avg, distinct, global aggregate") {
    val (base, _) = fixture()
    try {
      val avgQ = spark.read.parquet(base).groupBy("lang").agg(avg("n").as("a"))
      assert(scannedRoots(avgQ).forall(_.contains("vr_base")))
      val distinctQ =
        spark.read.parquet(base).groupBy("lang").agg(countDistinct("source").as("d"))
      assert(scannedRoots(distinctQ).forall(_.contains("vr_base")))
      val globalQ = spark.read.parquet(base).agg(count(lit(1)).as("c"))
      assert(scannedRoots(globalQ).forall(_.contains("vr_base")))
      // and the empty-base semantics the global-aggregate guard protects
      assert(globalQ.head().getLong(0) == 400L)
    } finally ViewRewrite.unregister(spark, base)
  }

  test("scalar post-processing over mapped aggregates rides the rewrite") {
    val (base, _) = fixture()
    try {
      // cast + arithmetic around sum/count collapse into the Aggregate
      // node — the remap must reach through them
      val q = spark.read
        .parquet(base)
        .groupBy("lang")
        .agg((sum("n") * 2 + count(lit(1))).cast("double").as("blend"))
      assert(scannedRoots(q).forall(_.contains("vr_view")), "rewrite did not fire")
      val got = q.orderBy("lang").collect().map(_.toSeq)
      ViewRewrite.unregister(spark, base)
      val want = spark.read
        .parquet(base)
        .groupBy("lang")
        .agg((sum("n") * 2 + count(lit(1))).cast("double").as("blend"))
        .orderBy("lang")
        .collect()
        .map(_.toSeq)
      assert(got.toSeq == want.toSeq)
    } finally ViewRewrite.unregister(spark, base)
  }

  test("rewrite preserves expression ids: downstream operators still resolve") {
    val (base, _) = fixture()
    try {
      // a join ON the aggregate's output exercises attribute resolution
      // above the rewritten node
      val aggd = spark.read
        .parquet(base)
        .groupBy("lang")
        .agg(sum("n").as("sum_n"))
      val joined = aggd
        .join(aggd.select(col("lang").as("l2"), col("sum_n").as("s2")), col("lang") === col("l2"))
        .select("lang", "sum_n", "s2")
      val rows = joined.orderBy("lang").collect()
      assert(rows.length == 3 && rows.forall(r => r.getLong(1) == r.getLong(2)))
      assert(scannedRoots(joined).forall(_.contains("vr_view")))
    } finally ViewRewrite.unregister(spark, base)
  }
}
