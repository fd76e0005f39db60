package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, SparkSpec, Tables}

class ExtrasSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q56 integer-moment stats match Spark's built-in stddev_samp/corr") {
    val derived = SparkEntry
      .queries("q56_stats_moments")(spark, dir)
      .collect()
      .map(r => r.getString(0) -> (r.getAs[Double]("std_q"), r.getAs[Double]("corr_q_line")))
      .toMap
    val builtin = Tables(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        stddev_samp(col("l_quantity")).as("std"),
        corr(col("l_quantity"), col("l_linenumber")).as("c")
      )
      .collect()
      .map(r => r.getString(0) -> (r.getAs[Double]("std"), r.getAs[Double]("c")))
      .toMap
    assert(derived.keySet == builtin.keySet)
    derived.foreach { case (k, (std, c)) =>
      assert(math.abs(std - builtin(k)._1) < 1e-9, s"stddev mismatch for $k")
      assert(math.abs(c - builtin(k)._2) < 1e-9, s"corr mismatch for $k")
    }
  }

  test("q57 distribution windows: quartiles partition evenly, pct_rank in [0,1]") {
    val rows = SparkEntry.queries("q57_distribution_windows")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val q = r.getAs[Long]("quartile")
      assert(q >= 1 && q <= 4)
      val pr = r.getAs[Double]("pct_rank")
      assert(pr >= 0.0 && pr <= 1.0)
      val cd = r.getAs[Double]("cume")
      assert(cd > 0.0 && cd <= 1.0)
    }
    // ntile balance: per segment, quartile sizes differ by at most 1
    rows.groupBy(_.getString(0)).foreach { case (_, seg) =>
      val sizes = seg.groupBy(_.getAs[Long]("quartile")).values.map(_.size)
      assert(sizes.max - sizes.min <= 1)
    }
  }

  test("q58 posexplode positions are dense per document") {
    val rows = SparkEntry.queries("q58_posexplode_tokens")(spark, dir).collect()
    rows.groupBy(_.getLong(0)).foreach { case (_, doc) =>
      val ps = doc.map(_.getAs[Long]("pos")).sorted.toSeq
      assert(ps == (0L until ps.length.toLong))
    }
  }

  test("q60 subqueries agree with the equivalent join formulation") {
    val viaSql = SparkEntry
      .queries("q60_subqueries")(spark, dir)
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    val o = Tables(spark, dir, "orders")
    val building = Tables(spark, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
    val bigLines = Tables(spark, dir, "lineitem").filter(col("l_quantity") >= 45)
    val viaJoin = o
      .join(building, o("o_custkey") === building("c_custkey"), "left_semi")
      .join(bigLines, o("o_orderkey") === bigLines("l_orderkey"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    assert(viaSql == viaJoin)
  }

  test("q74 HLL sketch estimates track exact distinct counts") {
    val est = SparkEntry
      .queries("q74_hll_sketch")(spark, dir)
      .collect()
      .map(r => r.getString(0) -> r.getAs[Long]("approx_users"))
      .toMap
    val exactPer = Tables(spark, dir, "events")
      .groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("d"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    val exactAll = Tables(spark, dir, "events")
      .agg(countDistinct(col("user_id")))
      .head()
      .getLong(0)
    assert(est.keySet == exactPer.keySet + "_all")
    (exactPer + ("_all" -> exactAll)).foreach { case (k, exact) =>
      val e = est(k)
      assert(math.abs(e - exact) <= math.max(2L, (exact * 0.02).toLong),
        s"$k: estimate $e vs exact $exact")
    }
  }

  test("q76 stratified sample is deterministic and respects strata") {
    val q = SparkEntry.queries("q76_stratified_sample")
    val a = q(spark, dir).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = q(spark, dir).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a == b, "same seed + same input must give the same sample")
    val totals = Tables(spark, dir, "documents")
      .groupBy("lang")
      .agg(count(lit(1)).as("n"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    a.foreach { case (lang, n) => assert(n <= totals(lang), s"$lang oversampled") }
    // en is downsampled at 0.3 — with hundreds of docs the sampled count
    // must fall strictly below the stratum total
    assert(a("en") < totals("en"))
  }

  test("q81 heavy hitters equal the exact > 3% frequency set") {
    val hh = SparkEntry
      .queries("q81_freq_items")(spark, dir)
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    val toks = Tables(spark, dir, "documents")
      .select(explode(split(col("text"), " ")).as("tok"))
    val n = toks.count()
    val exact = toks
      .groupBy("tok")
      .agg(count(lit(1)).as("c"))
      .filter(col("c") > n * 0.03)
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    // freqItems candidates are a superset of true heavy hitters and the
    // exact-count trim removes false positives → sets must be EQUAL
    assert(hh == exact)
    assert(hh.nonEmpty, "corpus should have >3% tokens (top corpus words)")
  }

  test("q82 approx quantiles respect the rank-error bound vs exact") {
    val approx = SparkEntry
      .queries("q82_approx_quantiles")(spark, dir)
      .collect()
      .map(r =>
        r.getString(0) -> (r.getAs[Long]("n"), Seq(
          r.getAs[Double]("q1"), r.getAs[Double]("q2"), r.getAs[Double]("q3")))
      )
      .toMap
    val li = Tables(spark, dir, "lineitem")
    approx.foreach { case (flag, (n, qs)) =>
      val sorted = li
        .filter(col("l_returnflag") === flag)
        .select("l_quantity")
        .orderBy("l_quantity")
        .collect()
        .map(_.getDouble(0))
      Seq(0.25, 0.5, 0.75).zip(qs).foreach { case (p, q) =>
        // GK sketch: returned value's rank within eps = n/accuracy of
        // the target rank (accuracy 10000 → eps = n/10000)
        val eps = math.max(1L, n / 10000L)
        val lo = math.max(0L, (p * n).toLong - 2 * eps - 1).toInt
        val hi = math.min(n - 1, (p * n).toLong + 2 * eps + 1).toInt
        assert(q >= sorted(lo) && q <= sorted(hi),
          s"$flag p$p: $q outside rank window [${sorted(lo)}, ${sorted(hi)}]")
      }
    }
  }

  test("q73 bloom pre-filter never drops a true match (no false negatives)") {
    val viaBloom = SparkEntry
      .queries("q73_bloom_prefilter")(spark, dir)
      .select("c_custkey")
      .collect()
      .map(_.getLong(0))
      .toSet
    val o = Tables(spark, dir, "orders").filter(col("o_totalprice") > 400000.0)
    val exact = Tables(spark, dir, "customer")
      .join(o, col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey")
      .collect()
      .map(_.getLong(0))
      .toSet
    assert(viaBloom == exact)
  }
}
