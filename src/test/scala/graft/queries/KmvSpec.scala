package graft.queries

import java.security.MessageDigest

import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, SparkSpec}

/** Pins q192 (KMV distinct sketch) and q193 (theta-style set
  * operations) against plain-Scala recomputations at sf0.001 — an
  * independent implementation of the same estimator, no Spark and no
  * SQL, so a formula error shared by the query and its DuckDB oracle
  * still fails here. Also asserts the estimator CONTRACTS: the merged
  * sketch lands on exactly the direct global sketch (mergeability),
  * and estimates sit within the theoretical error envelope at k=128.
  */
class KmvSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val K = 128

  private def h60(s: String): Long = {
    val hex = MessageDigest
      .getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x")
      .mkString
      .take(15)
    java.lang.Long.parseLong(hex, 16)
  }

  /** (flag, element-hash) distinct pairs, the q192/q193 input domain. */
  private def pairs(): Set[(String, Long)] = {
    val rows = spark.read
      .parquet(s"$dir/lineitem.parquet")
      .select("l_returnflag", "l_partkey", "l_suppkey")
      .collect()
    rows.toSeq
      .map(r => (r.getString(0), h60(s"${r.getLong(1)}:${r.getLong(2)}")))
      .toSet
  }

  private def est(hashes: Set[Long]): (Long, Long) = {
    val bottom = hashes.toSeq.sorted.take(K)
    val kth = bottom.last
    val e =
      if (bottom.size < K) bottom.size.toLong
      else math.floor((K - 1) * math.pow(2.0, 60) / math.max(kth, 1L)).toLong
    (kth, e)
  }

  test("q192 rows equal an independent KMV recompute; merged == direct global sketch") {
    val dv = pairs()
    val byFlag = dv.groupBy(_._1).map { case (f, xs) => f -> xs.map(_._2) }
    val global = dv.map(_._2)
    // merged sketch: union of per-group bottom-k sets, re-cut to k
    val mergedSet = byFlag.values.flatMap(_.toSeq.sorted.take(K)).toSet

    val expected = byFlag.map { case (f, hs) =>
      val (kth, e) = est(hs)
      (f, Some(hs.size.toLong), kth, e)
    }.toSet ++ Set(
      { val (kth, e) = est(global); ("ALL", Some(global.size.toLong), kth, e) },
      { val (kth, e) = est(mergedSet); ("MERGED", Option.empty[Long], kth, e) }
    )

    val got = SparkEntry
      .queries("q192_kmv_distinct")(spark, dir)
      .collect()
      .map(r =>
        (
          r.getString(0),
          if (r.isNullAt(1)) Option.empty[Long] else Some(r.getLong(1)),
          r.getLong(2),
          r.getLong(3)
        )
      )
      .toSet
    assert(got == expected)

    // mergeability: the MERGED row's sketch tail and estimate must be
    // IDENTICAL to the direct 'ALL' sketch (bottom-k of a union is
    // contained in the union of bottom-ks)
    val all = got.find(_._1 == "ALL").get
    val merged = got.find(_._1 == "MERGED").get
    assert(all._3 == merged._3 && all._4 == merged._4)

    // error envelope: |est - exact| within 5 standard errors
    // (se ≈ exact/√(k−2)) — deterministic data, so this is a pinned
    // property, not a flaky statistical test
    got.filter(_._2.isDefined).foreach { row =>
      val (scope, n, e) = (row._1, row._2.get, row._4)
      val se = n / math.sqrt(K - 2.0)
      assert(math.abs(e - n) <= 5 * se, s"$scope est $e vs exact $n")
    }
  }

  test("q193 row equals an independent set-operation recompute with consistent identities") {
    val dv = pairs()
    val a = dv.collect { case ("A", h) => h }
    val b = dv.collect { case ("R", h) => h }
    val ka = a.toSeq.sorted.take(K)
    val kb = b.toSeq.sorted.take(K)
    val uh = (ka ++ kb).distinct.sorted.take(K)
    val kthU = uh.last
    val estU =
      if (uh.size < K) uh.size.toLong
      else math.floor((K - 1) * math.pow(2.0, 60) / math.max(kthU, 1L)).toLong
    val nBoth = uh.count(h => ka.contains(h) && kb.contains(h))
    val estI =
      if (uh.size < K) nBoth.toLong
      else
        math
          .floor(nBoth * ((K - 1) * math.pow(2.0, 60) / math.max(kthU, 1L)) / K)
          .toLong

    val r = SparkEntry.queries("q193_kmv_set_ops")(spark, dir).collect().head
    assert(r.getLong(0) == a.size && r.getLong(1) == b.size)
    assert(r.getLong(2) == (a ++ b).size)
    assert(r.getLong(3) == a.intersect(b).size)
    assert(r.getLong(6) == estU, "est_union")
    assert(r.getLong(7) == estI, "est_inter")

    // containment identities the estimator guarantees structurally
    assert(r.getLong(7) <= r.getLong(6), "intersection estimate cannot exceed union's")
    assert(r.getLong(3) == r.getLong(0) + r.getLong(1) - r.getLong(2))
  }
}
