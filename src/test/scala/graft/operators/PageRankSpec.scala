package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

class PageRankSpec extends AnyFunSuite with SparkSpec {

  private def run(edges: Seq[(String, String)], iters: Int): Map[String, Long] = {
    val sess = spark
    import sess.implicits._
    PageRank
      .ranks(edges.toDF("src", "dst"), "src", "dst", iters)
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
  }

  /** Driver-side recompute with the operator's exact integer formulas. */
  private def reference(edges: Seq[(String, String)], iters: Int): Map[String, Long] = {
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val outdeg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val n = nodes.size.toLong
    val base = (15L * PageRank.Scale) / (100L * n)
    var rank = nodes.map(_ -> PageRank.Scale / n).toMap
    for (_ <- 1 to iters) {
      val contribs = edges
        .map { case (s, d) => d -> rank(s) / outdeg(s) }
        .groupBy(_._1)
        .view
        .mapValues(_.map(_._2).sum)
        .toMap
      rank = nodes.map(v => v -> (base + (85L * contribs.getOrElse(v, 0L)) / 100L)).toMap
    }
    rank
  }

  private val chain = Seq("a" -> "b", "b" -> "c", "c" -> "a", "d" -> "a")
  private val star =
    Seq("h" -> "x", "x" -> "h", "h" -> "y", "y" -> "h", "h" -> "z", "z" -> "h")

  test("matches the driver-side integer recompute on a cycle with a dangler") {
    for (iters <- Seq(0, 1, 3)) {
      assert(run(chain, iters) == reference(chain, iters), s"iters=$iters")
    }
  }

  test("hub of a symmetric star outranks every leaf") {
    val r = run(star, 5)
    assert(Seq("x", "y", "z").forall(leaf => r("h") > r(leaf)))
    assert(r("x") == r("y") && r("y") == r("z")) // symmetric leaves tie exactly
  }

  test("rank mass is conserved up to integer truncation") {
    // each edge truncates < 1 unit at the div, each node < 1 at the
    // damping div, per iteration; dangling nodes (no out-edges) retain
    // their mass out of circulation — chain has none, so the bound is
    // tight
    val iters = 3
    val total = run(chain, iters).values.sum
    val slack = iters * (chain.size + 5)
    assert(total <= PageRank.Scale && total >= PageRank.Scale - slack)
  }

  test("deterministic across runs") {
    assert(run(star, 3) == run(star, 3))
  }

  test("empty edge table yields an empty rank table, no division by zero") {
    assert(run(Seq.empty, 3).isEmpty)
  }

  test("pinEdgePartitioning yields bit-identical ranks with broadcast disabled") {
    val sess = spark
    import sess.implicits._
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val pinned = PageRank
        .ranks(chain.toDF("src", "dst"), "src", "dst", 3, pinEdgePartitioning = true)
        .collect()
        .map(r => r.getString(0) -> r.getLong(1))
        .toMap
      assert(pinned == reference(chain, 3))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("pinned iteration join re-shuffles ONLY the rank side (one exchange, no edge re-sort)") {
    // the exact join shape ranks() runs per iteration, on the pinned
    // edge layout: the edge side must contribute NO exchange and NO
    // sort — the one hashpartitioning exchange (+ sort) belongs to the
    // narrow rank side
    import org.apache.spark.sql.functions.{col, count, lit}
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val w = org.apache.spark.sql.expressions.Window.partitionBy("src")
      val annotated = spark
        .range(1000)
        .selectExpr("id % 100 AS src", "(id * 7) % 100 AS dst")
        .withColumn("outdeg", count(lit(1)).over(w))
      val (edgesWithDeg, _) =
        CheckpointTracking.checkpointHashPartitioned(annotated, Seq("src"), Seq("src"))
      val rank = spark.range(100).selectExpr("id AS node", "id * 10 AS rank_e12")
      val joined = edgesWithDeg.join(rank, edgesWithDeg("src") === rank("node"))
      val plan = joined.queryExecution.executedPlan.toString
      assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1, plan)
      assert(joined.count() == 1000)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("pinned teleport join: the node universe contributes no exchange either") {
    // the second per-iteration join (nodes ⋈ aggregated contribs on
    // node = dst): with the node table checkpointed hash-partitioned
    // (pinEdgePartitioning mode) the join costs 2 exchanges (the
    // contribs path), where a naked checkpoint costs 4 — at 100M+
    // nodes the removed pair is a full node-table shuffle per round
    import org.apache.spark.sql.functions.sum
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      def exchanges(df: org.apache.spark.sql.DataFrame) = {
        df.collect()
        "Exchange hashpartitioning".r.findAllIn(df.queryExecution.executedPlan.toString).size
      }
      val contribs = spark
        .range(500)
        .selectExpr("id % 100 AS dst", "id AS contrib")
        .groupBy("dst")
        .agg(sum("contrib").as("s"))
      val (pinned, _) = CheckpointTracking.checkpointHashPartitioned(
        spark.range(100).toDF("node"), Seq("node"), Seq("node"))
      assert(exchanges(pinned.join(contribs, pinned("node") === contribs("dst"), "left")) == 2)
      val naked = spark.range(100).toDF("node").localCheckpoint()
      assert(exchanges(naked.join(contribs, naked("node") === contribs("dst"), "left")) == 4)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("checkpointHashPartitioned keeps the layout visible; a naked localCheckpoint does NOT") {
    // The iteration-join reuse in PageRank/ConnectedComponents depends
    // on the checkpointed edge table keeping its hash layout visible to
    // the planner. Under AQE a naked localCheckpoint claims
    // UnknownPartitioning (the adaptive plan hides its final
    // partitioning), so the join re-shuffles BOTH sides; the
    // partitioning-retaining checkpoint must bring it back to one.
    // Broadcast is disabled so the join can't sidestep the check;
    // results must also be identical either way.
    import org.apache.spark.sql.functions.col
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val n = spark.conf.get("spark.sql.shuffle.partitions").toInt
      val small = spark.range(10).toDF("id2")
      def exchanges(joined: org.apache.spark.sql.DataFrame): Int =
        "Exchange hashpartitioning".r
          .findAllIn(joined.queryExecution.executedPlan.toString)
          .size

      val naked = spark.range(1000).toDF("id").repartition(n, col("id")).localCheckpoint()
      assert(exchanges(naked.join(small, col("id") === col("id2"))) == 2)

      val (kept, _) = CheckpointTracking.checkpointHashPartitioned(
        spark.range(1000).toDF("id"),
        cols = Seq("id"),
        sortedBy = Seq("id")
      )
      val joined = kept.join(small, col("id") === col("id2"))
      assert(exchanges(joined) == 1, joined.queryExecution.executedPlan.toString)
      assert(
        joined.collect().map(_.getLong(0)).sorted.toSeq ==
          naked.join(small, col("id") === col("id2")).collect().map(_.getLong(0)).sorted.toSeq
      )
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
