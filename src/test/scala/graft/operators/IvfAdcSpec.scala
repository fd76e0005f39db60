package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, SparkSpec}

/** Pins the IVFADC composition (q153):
  *
  *  - recall ≥ 0.9 against the exact q40 scan — the quality floor the
  *    raw-vector (non-residual) PQ variant must clear at the chosen
  *    (nprobe, candK);
  *  - dynamic partition pruning reaches the coded scan — the probe
  *    physically skips cold cell directories;
  *  - ZERO corpus-scaled exchanges: every hash exchange whose subtree
  *    reads the index layout sits directly above a bounded heap
  *    aggregate (top_k_structs partials) — the shuffles carry heaps,
  *    never scanned rows;
  *  - determinism under the fixed seeds.
  */
class IvfAdcSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.01"
  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("q153 recall >= 0.9 vs exact q40 top-5") {
    val brute = run("q40_cosine_topk")
      .collect()
      .map(r => (r.getLong(0), r.getAs[Long]("vec_id")))
      .toSet
    val got = run("q153_ivfadc").collect()
    assert(got.length == 50)
    val hits = got.map(r => (r.getLong(0), r.getAs[Long]("vec_id"))).count(brute)
    val recall = hits.toDouble / brute.size
    assert(recall >= 0.9, s"recall $recall")
  }

  test("q153 probe plan: DPP on cell, candidate ids pushed into the re-rank scan, no corpus-scaled exchange") {
    val plan = run("q153_ivfadc").queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"), plan.take(4000))
    assert("PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(plan).isDefined, plan.take(4000))
    // the re-rank fetch must reach parquet as a pushed filter on
    // vec_id (In or folded min/max range), not as a join-time discard
    assert("PushedFilters: \\[[^\\]]*vec_id".r.findFirstIn(plan).isDefined, plan.take(4000))

    // tree-walk the rendered plan: for every hash exchange, if its
    // subtree scans the index layout (FileScan on .../data), the
    // exchange's direct child must be the bounded heap aggregate
    val lines = plan.linesIterator.toVector
    def depth(l: String): Int = {
      val i = l.indexOf("- ")
      if (i < 0) -1 else i
    }
    val offenders = lines.zipWithIndex
      .filter(_._1.contains("Exchange hashpartitioning"))
      .flatMap { case (exLine, i) =>
        val d = depth(exLine)
        val subtree = lines
          .drop(i + 1)
          .takeWhile(l => depth(l) > d || depth(l) == -1)
        val scansCorpus =
          subtree.exists(l => l.contains("FileScan parquet") && l.contains("/data"))
        val childIsHeap = subtree.headOption.exists(_.contains("ObjectHashAggregate"))
        if (scansCorpus && !childIsHeap) Some(exLine.trim) else None
      }
    assert(offenders.isEmpty, s"corpus-scaled exchanges:\n${offenders.mkString("\n")}\n${plan.take(4000)}")
  }

  test("q153 is deterministic under fixed seeds") {
    assert(run("q153_ivfadc").collect().toSeq == run("q153_ivfadc").collect().toSeq)
  }

  private def emb =
    graft.Tables(spark, dir, "embeddings")
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x AS double))").as("v"))
      .withColumn("norm", sqrt(expr("aggregate(v, cast(0 AS double), (a, x) -> a + x*x)")))

  private def probes =
    emb.filter(col("vec_id") < 10).select(col("vec_id").as("q_id"), col("v").as("qv"))

  test("q157 recall report: aggregate recall >= 0.9 and deterministic") {
    val rows = run("q157_index_recall_report").collect()
    assert(rows.length == 20)
    val nTrue = rows.map(_.getAs[Long]("n_true")).sum
    val nHit = rows.map(_.getAs[Long]("n_hit")).sum
    assert(nTrue == 100L)
    assert(nHit.toDouble / nTrue >= 0.9, s"aggregate recall ${nHit.toDouble / nTrue}")
    assert(run("q157_index_recall_report").collect().toSeq == rows.toSeq)
  }

  test("incremental append probes bit-identical to rebuilding on the union corpus") {
    val base = emb.filter(col("vec_id") % 4 =!= 3)
    val batch = emb.filter(col("vec_id") % 4 === 3)
    // build both indexes from the SAME base-fitted models: quantizer
    // and codebooks come from the base corpus either way — the append
    // path must add nothing but the rows
    val idxApp = graft.queries.Similarity.freshIndexDir("ivfadc_append")
    IvfAdc.build(base, idxApp)
    IvfAdc.append(batch, idxApp)
    val appended =
      IvfAdc.probe(spark, idxApp, probes, nprobe = 10, candK = 256, topK = 5).collect().toSeq

    val cents = IvfIndex.fitCentroids(base, k = 16, maxIter = 5, seed = 42L)
    val cb = IvfAdc.fitResidualCodebooks(base, cents)
    val idxFull = graft.queries.Similarity.freshIndexDir("ivfadc_rebuild")
    IvfAdc.writeIndex(emb, cents, cb, idxFull, residual = true)
    val rebuilt =
      IvfAdc.probe(spark, idxFull, probes, nprobe = 10, candK = 256, topK = 5).collect().toSeq

    assert(appended.nonEmpty)
    assert(appended == rebuilt)
  }

  test("delete + compact on the composed layout: probes unchanged, codes column preserved") {
    val idx = graft.queries.Similarity.freshIndexDir("ivfadc_delete")
    IvfAdc.build(emb, idx)
    IvfIndex.delete(emb.filter(col("vec_id") % 7 === 0).select("vec_id"), idx)
    val before = IvfAdc.probe(spark, idx, probes, nprobe = 10, candK = 256, topK = 5).collect().toSeq
    IvfIndex.compact(spark, idx)
    val after = IvfAdc.probe(spark, idx, probes, nprobe = 10, candK = 256, topK = 5).collect().toSeq
    assert(before.nonEmpty)
    assert(after == before)
    // the generalized compaction must carry the coded representation
    val cols = spark.read.parquet(s"$idx/data").columns.toSet
    assert(Set("vec_id", "v", "norm", "codes", "cell").subsetOf(cols), cols.toString)
    assert(!new java.io.File(s"$idx/tombstones").exists())
  }

  test("q183 rotated serving: recall >= 0.9 vs exact, DPP plan retained, deterministic") {
    val brute = run("q40_cosine_topk")
      .collect()
      .map(r => (r.getLong(0), r.getAs[Long]("vec_id")))
      .toSet
    val res = run("q183_rotated_serving")
    val got = res.collect()
    assert(got.length == 50)
    val hits = got.map(r => (r.getLong(0), r.getAs[Long]("vec_id"))).count(brute)
    val recall = hits.toDouble / brute.size
    assert(recall >= 0.9, s"recall $recall")
    // the rotation changes the coding basis, NOT the plan: the probe
    // through a rotated index keeps the DPP cell skip and the pushed
    // re-rank candidates
    val plan = res.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"), plan.take(4000))
    assert("PushedFilters: \\[[^\\]]*vec_id".r.findFirstIn(plan).isDefined, plan.take(4000))
    assert(run("q183_rotated_serving").collect().toSeq == got.toSeq)
  }

  test("rotated append probes bit-identical to rebuilding on the union corpus") {
    val rot = graft.queries.Similarity.pcaRotationMatrix(spark, dir)
    val base = emb.filter(col("vec_id") % 4 =!= 3)
    val batch = emb.filter(col("vec_id") % 4 === 3)
    // append self-configures from the persisted meta row: the batch is
    // rotated through the SAVED matrix, so a vector's codes are
    // bit-identical whether it arrived at build or append time
    val idxApp = graft.queries.Similarity.freshIndexDir("ivfadc_rot_append")
    IvfAdc.build(base, idxApp, rotation = Some(rot))
    IvfAdc.append(batch, idxApp)
    val appended =
      IvfAdc.probe(spark, idxApp, probes, nprobe = 10, candK = 256, topK = 5).collect().toSeq

    val rBase = IvfAdc.applyRotation(base, Some(rot), checkpoint = true)
    val cents = IvfIndex.fitCentroids(rBase, k = 16, maxIter = 5, seed = 42L)
    val cb = IvfAdc.fitResidualCodebooks(rBase, cents)
    val idxFull = graft.queries.Similarity.freshIndexDir("ivfadc_rot_rebuild")
    IvfAdc.writeIndex(
      IvfAdc.applyRotation(emb, Some(rot), checkpoint = false),
      cents,
      cb,
      idxFull,
      residual = true,
      rotation = Some(rot)
    )
    val rebuilt =
      IvfAdc.probe(spark, idxFull, probes, nprobe = 10, candK = 256, topK = 5).collect().toSeq

    assert(appended.nonEmpty)
    assert(appended == rebuilt)
  }

  test("autopilot: zero jobs + bit-stable probes when healthy; refit restores a sagged recall") {
    val idx = graft.queries.Similarity.freshIndexDir("ivfadc_maint_spec")
    val base = emb.filter(col("vec_id") % 2 === 0).localCheckpoint()
    IvfAdc.build(base, idx)
    val anchors = base.filter(col("vec_id") < 40).select(col("vec_id").as("q_id"), col("v").as("qv"))
    val healthyRecall = IvfAdc.recallPct(spark, idx, base, anchors, nprobe = 4, candK = 64)
    val before = IvfAdc.probe(spark, idx, anchors, nprobe = 4, candK = 64, topK = 5).collect().toSeq
    // healthy: no actions, no writes, probes bit-stable
    assert(IvfAdc.maintain(spark, idx, base, anchors, floorPct = healthyRecall, nprobe = 4, candK = 64).isEmpty)
    assert(IvfAdc.probe(spark, idx, anchors, nprobe = 4, candK = 64, topK = 5).collect().toSeq == before)
    // drift: the appended cloud moved; anchors drawn from it
    val drifted = emb
      .filter(col("vec_id") % 2 === 1)
      .select(col("vec_id"), expr("transform(v, x -> x + 0.8d)").as("v"))
      .withColumn("norm", sqrt(expr("aggregate(v, cast(0 AS double), (a, x) -> a + x*x)")))
      .localCheckpoint()
    IvfAdc.append(drifted, idx)
    val corpus = base.unionByName(drifted).localCheckpoint()
    val driftAnchors = drifted.filter(col("vec_id") < 80).select(col("vec_id").as("q_id"), col("v").as("qv"))
    val degraded = IvfAdc.recallPct(spark, idx, corpus, driftAnchors, nprobe = 4, candK = 64)
    val actions = IvfAdc.maintain(spark, idx, corpus, driftAnchors, floorPct = 70L, nprobe = 4, candK = 64)
    assert(actions.nonEmpty, s"degraded recall $degraded% must trigger the refit")
    val restored = IvfAdc.recallPct(spark, idx, corpus, driftAnchors, nprobe = 4, candK = 64)
    assert(restored >= 70L, s"refit must restore recall: $degraded% -> $restored%")
    assert(restored > degraded)
    // idempotent: the refit index is healthy, a second maintain does nothing
    assert(IvfAdc.maintain(spark, idx, corpus, driftAnchors, floorPct = 70L, nprobe = 4, candK = 64).isEmpty)
  }
}
