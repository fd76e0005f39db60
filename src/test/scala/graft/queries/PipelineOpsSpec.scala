package graft.queries

import graft.{SparkSpec, SparkEntry, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Deterministic pins for the training-run preparation operators
  * (q96-q100) beyond their DuckDB oracles: packing invariants, mixture
  * monotonicity, shard determinism/balance, and the Z-order locality
  * claim (bounded per-file ranges on BOTH dimensions, better than a
  * single-dimension sort layout on the non-sorted dimension).
  */
class PipelineOpsSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("q143: kept set fits the budget and is greedily maximal in (bucket desc, doc_id) order") {
    val kept = SparkEntry
      .queries("q143_token_budget")(spark, sf)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("bucket"), r.getAs[Long]("n_tokens")))
    assert(kept.nonEmpty)
    // recompute the universe + budget independently
    val all = Tables(spark, sf, "documents")
      .select(
        col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"),
        floor(TextOps.qualityExpr * lit(1000)).cast("long").as("bucket")
      )
      .collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(1)))
    val budget = all.map(_._3).sum / 5
    val keptTokens = kept.map(_._3).sum
    assert(keptTokens <= budget, s"kept $keptTokens > budget $budget")
    // maximality: walking the selection order, the FIRST unkept doc
    // must not fit — and everything kept must be a prefix of that walk
    val keptIds = kept.map(_._1).toSet
    val ordered = all.sortBy { case (id, b, _) => (-b, id) }
    val prefix = ordered.takeWhile { case (id, _, _) => keptIds(id) }
    assert(prefix.length == kept.length, "kept set is not a prefix of the selection order")
    ordered.drop(prefix.length).headOption.foreach { case (_, _, t) =>
      assert(keptTokens + t > budget, "next candidate would still fit — selection stopped early")
    }
  }

  test("q148: re-read manifest equals source-side recompute; checksum is corruption-sensitive") {
    def sourceManifest = Tables(spark, sf, "documents")
      .select(
        col("doc_id"),
        (instr(lit("0123456789abcdef"), substring(md5(col("doc_id").cast("string")), 1, 1)) - 1)
          .cast("long")
          .as("shard"),
        size(split(col("text"), " ")).cast("long").as("n_tok"),
        expr("cast(conv(substring(md5(concat(cast(doc_id AS string), ':', text)), 1, 15), 16, 10) AS bigint)")
          .as("fp")
      )
    val fromFiles = SparkEntry
      .queries("q148_export_manifest")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    val fromSource = sourceManifest
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("n_tokens"), expr("bit_xor(fp)").as("fp_xor"))
      .orderBy("shard")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    // the write→read round trip changed nothing
    assert(fromFiles == fromSource)
    assert(fromFiles.map(_._2).sum == Tables(spark, sf, "documents").count())
    // losing any single document flips its shard's XOR fingerprint:
    // fp_xor(shard \ doc) == fp_xor(shard) ⊕ fp(doc) ≠ fp_xor(shard)
    // whenever fp(doc) ≠ 0 — check every doc's fp is nonzero
    val zeroFps = sourceManifest.filter(col("fp") === 0L).count()
    assert(zeroFps == 0L)
  }

  test("q96: bins partition the corpus; every bin except a stratum's last is >= budget-64 full") {
    val out = SparkEntry.queries("q96_sequence_pack")(spark, sf).collect()
    val docsTotal = Tables(spark, sf, "documents").count()
    assert(out.map(_.getAs[Long]("n_docs")).sum === docsTotal)
    // within each lang, bins are consecutive from 0 and doc ranges don't overlap
    out.groupBy(_.getAs[String]("lang")).foreach { case (lang, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("bin"))
      assert(sorted.map(_.getAs[Long]("bin")).toSeq === sorted.indices.map(_.toLong))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Long]("last_doc") < b.getAs[Long]("first_doc"), s"overlap in $lang")
        case _ =>
      }
      // a bin only opens when the previous one crossed the budget: all
      // non-final bins hold >= 2048 - (max doc len) tokens by construction;
      // the corpus max doc is < 512 tokens, so use that bound
      sorted.dropRight(1).foreach { r =>
        assert(r.getAs[Long]("tokens") >= 2048 - 512, s"underfull non-final bin in $lang")
      }
    }
  }

  test("q97: weight is sqrt of token mass; rel_weight >= 1 with exactly one minimum at 1") {
    val out = SparkEntry.queries("q97_temperature_mix")(spark, sf).collect()
    out.foreach { r =>
      assert(r.getAs[Double]("weight") === math.sqrt(r.getAs[Long]("n_tokens").toDouble))
      assert(r.getAs[Double]("rel_weight") >= 1.0)
    }
    assert(out.count(_.getAs[Double]("rel_weight") == 1.0) === 1)
    // temperature flattening: the doc-richest language's relative weight is
    // SMALLER than its relative token mass (that's the up-sampling effect)
    val masses = out.map(r => (r.getAs[Long]("n_tokens"), r.getAs[Double]("rel_weight")))
    val (maxTok, maxRel) = masses.maxBy(_._1)
    val minTok = masses.map(_._1).min
    assert(maxRel < maxTok.toDouble / minTok)
  }

  test("q98: shard assignment is deterministic across runs and uses all 16 shards") {
    val a = SparkEntry.queries("q98_shard_assign")(spark, sf).collect()
    val b = SparkEntry.queries("q98_shard_assign")(spark, sf).collect()
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq)
    assert(a.map(_.getAs[Long]("shard")).toSet === (0L until 16L).toSet)
    val counts = a.map(_.getAs[Long]("n_docs"))
    val docsTotal = Tables(spark, sf, "documents").count()
    assert(counts.sum === docsTotal)
    // md5 balance: no shard is more than 3x the ideal share
    assert(counts.max <= 3 * docsTotal / 16)
  }

  test("q99: z-order files bound BOTH dims; a user_id-sorted layout does not bound day") {
    val out = SparkEntry.queries("q99_zorder_layout")(spark, sf).collect()
    val rowsTotal = Tables(spark, sf, "events").count()
    assert(out.map(_.getAs[Long]("n_rows")).sum === rowsTotal)
    // every z-file covers at most an 8x8 tile: z>>6 fixes all but the low
    // 6 interleaved bits = 3 bits of x and 3 bits of y
    out.foreach { r =>
      assert(r.getAs[Long]("max_x") - r.getAs[Long]("min_x") <= 7)
      assert(r.getAs[Long]("max_y") - r.getAs[Long]("min_y") <= 7)
    }
    // contrast layout: sort by x only (user), same file granularity -> the
    // day dimension stays unclustered (full range in nearly every file),
    // so day-predicate pruning would touch every file
    val ev = Tables(spark, sf, "events")
      .select((col("user_id") % 128).cast("long").as("x"), dayofmonth(col("ts")).cast("long").as("y"))
    val n = ev.count()
    val nFiles = out.length
    import org.apache.spark.sql.expressions.Window
    val xSorted = ev
      .withColumn("rn", row_number().over(Window.orderBy("x", "y")) - 1)
      .withColumn("file_id", (col("rn") / (n / nFiles + 1)).cast("long"))
      .groupBy("file_id")
      .agg((max("y") - min("y")).as("y_span"))
      .collect()
    val avgZ = out.map(r => r.getAs[Long]("max_y") - r.getAs[Long]("min_y")).sum.toDouble / out.length
    val avgX = xSorted.map(_.getAs[Long]("y_span")).sum.toDouble / xSorted.length
    assert(avgZ < avgX / 2, s"z-order avg day-span $avgZ not < half of x-sort layout $avgX")
  }

  test("q100: chunk count and coverage follow the stride formula; md5 keys dedupe identical chunks") {
    val out = SparkEntry.queries("q100_rag_chunks")(spark, sf).collect()
    val docs = Tables(spark, sf, "documents")
      .select(col("doc_id"), size(split(col("text"), " ")).as("n"))
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("n"))
      .toMap
    val byDoc = out.groupBy(_.getAs[Long]("doc_id"))
    assert(byDoc.keySet === docs.keySet)
    byDoc.foreach { case (id, chunks) =>
      val n = docs(id)
      val expected = 1 + math.max(0, math.ceil((n - 64) / 32.0).toInt)
      assert(chunks.length === expected, s"doc $id n=$n")
      // every token index is covered by at least one chunk
      val covered = chunks.map { c =>
        val k = c.getAs[Long]("chunk_id")
        (k * 32, k * 32 + c.getAs[Long]("chunk_tokens"))
      }.sortBy(_._1)
      assert(covered.head._1 === 0L)
      assert(covered.map(_._2).max === n.toLong)
      covered.sliding(2).foreach {
        case Array((_, e), (s2, _)) => assert(s2 <= e, s"gap in doc $id")
        case _ =>
      }
    }
  }

  test("q108: split assignment is a pure function of source; totals cover the corpus") {
    val out = SparkEntry.queries("q108_grouped_split")(spark, sf).collect()
    val bySplit = out.map(r => r.getString(0) -> r).toMap
    assert(bySplit.keySet === Set("train", "val", "test"))
    // a grouped split is leakage-safe iff no source spans two splits:
    // per-split distinct-source counts must sum to the corpus total
    val docs = Tables(spark, sf, "documents")
    val nSources = docs.select("source").distinct().count()
    assert(out.map(_.getAs[Long]("n_sources")).sum === nSources)
    assert(out.map(_.getAs[Long]("n_docs")).sum === docs.count())
    // recompute the assignment per source with the same md5 rule
    val assign = docs
      .select(col("source"), expr("substring(md5(source), 1, 1)").as("d"))
      .distinct()
      .collect()
      .map { r =>
        val d = r.getString(1)
        r.getString(0) -> (if (d < "c") "train" else if (d < "e") "val" else "test")
      }
      .toMap
    val wantDocs = docs
      .collect()
      .groupBy(r => assign(r.getAs[String]("source")))
      .view
      .mapValues(_.length.toLong)
      .toMap
    out.foreach(r => assert(r.getAs[Long]("n_docs") === wantDocs(r.getString(0))))
  }
}
