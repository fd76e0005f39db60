package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkSpec, SparkEntry, Tables}

class OperatorsSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("E16 ArrayMean aggregator matches brute-force centroids") {
    val rows = SparkEntry.queries("q43_label_centroids")(spark, dir).collect()
    assert(rows.nonEmpty)

    // brute force on the driver (sf0.001 is small)
    val raw = Tables(spark, dir, "embeddings")
      .select(col("label"), col("embedding"))
      .collect()
      .map(r => (r.getInt(0), r.getAs[scala.collection.Seq[Float]](1).map(_.toDouble)))
    val expected = raw.groupBy(_._1).map { case (label, vs) =>
      val n = vs.length
      val c0 = vs.map(_._2.head).sum / n
      label -> (n.toLong, c0)
    }
    rows.foreach { r =>
      val (n, c0) = expected(r.getInt(0))
      assert(r.getAs[Long]("n") == n)
      assert(r.getAs[Long]("dim") == 64L)
      assert(math.abs(r.getAs[Double]("c0") - c0) < 1e-9)
    }
  }

  test("ArrayMean skips NULL vectors like avg(); wrong dimension fails loudly") {
    val sess = spark
    import sess.implicits._
    val mean = udaf(new VectorAggregates.ArrayMean(2))
    val withNull = Seq(
      (1, Some(Seq(1.0, 3.0))),
      (1, None),
      (1, Some(Seq(3.0, 5.0)))
    ).toDF("k", "v")
    val got = withNull.groupBy("k").agg(mean(col("v")).as("m")).collect().head
    assert(got.getAs[scala.collection.Seq[Double]]("m") == Seq(2.0, 4.0))
    // a mismatched-dimension vector must not be zero-padded/truncated
    // into the centroid silently
    val bad = Seq((1, Seq(1.0, 2.0, 3.0))).toDF("k", "v")
    val e = intercept[Exception] {
      bad.groupBy("k").agg(mean(col("v"))).collect()
    }
    assert(e.getMessage != null)
  }

  test("E14 MLlib pipeline: tokenizer/stopwords/tfidf/ngram shapes") {
    val out = TextPipeline.featureSummary(spark, dir).collect()
    val nDocs = Tables(spark, dir, "documents").count()
    assert(out.length == nDocs)
    out.foreach { r =>
      val nTok = r.getAs[Long]("n_tokens")
      val nFil = r.getAs[Long]("n_filtered")
      val nBg = r.getAs[Long]("n_bigrams")
      assert(nFil <= nTok) // stopwords only remove
      assert(nBg == math.max(nFil - 1, 0)) // 2-grams of the filtered stream
      assert(r.getAs[Long]("tfidf_nnz") <= nFil)
      assert(r.getAs[Double]("tfidf_l1") >= 0.0)
    }
  }

  test("salted join and salted count match their unsalted equivalents") {
    val events = Tables(spark, dir, "events")
    val customers = Tables(spark, dir, "customer")

    val plain = events
      .join(customers, events("user_id") === customers("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("n"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    val salted = SkewJoin
      .saltedJoin(events, customers, "user_id", "c_custkey", salts = 8)
      .groupBy("c_mktsegment")
      .agg(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("n"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    assert(salted == plain)

    val plainCnt = events.groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val saltedCnt = SkewJoin.saltedCount(events, "event_type", salts = 8).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(saltedCnt == plainCnt)
  }

  test("salt spreads byte-identical duplicate rows across all buckets") {
    // the archetypal skew input: one hot key, every row identical — a
    // content-fingerprint salt would put all of them in ONE bucket
    val sess = spark
    import sess.implicits._
    val hot = Seq.fill(4000)(("hotkey", 1)).toDF("k", "v")
    val used = hot
      .withColumn("_salt", SkewJoin.saltCol(8))
      .select("_salt")
      .distinct()
      .count()
    assert(used == 8L, s"expected all 8 salt buckets used, got $used")
    // and the salted count over this worst case still agrees exactly
    val cnt = SkewJoin.saltedCount(hot, "k", salts = 8).collect()
    assert(cnt.length == 1 && cnt.head.getLong(1) == 4000L)
  }

  test("partitioned sink: partition pruning reaches the scan") {
    val tmp = Files.createTempDirectory("graft_part").toString
    Tables(spark, dir, "events")
      .write.mode("overwrite").partitionBy("event_type").parquet(tmp)

    val q = spark.read.parquet(tmp).filter(col("event_type") === "purchase")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan)
    assert(plan.contains("event_type"), plan)
    // pruning is real: only the purchase partition's rows are read
    val expected = Tables(spark, dir, "events").filter(col("event_type") === "purchase").count()
    assert(q.count() == expected)
  }

  test("E1 scans/sinks: CSV and JSON round-trip preserves documents") {
    val docs = Tables(spark, dir, "documents").orderBy("doc_id")
    val tmp = Files.createTempDirectory("graft_sinks").toString

    docs.write.mode("overwrite").option("header", "true").csv(s"$tmp/csv")
    docs.write.mode("overwrite").json(s"$tmp/json")

    val fromCsv = spark.read
      .option("header", "true")
      .schema(docs.schema)
      .csv(s"$tmp/csv")
      .orderBy("doc_id")
    val fromJson = spark.read.schema(docs.schema).json(s"$tmp/json").orderBy("doc_id")

    assert(fromCsv.collect().toSeq == docs.collect().toSeq)
    assert(fromJson.collect().toSeq == docs.collect().toSeq)
  }

  test("E14 CountVectorizer: exact vocabulary counts match manual token counts") {
    val (vecs, model) = TextPipeline.countVectorized(spark, dir)
    // the fitted vocabulary maps index -> term; pick the top term and
    // check its per-doc count against a plain array count
    val term = model.vocabulary.head
    val idx = 0
    val viaCv = vecs
      .select(col("doc_id"), col("counts"))
      .collect()
      .map(r => r.getLong(0) -> r.getAs[org.apache.spark.ml.linalg.Vector](1)(idx).toLong)
      .toMap
    val manual = TextPipeline
      .tokenized(spark, dir)
      .select(col("doc_id"), size(filter(col("filtered"), t => t === term)).cast("long").as("n"))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(viaCv == manual)
  }

  test("E10 collations (Spark 4): UTF8_LCASE compares and groups case-insensitively") {
    val sess = spark
    import sess.implicits._
    val df = Seq("Alpha", "alpha", "ALPHA", "Beta", "beta", "gamma").toDF("s")
    val grouped = df
      .select(collate(col("s"), "UTF8_LCASE").as("s"))
      .groupBy("s")
      .count()
      .collect()
      .map(r => r.getString(0).toLowerCase -> r.getLong(1))
      .toMap
    assert(grouped == Map("alpha" -> 3L, "beta" -> 2L, "gamma" -> 1L))
    val eq = spark.sql("SELECT collate('STRASSE', 'UNICODE_CI') = collate('strasse', 'UNICODE_CI') AS e")
      .head().getBoolean(0)
    assert(eq)
  }

  test("E10 schema_of_json infers the events.props shape") {
    val sample = Tables(spark, dir, "events").select("props").head().getString(0)
    val schema = spark.range(1)
      .select(schema_of_json(lit(sample)).as("s"))
      .head()
      .getString(0)
    assert(schema.toUpperCase.contains("K"))
    assert(schema.toUpperCase.contains("BIGINT"))
    // and the inferred schema actually parses every row
    val parsed = Tables(spark, dir, "events")
      .select(from_json(col("props"), lit(schema), new java.util.HashMap[String, String]()).as("p"))
      .filter(col("p").isNotNull)
      .count()
    assert(parsed == Tables(spark, dir, "events").count())
  }

  test("E1 scans/sinks: ORC round-trip preserves embeddings incl. float arrays") {
    val emb = Tables(spark, dir, "embeddings").orderBy("vec_id")
    val tmp = Files.createTempDirectory("graft_orc").toString
    emb.write.mode("overwrite").orc(s"$tmp/orc")
    val back = spark.read.orc(s"$tmp/orc").orderBy("vec_id")
    assert(back.schema == emb.schema)
    assert(back.collect().toSeq == emb.collect().toSeq)
  }

  test("E1 compaction (q124 shape): 64 shattered files become 4, rows preserved") {
    // the file-count property the q124 oracle cannot state in SQL:
    // compaction actually consolidates (4 data files, not 64) and the
    // round-robin repartition keeps sizes near-equal
    val tmp = Files.createTempDirectory("graft_compact").toString
    val ev = Tables(spark, "/root/testdata/sf0.001", "events")
      .select("event_id", "event_type", "value")
    ev.repartition(64).write.mode("overwrite").parquet(s"$tmp/shattered")
    spark.read
      .parquet(s"$tmp/shattered")
      .repartition(4)
      .write.mode("overwrite").parquet(s"$tmp/compacted")
    def dataFiles(p: String) =
      new java.io.File(p).listFiles().filter(_.getName.endsWith(".parquet"))
    assert(dataFiles(s"$tmp/shattered").length == 64)
    val compacted = dataFiles(s"$tmp/compacted")
    assert(compacted.length == 4)
    val sizes = compacted.map(_.length().toDouble)
    assert(sizes.max / sizes.min < 1.5, s"round-robin sizes skewed: ${sizes.toSeq}")
    assert(
      spark.read.parquet(s"$tmp/compacted").count() ==
        spark.read.parquet(s"$tmp/shattered").count()
    )
  }
}
