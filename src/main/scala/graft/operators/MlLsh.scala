package graft.operators

import org.apache.spark.ml.feature.{BucketedRandomProjectionLSH, HashingTF, MinHashLSH}
import org.apache.spark.ml.linalg.{Vector, Vectors}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** MLlib LSH operators (SURVEY.md §2.3 E12/E13, MLlib-primitive
  * variants): `MinHashLSH` near-dup pairs and
  * `BucketedRandomProjectionLSH` approximate nearest neighbors. The
  * engine-native formulations (q35-q37, q40/q41/q46) stay the primary
  * path — they are DataFrame-native and DuckDB-oracle-checkable — these
  * expose the same semantics through the MLlib estimator API for users
  * arriving from Spark ML pipelines.
  *
  * Scale posture: both `approxSimilarityJoin`s are hash-bucket
  * equi-joins under the hood (explode hash tables → join on entry ×
  * hash value), never all-pairs; seeds are fixed so results are
  * deterministic for a given input layout.
  */
object MlLsh {

  /** Near-dup pairs via MinHashLSH over binary word-shingle vectors.
    * OR-amplified with `numHashTables` single-hash tables: a pair with
    * true Jaccard j becomes a candidate with p = 1-(1-j)^L, then the
    * exact key distance (1 - Jaccard on the hashed sets) filters at
    * `maxDistance`.
    */
  def minhashPairs(spark: SparkSession, dir: String, maxDistance: Double = 0.5): DataFrame = {
    // native word_shingles (codegen, per-doc distinct): with
    // setBinary(true) the TF vector ignores duplicate shingles anyway,
    // so the distinct shingle set is semantically identical input —
    // and the repartition spreads the CPU-heavy TF+minhash stage off
    // the single file split (see Dedup.docsWide)
    val docs = Tables(spark, dir, "documents")
      .select(col("doc_id"), expr("word_shingles(text, 3)").as("shingles"))
      .filter(size(col("shingles")) >= 1)
      .repartition(spark.sparkContext.defaultParallelism)
    val tf = new HashingTF()
      .setInputCol("shingles")
      .setOutputCol("features")
      .setBinary(true)
      .setNumFeatures(1 << 18)
    // drop the shingle string arrays before the LSH: approxSimilarityJoin
    // shuffles and pair-dedups FULL rows of both sides, so every column
    // carried here multiplies the join volume (~1 KB of shingles per doc
    // otherwise rides through the candidate join)
    val vecs = tf
      .transform(docs)
      .select("doc_id", "features")
      .filter(_.getAs[Vector]("features").numNonzeros > 0)
    val lsh = new MinHashLSH()
      .setInputCol("features")
      .setOutputCol("hashes")
      .setNumHashTables(8)
      .setSeed(42L)
    val model = lsh.fit(vecs)
    model
      .approxSimilarityJoin(vecs, vecs, maxDistance, "dist")
      .filter(col("datasetA.doc_id") < col("datasetB.doc_id"))
      .select(
        col("datasetA.doc_id").as("d1"),
        col("datasetB.doc_id").as("d2"),
        round(lit(1.0) - col("dist"), 4).as("jaccard")
      )
      .orderBy("d1", "d2")
  }

  /** Top-k neighbors for a small query set via
    * BucketedRandomProjectionLSH on L2-NORMALIZED embeddings, where
    * euclidean distance is monotone in cosine (d² = 2·(1-cos)), so the
    * exact per-candidate distance re-ranks to cosine top-k. The query
    * side is tiny (≤10 vectors) and the corpus side is bucketed — the
    * candidate join is bucket-equi, not a cross product.
    */
  def annCosineTopK(
      spark: SparkSession,
      dir: String,
      nQueries: Int = 10,
      k: Int = 5
  ): DataFrame = {
    // zero vectors have no defined cosine; returning them unnormalized
    // would score cos = 1 - d²/2 = 0.5 against every unit query and
    // pollute the top-k — map them to null and drop
    val toVec = udf { (a: Seq[Float]) =>
      val d = a.map(_.toDouble).toArray
      val n = math.sqrt(d.map(x => x * x).sum)
      if (n == 0) null else Vectors.dense(d.map(_ / n))
    }
    val emb = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), toVec(col("embedding")).as("v"))
      .filter(col("v").isNotNull)
    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val corpus = emb.filter(col("vec_id") >= nQueries)
    val lsh = new BucketedRandomProjectionLSH()
      .setInputCol("v")
      .setOutputCol("hashes")
      .setBucketLength(0.5)
      .setNumHashTables(6)
      .setSeed(42L)
    val model = lsh.fit(corpus)
    // normalized vectors: distance is bounded by 2 (antipodal), so a
    // threshold of 2 keeps EVERY candidate the buckets surface — the
    // top-k cut belongs to the re-rank below, not the threshold. (A
    // sqrt(2) threshold would silently drop all negative-cosine
    // candidates and return short lists for queries pointing away from
    // the corpus.)
    val joined = model
      .approxSimilarityJoin(
        queries.withColumnRenamed("qv", "v"),
        corpus,
        2.0 + 1e-9,
        "dist"
      )
      .select(
        col("datasetA.query_id").as("query_id"),
        col("datasetB.vec_id").as("neighbor_id"),
        (lit(1.0) - col("dist") * col("dist") / 2.0).as("cos")
      )
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    joined
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("neighbor_id"), round(col("cos"), 4).as("cos"), col("rk").cast("long").as("rk"))
      .orderBy("query_id", "rk")
  }
}
