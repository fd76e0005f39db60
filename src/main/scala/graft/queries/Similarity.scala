package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Similarity search over the `embeddings` table (SURVEY.md §2.3 E13):
  * brute-force cosine top-k as the exactness baseline, and a
  * random-hyperplane LSH variant as the scale path.
  *
  * 100 TB posture: the query set is broadcast (it is small by
  * definition); candidates stream through a linear scan — never a
  * shuffled cross join. The LSH variant prunes the scan to bucket-local
  * candidates: with B bucket bits the expected candidate fraction is
  * 2^-B per table, so cost scales down exponentially while the planted
  * cluster structure keeps recall high; multiple tables (L=2 here)
  * recover recall lost to unlucky cuts. Cosine scoring uses the
  * engine-native `cosine_sim` expression (graft.functions.CosineSim):
  * one fused allocation-free walk per pair inside whole-stage codegen,
  * bit-identical to the zip_with+aggregate formulation (fixed fold
  * order) but without its per-pair intermediate array.
  */
object Similarity {

  /** Unique index-scratch dirs: the q133/q139 builds can run several
    * times in one session (bench repeats); a retained dir from a
    * previous run must never be read by the next. */
  private val indexSeq = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Fresh absolute scratch path, pre-wiped: a per-JVM counter can
    * collide with a dir an earlier PROCESS left behind (q112's scratch
    * rule) — always start clean. */
  private[graft] def freshIndexDir(prefix: String): String = {
    val run = indexSeq.incrementAndGet()
    val idx = new java.io.File(s"target/graft_scratch/${prefix}_$run").getAbsolutePath
    def wipe(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(wipe))
      f.delete(): Unit
    }
    wipe(new java.io.File(idx))
    idx
  }

  /** Embeddings with double-precision vectors and L2 norms.
    * Deliberately NOT repartitioned (unlike Dedup.docsWide): the heavy
    * consumers here are iterative (KMeans fit) or broadcast-shaped
    * (tiny query sides), and fanning 2k vectors across 32 tasks adds
    * per-iteration scheduling cost without unlocking CPU (measured:
    * q46 1.2s → 2.6s with the repartition). On a 100 TB embedding
    * store the scan arrives well-split on its own. */
  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "embeddings")
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x AS double))").as("v"))
      .withColumn("norm", sqrt(expr("aggregate(v, cast(0 AS double), (a, x) -> a + x*x)")))

  /** Bit-signature for random-hyperplane LSH: `bits` pseudo-random
    * hyperplanes per table. Plane weights are a seeded driver-side
    * LITERAL (java.util.Random is platform-stable, so outcomes are
    * deterministic across JVMs) folded into the plan as a constant —
    * an earlier per-row hash-derived variant recomputed
    * rows × planes × dims string hashes and dominated query time.
    * Returns one struct(tbl, key) per table.
    */
  private def lshKeys(vCol: String, tables: Int, bits: Int) = {
    val rng = new java.util.Random(42)
    val keys = (0 until tables).map { t =>
      val bitCols = (0 until bits).map { _ =>
        // each plane is a TOP-LEVEL ArrayType literal — codegen emits a
        // reference to the array object; embedding the plane matrix
        // inside nested SQL lambdas instead produced a 1536-node
        // expression tree whose Janino compile dominated runtime
        val plane = typedlit(Seq.fill(64)(rng.nextDouble() * 2 - 1))
        val dotPlane = aggregate(
          zip_with(col(vCol), plane, (x, w) => x * w),
          lit(0.0),
          (a, x) => a + x
        )
        when(dotPlane > 0, "1").otherwise("0")
      }
      struct(lit(t).as("tbl"), concat(bitCols: _*).as("key"))
    }
    array(keys: _*)
  }

  val defs: Seq[QueryDef] = Seq(
    // ------------------------------------------------------------------
    // E13 baseline: exact top-5 cosine neighbors for the first 10
    // vectors. BroadcastNestedLoopJoin (query side broadcast) → linear
    // scan of candidates → per-query top-k as a bounded HEAP aggregate
    // (top_k_structs under ObjectHashAggregate): each input partition
    // reduces to ≤5 rows per query BEFORE the exchange, so the shuffle
    // carries heaps, never the corpus — the scan needs no sort and no
    // skew-by-construction ~10-partition window exchange. Descending
    // cosine = ascending negated cosine (sign flip is exact for IEEE
    // doubles), vec_id breaks ties exactly as the rank window did.
    // Oracle-exact: both engines fold dot/norm sums in ascending index
    // order (cosine_sim accumulates i=0..n; DuckDB list_reduce is a
    // left fold), sqrt and one division are correctly-rounded IEEE ops
    // — so the doubles are bit-identical.
    QueryDef(
      "q40_cosine_topk",
      (s, dir) => {
        val e = emb(s, dir)
        val q = e
          .filter(col("vec_id") < 10)
          .select(col("vec_id").as("q_id"), col("v").as("qv"))
        e.crossJoin(broadcast(q))
          .filter(col("q_id") =!= col("vec_id"))
          .withColumn("cos", expr("cosine_sim(qv, v)"))
          // zero-norm (corrupt) rows: cosine_sim yields NULL by contract —
          // excluded HERE, explicitly, because NULL sorts FIRST in the
          // heap's ascending struct order (the replaced DESC window pushed
          // them last); an undefined score must never enter a neighbor list
          .filter(col("cos").isNotNull)
          .groupBy("q_id")
          .agg(expr("top_k_structs(struct(-cos AS nc, vec_id, cos), 5)").as("top"))
          .select(col("q_id"), posexplode(col("top")))
          .select(
            col("q_id"),
            (col("pos") + 1).cast("long").as("rank"),
            col("col.vec_id"),
            col("col.cos")
          )
          .orderBy("q_id", "rank")
      },
      Some("""WITH n AS (
          SELECT vec_id,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
                 sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                      list_transform(list_transform(embedding, x -> CAST(x AS DOUBLE)), x -> x*x)),
                      (a,b) -> a+b)) AS norm
          FROM embeddings),
        q AS (SELECT vec_id AS q_id, v AS qv, norm AS qn FROM n WHERE vec_id < 10),
        pairs AS (
          SELECT q_id, vec_id,
                 list_reduce(list_prepend(CAST(0 AS DOUBLE),
                     list_transform(range(1, len(qv)+1), i -> qv[i]*v[i])), (a,b) -> a+b)
                   / (qn * norm) AS cos
          FROM n CROSS JOIN q WHERE q_id <> vec_id)
        SELECT q_id, CAST(rank AS BIGINT) AS rank, vec_id, cos FROM (
          SELECT q_id, vec_id, cos,
                 row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rank
          FROM pairs)
        WHERE rank <= 5 ORDER BY q_id, rank""")
    ),

    // ------------------------------------------------------------------
    // E13 scale path: random-hyperplane LSH (2 tables × 8 bits) for
    // candidate generation, exact cosine re-rank within candidates.
    QueryDef(
      "q41_ann_lsh",
      (s, dir) => {
        val e = emb(s, dir).withColumn("bucket", explode(lshKeys("v", tables = 2, bits = 8)))
        val q = e
          .filter(col("vec_id") < 10)
          .select(col("vec_id").as("q_id"), col("v").as("qv"), col("norm").as("qn"),
            col("bucket").as("qbucket"))
        val cand = e
          .join(broadcast(q), col("bucket") === col("qbucket") && col("q_id") =!= col("vec_id"))
          .select(col("q_id"), col("qv"), col("qn"), col("vec_id"), col("v"), col("norm"))
          .distinct() // a pair can collide in both tables
        // bounded-heap candidate cut (top_k_structs): LSH collision
        // counts are data-scaled, so a per-anchor window sort here is
        // the same skew-by-construction shape the q40 family shed —
        // NULL cosines (zero-norm rows) are excluded explicitly because
        // they would sort FIRST in the heap's ascending struct order
        cand
          .withColumn("cos", expr("cosine_sim(qv, v)"))
          .filter(col("cos").isNotNull)
          .groupBy("q_id")
          .agg(expr("top_k_structs(struct(-cos AS nc, vec_id, cos), 5)").as("top"))
          .select(col("q_id"), posexplode(col("top")))
          .select(
            col("q_id"),
            (col("pos") + 1).cast("long").as("rank"),
            col("col.vec_id"),
            col("col.cos")
          )
          .orderBy("q_id", "rank")
      },
      None
    ),

    // ------------------------------------------------------------------
    // E12/E13: embedding-cosine near-dup PAIRS — candidates from LSH
    // bucket self-joins (4 tables × 6 bits; never an all-pairs cross
    // join), verified with the exact cosine. On corpora with genuine
    // duplicates (cos ≥ 0.95) bucket recall is high (p_bit≈0.95 →
    // ≈0.74/table, ≈1-(1-0.74)^4≈0.995 over 4 tables); this synthetic
    // corpus peaks at cos≈0.51, so the query legitimately returns few
    // pairs. Output ⊆ true pairs by construction (exact verification).
    QueryDef(
      "q47_embedding_neardup",
      (s, dir) => {
        // the candidate stream stays NARROW (id pairs): the self-join
        // shuffles only (bucket, vec_id); vectors re-attach via a
        // broadcast lookup (the embedding table is tiny relative to the
        // pair stream — at larger scale, bucket-partition both sides
        // instead); the cosine filter crushes volume before the dedup,
        // so the distinct runs on a handful of survivors. A distinct
        // over rows carrying two 64-dim arrays (the naive plan)
        // shuffles ~30× more bytes.
        val sigs = emb(s, dir)
          .select(col("vec_id"), explode(lshKeys("v", tables = 4, bits = 6)).as("bucket"))
        val vecs = emb(s, dir)
        sigs
          .as("a")
          .join(
            sigs.as("b"),
            col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id")
          )
          .select(col("a.vec_id").as("i"), col("b.vec_id").as("j"))
          .join(broadcast(vecs.select(col("vec_id").as("i"), col("v").as("qv"), col("norm").as("qn"))), Seq("i"))
          .join(broadcast(vecs.select(col("vec_id").as("j"), col("v").as("v"), col("norm").as("norm"))), Seq("j"))
          .withColumn("cos", expr("cosine_sim(qv, v)"))
          .filter(col("cos") >= 0.4)
          .select("i", "j", "cos")
          .distinct() // a pair may collide in several tables
          .orderBy("i", "j")
      },
      None
    ),

    // ------------------------------------------------------------------
    // E13 scale path #2: IVF — a KMeans coarse quantizer partitions the
    // corpus into cells; each query probes its nprobe=2 nearest cells
    // and exact-re-ranks only those candidates. The centroid table is
    // 16×64 doubles — broadcast; the expensive scan is pruned to
    // ~nprobe/k of the corpus. Model fit is seeded (clusters are
    // implementation-defined → rows-only; SimilaritySpec asserts the
    // quality bound vs brute force).
    QueryDef(
      "q46_ann_ivf",
      (s, dir) => {
        import org.apache.spark.ml.clustering.KMeans
        import org.apache.spark.ml.functions.array_to_vector

        val e = emb(s, dir)
        val feat = e.select(
          col("vec_id"),
          col("v"),
          col("norm"),
          array_to_vector(col("v")).as("features")
        )
        // a coarse quantizer needs rough cells, not convergence: 5 Lloyd
        // iterations (vs the default 20) — at corpus scale each
        // iteration is a full pass over the vectors
        val model = new KMeans()
          .setK(16)
          .setSeed(42)
          .setMaxIter(5)
          .setFeaturesCol("features")
          .fit(feat)
        val assigned = model
          .transform(feat)
          .select(col("vec_id"), col("v"), col("norm"), col("prediction").as("cell"))

        val sess = s
        import sess.implicits._
        val centroids = model.clusterCenters.zipWithIndex.toSeq
          .map { case (c, i) => (i, c.toArray.toSeq) }
          .toDF("cell", "cv")

        // nprobe=2 nearest cells per query by euclidean distance —
        // a 1-entry-per-query heap over the queries×16-centroid grid
        // (bounded, but the heap keeps the whole query window-free so
        // PlanLint can enforce the no-window invariant uniformly)
        val q = assigned.filter(col("vec_id") < 10)
          .select(col("vec_id").as("q_id"), col("v").as("qv"), col("norm").as("qn"))
        val probed = q
          .crossJoin(broadcast(centroids))
          .withColumn(
            "d2",
            expr("aggregate(zip_with(qv, cv, (x, y) -> (x - y) * (x - y)), cast(0 AS double), (a, x) -> a + x)")
          )
          .groupBy("q_id")
          .agg(expr("top_k_structs(struct(d2, cell), 2)").as("cells"))
          .select(col("q_id"), explode(col("cells.cell")).as("cell"))
          .join(broadcast(q), Seq("q_id")) // reattach qv/qn (≤10 rows)

        // candidate cut: nprobe/16 of the CORPUS funnels through here —
        // bounded heap, never a per-anchor window sort (q40's shape)
        probed
          .join(assigned, Seq("cell"))
          .filter(col("q_id") =!= col("vec_id"))
          .withColumn("cos", expr("cosine_sim(qv, v)"))
          .filter(col("cos").isNotNull)
          .groupBy("q_id")
          .agg(expr("top_k_structs(struct(-cos AS nc, vec_id, cos), 5)").as("top"))
          .select(col("q_id"), posexplode(col("top")))
          .select(
            col("q_id"),
            (col("pos") + 1).cast("long").as("rank"),
            col("col.vec_id"),
            col("col.cos")
          )
          .orderBy("q_id", "rank")
      },
      None
    ),

    // ------------------------------------------------------------------
    // E13 corpus×corpus: top-k ANN SELF-join — every vector gets its
    // approximate top-5 neighbors via IVF-cell blocking (see
    // operators/KnnJoin for the plan shape and the cell-cap skew
    // guard). nprobe=10 of 16 cells: this synthetic corpus is isotropic
    // (best neighbor cos≈0.37, no planted clusters — measured recall is
    // 0.89 at nprobe=8, 0.95 at nprobe=10), so recall≥0.9 vs exact
    // requires probing over half the cells — on a real near-dup corpus
    // the same recall needs nprobe≈2 because true neighbors share the
    // query's own cell. KnnJoinSpec pins recall, determinism, and the
    // cap guard. Rows-only: KMeans cells are implementation-defined.
    QueryDef(
      "q128_knn_join",
      (s, dir) =>
        graft.operators.KnnJoin
          .knnSelfJoin(emb(s, dir), k = 5, kCells = 16, nprobe = 10, cellCap = 1024),
      None
    ),

    // ------------------------------------------------------------------
    // E13 (persistent index, build-once/probe-many): the IVF quantizer
    // fitted ONCE and written as a parquet layout partitioned by cell
    // (operators/IvfIndex) — then probed through a fresh read: each of
    // the 10 query vectors ranks the PERSISTED centroids, and the
    // probe's broadcast cell join carries a dynamic-partition-pruning
    // subquery into the data scan, so only nprobe/k of the directories
    // are read (IvfIndexSpec asserts the pruning filter in the plan).
    // Same seed/k/nprobe as q46, and parquet round-trips doubles
    // exactly — so the result is bit-identical to the in-memory IVF
    // (spec-pinned). Rows-only: cells are implementation-defined.
    QueryDef(
      "q133_ivf_persist",
      (s, dir) => {
        val idx = freshIndexDir("ivf_index")
        val e = emb(s, dir)
        graft.operators.IvfIndex.build(e, idx, k = 16, maxIter = 5, seed = 42L)
        graft.operators.IvfIndex.probe(
          s,
          idx,
          e.filter(col("vec_id") < 10)
            .select(col("vec_id").as("q_id"), col("v").as("qv"), col("norm").as("qn")),
          nprobe = 2,
          topK = 5
        )
      },
      None
    ),

    // ------------------------------------------------------------------
    // E13 (incremental index maintenance): the streaming analogue of
    // q118's incremental dedup, for the serving index. The quantizer is
    // fitted ONCE on the base corpus (3/4 of the vectors); the
    // remaining 1/4 arrives later as an ingest batch and is APPENDED —
    // nearest-centroid assignment as a pure projection (centroid
    // literals, no join/shuffle; IvfAppendSpec asserts exchange-free),
    // new files landing inside the existing cell directories. Probes
    // then serve the grown corpus unchanged. The spec pins the
    // equivalence that makes this safe: post-append probe results are
    // bit-identical to a full relayout of the union corpus under the
    // same centroids — so incremental ingest loses nothing vs rebuild
    // while doing O(batch) work instead of O(corpus). Rows-only:
    // KMeans cells are implementation-defined.
    QueryDef(
      "q139_ivf_append",
      (s, dir) => {
        val idx = freshIndexDir("ivf_append")
        val e = emb(s, dir)
        val base = e.filter(col("vec_id") % 4 =!= 3)
        val batch = e.filter(col("vec_id") % 4 === 3)
        val cents = graft.operators.IvfIndex.fitCentroids(base, k = 16, maxIter = 5, seed = 42L)
        graft.operators.IvfIndex.writeLayout(base, cents, idx)
        graft.operators.IvfIndex.append(batch, idx)
        graft.operators.IvfIndex.probe(
          s,
          idx,
          e.filter(col("vec_id") < 10)
            .select(col("vec_id").as("q_id"), col("v").as("qv"), col("norm").as("qn")),
          nprobe = 2,
          topK = 5
        )
      },
      None
    ),

    // ------------------------------------------------------------------
    // E13 (index deletion — the GDPR/right-to-be-forgotten shape that
    // completes the persistent index lifecycle: build q133, append
    // q139/q141, DELETE here): forget-requests append vec_ids into a
    // tombstone table beside the layout; probes broadcast-anti-join
    // them out of the candidate stream, so a delete costs one tiny
    // append — never a cell-file rewrite on the request path. The
    // physical rewrite is IvfIndex.compact, a separately-scheduled
    // q124-style maintenance job; IvfDeleteSpec pins (a) the
    // tombstoned probe bit-identical to an index built without the
    // deleted vectors, (b) probe-before == probe-after compaction with
    // the files actually shrunk, and (c) dynamic partition pruning
    // surviving the tombstone anti-join. Rows-only: cells are
    // implementation-defined.
    QueryDef(
      "q145_ivf_delete",
      (s, dir) => {
        val idx = freshIndexDir("ivf_delete")
        val e = emb(s, dir)
        val cents = graft.operators.IvfIndex.fitCentroids(e, k = 16, maxIter = 5, seed = 42L)
        graft.operators.IvfIndex.writeLayout(e, cents, idx)
        graft.operators.IvfIndex.delete(e.filter(col("vec_id") % 7 === 0).select("vec_id"), idx)
        graft.operators.IvfIndex.probe(
          s,
          idx,
          e.filter(col("vec_id") < 10)
            .select(col("vec_id").as("q_id"), col("v").as("qv"), col("norm").as("qn")),
          nprobe = 2,
          topK = 5
        )
      },
      None
    ),

    // ------------------------------------------------------------------
    // E13 × q119 (scalar-quantized ANN scan): the serving pattern int8
    // quantization exists FOR — candidates come from an INTEGER
    // dot-product scan over the 4×-smaller code vectors (the pass that
    // runs SIMD-wide and cache-resident at scale), exact cosine
    // re-ranks only the top-20 survivors. Codes use q119's exact
    // formula (per-vector symmetric scale, HALF_UP rounding — the same
    // in both engines, which is what makes this whole query
    // ORACLE-EXACT, unusual for an ANN path: integer candidate scores
    // have no float drift, and the re-rank doubles are the
    // bit-identical q40 cosine). Deterministic ties: (dot DESC,
    // vec_id). The candidate cut is the accuracy/speed knob; recall vs
    // exact is pinned by SimilaritySpec at 100% on this corpus.
    QueryDef(
      "q147_int8_ann",
      (s, dir) => {
        val coded = Tables(s, dir, "embeddings")
          .withColumn(
            "mx",
            greatest(
              expr("aggregate(embedding, cast(0 AS double), (a, x) -> greatest(a, abs(cast(x AS double))))"),
              lit(1e-30)
            )
          )
          .withColumn("v", expr("transform(embedding, x -> cast(x AS double))"))
          .withColumn("norm", sqrt(expr("aggregate(v, cast(0 AS double), (a, x) -> a + x*x)")))
          .withColumn("qc", expr("transform(embedding, x -> cast(round(cast(x AS double) * 127 / mx) AS int))"))
          .select("vec_id", "v", "norm", "qc")
        val probes = coded
          .filter(col("vec_id") < 10)
          .select(col("vec_id").as("q_id"), col("v").as("qv"), col("qc").as("qqc"))
        // two-stage top-k, both stages bounded heap aggregates: stage 1
        // keeps the 20 best integer dots per query (payload carries the
        // candidate vector, so re-ranking needs no second corpus scan),
        // the shuffle moving only ≤20-entry heaps per (partition,
        // query); stage 2 re-ranks the ≤200 survivors by exact cosine.
        // Descending dot = ascending -dot (|dot| ≤ 64·127² — no
        // overflow); ties break by vec_id, identical to the oracle's
        // rank windows.
        coded
          .crossJoin(broadcast(probes))
          .filter(col("q_id") =!= col("vec_id"))
          .withColumn("dot", expr("aggregate(zip_with(qqc, qc, (a, b) -> cast(a AS long) * b), cast(0 AS long), (acc, x) -> acc + x)"))
          .groupBy("q_id")
          .agg(expr("top_k_structs(struct(-dot AS nd, vec_id, dot, qv, v), 20)").as("cand"))
          .select(col("q_id"), explode(col("cand")).as("c"))
          .withColumn("cos", expr("cosine_sim(c.qv, c.v)"))
          // zero-norm (corrupt) rows: cosine_sim yields NULL by contract —
          // excluded HERE, explicitly, because NULL sorts FIRST in the
          // heap's ascending struct order (the replaced DESC window pushed
          // them last); an undefined score must never enter a neighbor list
          .filter(col("cos").isNotNull)
          .groupBy("q_id")
          .agg(expr("top_k_structs(struct(-cos AS nc, c.vec_id AS vec_id, cos, c.dot AS dot), 5)").as("top"))
          .select(col("q_id"), posexplode(col("top")))
          .select(
            col("q_id"),
            (col("pos") + 1).cast("long").as("rank"),
            col("col.vec_id"),
            col("col.cos"),
            col("col.dot")
          )
          .orderBy("q_id", "rank")
      },
      Some("""WITH base AS (
          SELECT vec_id,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
                 greatest(list_max(list_transform(embedding,
                            x -> abs(CAST(x AS DOUBLE)))), 1e-30) AS mx
          FROM embeddings),
        coded AS (
          SELECT vec_id, v,
                 sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                      list_transform(v, x -> x*x)), (a,b) -> a+b)) AS norm,
                 list_transform(v, x -> CAST(round(x * 127 / mx) AS BIGINT)) AS qc
          FROM base),
        probes AS (SELECT vec_id AS q_id, v AS qv, norm AS qn, qc AS qqc
                   FROM coded WHERE vec_id < 10),
        scanned AS (
          SELECT q_id, vec_id, qv, qn, v, norm,
                 list_reduce(list_prepend(CAST(0 AS BIGINT),
                   list_transform(range(1, len(qqc)+1), i -> qqc[i]*qc[i])), (a,b) -> a+b) AS dot
          FROM coded CROSS JOIN probes WHERE q_id <> vec_id),
        cand AS (
          SELECT * FROM (
            SELECT q_id, vec_id, qv, qn, v, norm, dot,
                   row_number() OVER (PARTITION BY q_id ORDER BY dot DESC, vec_id) AS crk
            FROM scanned)
          WHERE crk <= 20),
        reranked AS (
          SELECT q_id, vec_id, dot,
                 list_reduce(list_prepend(CAST(0 AS DOUBLE),
                     list_transform(range(1, len(qv)+1), i -> qv[i]*v[i])), (a,b) -> a+b)
                   / (qn * norm) AS cos
          FROM cand)
        SELECT q_id, CAST(rank AS BIGINT) AS rank, vec_id, cos, dot FROM (
          SELECT q_id, vec_id, cos, dot,
                 row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rank
          FROM reranked)
        WHERE rank <= 5 ORDER BY q_id, rank""")
    ),

    // ------------------------------------------------------------------
    // E13 (contrastive-training prep): deterministic NEGATIVE sampling —
    // for each anchor, 8 negatives drawn uniformly-by-hash from the
    // corpus EXCLUDING the anchor's true top-5 cosine neighbors (a
    // negative that is secretly a near-neighbor is a false negative
    // that poisons a contrastive loss — the exclusion is the point).
    // Sampling order is the md5 integer of "anchor:candidate" (the
    // q116/q121 engine-independent trick), so the sample is a pure
    // function of ids — retry-safe, shard-independent, and
    // ORACLE-EXACT (the oracle recomputes neighbors with the q40 CTE
    // and ranks the complement by the same md5 integers). Plan: one
    // broadcast anchor scan (q40's shape) computes cosine + both
    // windows; at 100 TB the neighbor exclusion would come from the
    // persisted kNN table (q128's output) instead of inline cosine —
    // the sampling pass itself stays a hash-ranked window either way.
    QueryDef(
      "q150_negative_sample",
      (s, dir) => {
        val e = emb(s, dir)
        val anchors = e
          .filter(col("vec_id") < 10)
          .select(col("vec_id").as("q_id"), col("v").as("qv"))
        // one heap-aggregated pass computes BOTH bounded sets per
        // anchor: the top-5 cosine neighbors (the exclusion set — this
        // is the filter InferWindowGroupLimit can never optimize, since
        // `nrank > 5` is an exclusion, not a limit: the old window plan
        // shuffled the full corpus×anchors stream into ~10 partitions)
        // and the 13 hash-smallest candidates. At most 5 of those 13
        // can be true neighbors, so the first 8 survivors of the
        // array-level subtraction are exactly the oracle's top-8 over
        // the full complement — all from heaps that reduce map-side.
        e.crossJoin(broadcast(anchors))
          .filter(col("q_id") =!= col("vec_id"))
          .withColumn("cos", expr("cosine_sim(qv, v)"))
          .withColumn(
            "h",
            expr("cast(conv(substring(md5(concat(cast(q_id AS string), ':', cast(vec_id AS string))), 1, 15), 16, 10) AS bigint)")
          )
          .groupBy("q_id")
          .agg(
            // undefined (NULL) cosines never enter the EXCLUSION set —
            // a zero-norm row is not anyone's true neighbor (it stays
            // an eligible negative in cand, exactly as the replaced
            // NULLS LAST window ranked it past every defined score)
            expr("top_k_structs(struct(-cos AS nc, vec_id), 5) FILTER (WHERE cos IS NOT NULL)")
              .as("excl"),
            expr("top_k_structs(struct(h, vec_id), 13)").as("cand")
          )
          .withColumn("excl_ids", expr("transform(excl, x -> x.vec_id)"))
          .withColumn(
            "kept",
            expr("slice(filter(cand, c -> NOT array_contains(excl_ids, c.vec_id)), 1, 8)")
          )
          .select(col("q_id"), posexplode(col("kept")))
          .select(
            col("q_id"),
            (col("pos") + 1).cast("long").as("rank"),
            col("col.vec_id").as("neg_id"),
            col("col.h")
          )
          .orderBy("q_id", "rank")
      },
      Some("""WITH n AS (
          SELECT vec_id,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
                 sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                      list_transform(list_transform(embedding, x -> CAST(x AS DOUBLE)), x -> x*x)),
                      (a,b) -> a+b)) AS norm
          FROM embeddings),
        q AS (SELECT vec_id AS q_id, v AS qv, norm AS qn FROM n WHERE vec_id < 10),
        pairs AS (
          SELECT q_id, vec_id,
                 list_reduce(list_prepend(CAST(0 AS DOUBLE),
                     list_transform(range(1, len(qv)+1), i -> qv[i]*v[i])), (a,b) -> a+b)
                   / (qn * norm) AS cos
          FROM n CROSS JOIN q WHERE q_id <> vec_id),
        ranked AS (
          SELECT q_id, vec_id, cos,
                 row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS nrank
          FROM pairs),
        pool AS (
          SELECT q_id, vec_id,
                 CAST(('0x' || substr(md5(CAST(q_id AS VARCHAR) || ':' || CAST(vec_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
          FROM ranked WHERE nrank > 5)
        SELECT q_id, CAST(rank AS BIGINT) AS rank, vec_id AS neg_id, h FROM (
          SELECT q_id, vec_id, h,
                 row_number() OVER (PARTITION BY q_id ORDER BY h, vec_id) AS rank
          FROM pool)
        WHERE rank <= 8 ORDER BY q_id, rank""")
    ),

    // ------------------------------------------------------------------
    // E13 (product quantization — operators/PqIndex): the third
    // compression family beside IVF cells and int8 scalar codes. 8
    // subspaces × 16 seeded centroids encode each vector as 8 small
    // codes (32× smaller than the float64 array); the scan evaluates
    // asymmetric distance (exact query side vs coded corpus side) as
    // one fused expression over per-subspace codebook literals, keeps
    // 50 ADC candidates per query, and exact-cosine re-ranks to top-5
    // — q147's contract with table-lookup distances instead of integer
    // dots. Rows-only (codebook cells are implementation-defined);
    // PqIndexSpec pins recall vs exact q40, the 8×[0,16) code shape,
    // and determinism.
    QueryDef(
      "q152_pq_ann",
      (s, dir) => {
        val e = emb(s, dir)
        val cb = graft.operators.PqIndex.fitCodebooks(e)
        val coded = graft.operators.PqIndex.encode(e, cb)
        val probes = e
          .filter(col("vec_id") < 10)
          .select(col("vec_id").as("q_id"), col("v").as("qv"), col("norm").as("qn"))
        graft.operators.PqIndex.adcTopK(coded, probes, cb, candK = 50, topK = 5)
      },
      None
    ),

    // ------------------------------------------------------------------
    // E13 (IVFADC — operators/IvfAdc): the composition that serves ANN
    // at billion-vector scale, assembled from the two persisted index
    // operators: IVF cells bound WHERE a probe looks (nprobe of kCells
    // directories, skipped via dynamic partition pruning), PQ codes —
    // quantizing per-cell RESIDUALS, the paper's §V form — bound WHAT
    // it reads per row (the m-byte codes column; raw vectors stay
    // un-read until the re-rank fetches them for candK candidates
    // only). All index models (centroids, codebooks, residual flag)
    // persist as tiny parquet tables beside the data, so a probe is
    // just four reads — no driver-resident model object. Rows-only
    // (KMeans cells and codebooks are implementation-defined);
    // IvfAdcSpec pins recall ≥0.9 vs the exact q40 scan, the DPP
    // filter, and that every hash exchange in the probe plan sits
    // above a bounded heap aggregate — zero corpus-scaled shuffles.
    QueryDef(
      "q153_ivfadc",
      (s, dir) => {
        val idx = freshIndexDir("ivfadc")
        val e = emb(s, dir)
        graft.operators.IvfAdc.build(e, idx)
        graft.operators.IvfAdc.probe(
          s,
          idx,
          e.filter(col("vec_id") < 10)
            .select(col("vec_id").as("q_id"), col("v").as("qv")),
          // measured on this corpus (isotropic — the WORST case for
          // residual PQ, cells near-uniform): residual recall vs
          // exact = 0.86/0.92/0.98 at candK 64/128/256 with
          // nprobe=10 (raw coding: 0.74/0.88/0.96); 256 clears the
          // 0.9 spec floor with margin. Clustered real corpora need
          // far smaller ratios.
          nprobe = 10,
          candK = 256,
          topK = 5
        )
      },
      None
    ),

    // ------------------------------------------------------------------
    // E13 (persistent PQ index — build-once/append-many for the coded
    // representation, q139's maintenance contract at the PQ layer):
    // codebooks fit ONCE on the base 3/4 of the corpus and persist as
    // the model table; the remaining 1/4 arrives later and is APPENDED
    // — encoded through the SAVED codebooks as a pure projection
    // (PqPersistSpec asserts exchange-free), so a vector's codes are
    // bit-identical whether it arrived at build or append time, and
    // the post-append ADC probe equals a full re-encode of the union
    // corpus (spec-pinned). The probe itself is q152's two-stage
    // bounded-heap scan served from the RE-READ persisted codes.
    // Rows-only: codebook cells are implementation-defined.
    QueryDef(
      "q154_pq_persist",
      (s, dir) => {
        val idx = freshIndexDir("pq_persist")
        val e = emb(s, dir)
        val base = e.filter(col("vec_id") % 4 =!= 3)
        val batch = e.filter(col("vec_id") % 4 === 3)
        val cb = graft.operators.PqIndex.fitCodebooks(base)
        graft.operators.PqIndex.save(base, cb, idx)
        graft.operators.PqIndex.append(batch, idx)
        val coded = s.read.parquet(s"$idx/data")
        val probes = e
          .filter(col("vec_id") < 10)
          .select(col("vec_id").as("q_id"), col("v").as("qv"))
        graft.operators.PqIndex
          .adcTopK(coded, probes, graft.operators.PqIndex.loadCodebooks(s, idx), candK = 50, topK = 5)
      },
      None
    ),

    // ------------------------------------------------------------------
    // E13 (index-health monitoring): recall@5 of the persisted IVFADC
    // index against the exact scan, AS A QUERY — the operational
    // metric a serving deployment watches (append/delete/compact cycles
    // and corpus drift degrade cell balance and codebook fit; the
    // mitigation is a re-fit, and THIS number is what triggers it).
    // One build, one probe over 20 anchor queries, one exact heap scan
    // of the same anchors, one join — per-anchor hit counts plus
    // integer recall. Rows-only (cells/codebooks implementation-
    // defined); IvfAdcSpec pins the aggregate recall floor and
    // determinism for this report.
    QueryDef(
      "q157_index_recall_report",
      (s, dir) => {
        val idx = freshIndexDir("ivfadc_recall")
        val e = emb(s, dir)
        graft.operators.IvfAdc.build(e, idx)
        val anchors = e
          .filter(col("vec_id") < 20)
          .select(col("vec_id").as("q_id"), col("v").as("qv"))
        val approx = graft.operators.IvfAdc
          .probe(s, idx, anchors, nprobe = 10, candK = 256, topK = 5)
          .select(col("q_id"), col("vec_id"), lit(1).as("hit"))
        val exact = e
          .crossJoin(broadcast(anchors))
          .filter(col("q_id") =!= col("vec_id"))
          .withColumn("cos", expr("cosine_sim(qv, v)"))
          // zero-norm (corrupt) rows: cosine_sim yields NULL by contract —
          // excluded HERE, explicitly, because NULL sorts FIRST in the
          // heap's ascending struct order (the replaced DESC window pushed
          // them last); an undefined score must never enter a neighbor list
          .filter(col("cos").isNotNull)
          .groupBy("q_id")
          .agg(expr("top_k_structs(struct(-cos AS nc, vec_id), 5)").as("top"))
          .select(col("q_id"), explode(expr("transform(top, t -> t.vec_id)")).as("vec_id"))
        exact
          .join(approx, Seq("q_id", "vec_id"), "left")
          .groupBy("q_id")
          .agg(
            count(lit(1)).as("n_true"),
            sum(coalesce(col("hit"), lit(0))).cast("long").as("n_hit")
          )
          .withColumn("recall_pct", (col("n_hit") * 100 / col("n_true")).cast("long"))
          .orderBy("q_id")
      },
      None
    ),

    // ------------------------------------------------------------------
    // E13 × E14 (hybrid retrieval — the RAG-serving shape): keyword
    // and vector channels ranked independently, fused with integer
    // Borda points (11 − rank per channel, missing channel = 0) — the
    // rank-fusion family (RRF et al.) with integer arithmetic so the
    // WHOLE fusion is oracle-exact. Channels: shared-distinct-token
    // count (word_shingles(text,1) = the distinct-word set, equi-join
    // on token — never doc×doc) and exact cosine (q40's bit-identical
    // fold), each cut to top-10 per query by bounded heap. The
    // documents↔embeddings inner join on id is the multimodal-row
    // pattern: one item carries both its text and its vector. All
    // three top-k cuts are heap aggregates; the only exchanges carry
    // heaps and per-(query, candidate) token counts.
    QueryDef(
      "q158_hybrid_retrieval",
      (s, dir) => {
        val docs = Tables(s, dir, "documents").select("doc_id", "text")
        val e = emb(s, dir)
        val items = docs
          .join(e, docs("doc_id") === e("vec_id"))
          .select(col("doc_id").as("id"), col("text"), col("v"))
        val qv = items.filter(col("id") < 5).select(col("id").as("q_id"), col("v").as("qv"))
        val vecRanks = items
          .select(col("id"), col("v"))
          .crossJoin(broadcast(qv))
          .filter(col("q_id") =!= col("id"))
          .withColumn("cos", expr("cosine_sim(qv, v)"))
          // zero-norm (corrupt) rows: cosine_sim yields NULL by contract —
          // excluded HERE, explicitly, because NULL sorts FIRST in the
          // heap's ascending struct order (the replaced DESC window pushed
          // them last); an undefined score must never enter a neighbor list
          .filter(col("cos").isNotNull)
          .groupBy("q_id")
          .agg(expr("top_k_structs(struct(-cos AS nc, id), 10)").as("top"))
          .select(col("q_id"), posexplode(col("top")))
          .select(col("q_id"), col("col.id").as("id"), (col("pos") + 1).as("vec_rank"))
        val tok = items.select(col("id"), explode(expr("word_shingles(text, 1)")).as("w"))
        val qtok = tok.filter(col("id") < 5).select(col("id").as("q_id"), col("w"))
        val kwRanks = tok
          .join(broadcast(qtok), Seq("w"))
          .filter(col("id") =!= col("q_id"))
          .groupBy("q_id", "id")
          .agg(count(lit(1)).as("shared"))
          .groupBy("q_id")
          .agg(expr("top_k_structs(struct(-shared AS ns, id), 10)").as("top"))
          .select(col("q_id"), posexplode(col("top")))
          .select(col("q_id"), col("col.id").as("id"), (col("pos") + 1).as("kw_rank"))
        kwRanks
          .join(vecRanks, Seq("q_id", "id"), "full_outer")
          .withColumn(
            "pts",
            coalesce(lit(11) - col("kw_rank"), lit(0)) + coalesce(lit(11) - col("vec_rank"), lit(0))
          )
          .groupBy("q_id")
          .agg(expr("top_k_structs(struct(-pts AS np, id, pts, kw_rank, vec_rank), 5)").as("top"))
          .select(col("q_id"), posexplode(col("top")))
          .select(
            col("q_id"),
            (col("pos") + 1).cast("long").as("rank"),
            col("col.id").as("item_id"),
            col("col.pts").cast("long").as("pts"),
            col("col.kw_rank").cast("long").as("kw_rank"),
            col("col.vec_rank").cast("long").as("vec_rank")
          )
          .orderBy("q_id", "rank")
      },
      Some("""WITH items AS (
          SELECT d.doc_id AS id, d.text,
                 list_transform(e.embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id),
        n AS (SELECT id, text, v,
                     sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                          list_transform(v, x -> x*x)), (a,b) -> a+b)) AS norm
              FROM items),
        q AS (SELECT id AS q_id, v AS qv, norm AS qn FROM n WHERE id < 5),
        vec_pairs AS (
          SELECT q_id, id,
                 list_reduce(list_prepend(CAST(0 AS DOUBLE),
                     list_transform(range(1, len(qv)+1), i -> qv[i]*v[i])), (a,b) -> a+b)
                   / (qn * norm) AS cos
          FROM n CROSS JOIN q WHERE q_id <> id),
        vr AS (SELECT q_id, id, r FROM (
                 SELECT q_id, id,
                        row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, id) AS r
                 FROM vec_pairs) WHERE r <= 10),
        tok AS (SELECT DISTINCT * FROM
                  (SELECT id, unnest(string_split(text, ' ')) AS w FROM items)),
        qt AS (SELECT id AS q_id, w FROM tok WHERE id < 5),
        shared AS (
          SELECT qt.q_id, tok.id, count(*) AS shared
          FROM qt JOIN tok ON qt.w = tok.w AND tok.id <> qt.q_id
          GROUP BY 1, 2),
        kr AS (SELECT q_id, id, r FROM (
                 SELECT q_id, id,
                        row_number() OVER (PARTITION BY q_id ORDER BY shared DESC, id) AS r
                 FROM shared) WHERE r <= 10),
        fused AS (
          SELECT COALESCE(kr.q_id, vr.q_id) AS q_id, COALESCE(kr.id, vr.id) AS id,
                 COALESCE(11 - kr.r, 0) + COALESCE(11 - vr.r, 0) AS pts,
                 kr.r AS kw_rank, vr.r AS vec_rank
          FROM kr FULL JOIN vr ON kr.q_id = vr.q_id AND kr.id = vr.id)
        SELECT q_id, CAST(rank AS BIGINT) AS rank, id AS item_id,
               CAST(pts AS BIGINT) AS pts,
               CAST(kw_rank AS BIGINT) AS kw_rank,
               CAST(vec_rank AS BIGINT) AS vec_rank
        FROM (SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY pts DESC, id) AS rank
              FROM fused)
        WHERE rank <= 5 ORDER BY q_id, rank""")
    ),

    // ------------------------------------------------------------------
    // E13/E5 hybrid: per-label centroid stats — demonstrates vector
    // aggregation without collect (element-wise array sums via
    // zip_with-reduce in a declarative agg would shuffle arrays; counts
    // and exact scalar stats suffice here and ARE oracle-checkable when
    // derived from integral fields).
    QueryDef(
      "q42_embedding_stats",
      (s, dir) =>
        Tables(s, dir, "embeddings")
          .groupBy("label")
          .agg(
            count(lit(1)).as("n"),
            countDistinct(col("vec_id")).as("nd_vec"),
            min("vec_id").as("min_vec"),
            max("vec_id").as("max_vec")
          )
          .orderBy("label"),
      Some("""SELECT label, count(*) AS n, count(DISTINCT vec_id) AS nd_vec,
        min(vec_id) AS min_vec, max(vec_id) AS max_vec
        FROM embeddings GROUP BY label ORDER BY label""")
    ),

    // ------------------------------------------------------------------
    // E12/E13 (semantic dedup, SemDeDup-style): a seeded KMeans coarse
    // quantizer cells the corpus; near-duplicate candidates are pairs
    // WITHIN a cell (cell equi-join — never all-pairs), verified with
    // the exact cosine; a vector is dropped when a smaller-id near-dup
    // shares its cell, keep_id being the smallest such neighbor. The
    // pair stream stays NARROW ((cell, id) self-join); vectors re-attach
    // by broadcast before the cosine (q47's pattern). Within-cell
    // comparison is quadratic in CELL size, not corpus size — at scale k
    // grows with the corpus so cells stay bounded (k=16 here matches
    // q46's quantizer). Threshold 0.4 matches q47, so the two dedup
    // views (LSH-candidates vs cell-candidates) are comparable.
    // Rows-only: cell assignments are implementation-defined (seeded
    // MLlib KMeans); SimilaritySpec pins determinism, exact-cosine
    // precision, and within-cell recall against brute force.
    QueryDef(
      "q92_semantic_dedup",
      (s, dir) => {
        import org.apache.spark.ml.clustering.KMeans
        import org.apache.spark.ml.functions.array_to_vector

        val e = emb(s, dir)
        val feat = e.select(col("vec_id"), col("v"), array_to_vector(col("v")).as("features"))
        val model = new KMeans()
          .setK(16)
          .setSeed(42)
          .setMaxIter(5)
          .setFeaturesCol("features")
          .fit(feat)
        val assigned = model
          .transform(feat)
          .select(col("vec_id"), col("prediction").as("cell"))
        val vecs = e.select(col("vec_id"), col("v"))
        assigned
          .as("a")
          .join(
            assigned.as("b"),
            col("a.cell") === col("b.cell") && col("a.vec_id") < col("b.vec_id")
          )
          .select(col("a.vec_id").as("i"), col("b.vec_id").as("j"))
          .join(broadcast(vecs.select(col("vec_id").as("i"), col("v").as("vi"))), Seq("i"))
          .join(broadcast(vecs.select(col("vec_id").as("j"), col("v").as("vj"))), Seq("j"))
          .withColumn("cos", expr("cosine_sim(vi, vj)"))
          .filter(col("cos") >= 0.4)
          .groupBy(col("j").as("vec_id"))
          .agg(
            min(col("i")).as("keep_id"),
            max(col("cos")).as("max_cos"),
            count(lit(1)).as("n_dups")
          )
          .orderBy("vec_id")
      },
      None
    ),

    // ------------------------------------------------------------------
    // E13 (quantizer-design A/B evaluation — the decision tool behind
    // OPQ adoption): Ge et al. (CVPR 2013) rotate vectors into a
    // variance-balanced basis before product quantization; whether
    // that pays is CORPUS-DEPENDENT — correlated real embeddings gain,
    // axis-aligned structure loses (this synthetic corpus measures
    // plain 0.72 vs rotated 0.66 recall@5, which is exactly the
    // answer an operator owner needs BEFORE rebuilding a 100 TB coded
    // layout). So the engine ships the experiment as a query: both
    // variants — q152's plain PQ and the eigenvalue-allocated rotated
    // PQ (PCA basis from q160's exact moments, Ge §4's greedy
    // variance-balancing permutation, a pure rotation so the re-rank
    // geometry is unchanged) — run at identical candK against the
    // exact scan, and the report emits per-variant hit counts and
    // integer recall_ppm. Deterministic end to end (exact integers →
    // Jacobi → seeded fits), rows-only (KMeans cells), OpqSpec pins
    // the plain row against an independent q152×q40 join plus
    // rotation orthonormality/balance and bit-stability.
    QueryDef(
      "q180_quantizer_eval",
      (s, dir) => {
        val e = emb(s, dir)
        val exact = e
          .crossJoin(
            broadcast(
              e.filter(col("vec_id") < 10).select(col("vec_id").as("q_id"), col("v").as("qv"))
            )
          )
          .filter(col("q_id") =!= col("vec_id"))
          .withColumn("cos", expr("cosine_sim(qv, v)"))
          .filter(col("cos").isNotNull)
          .groupBy("q_id")
          .agg(expr("top_k_structs(struct(-cos AS nc, vec_id), 5)").as("top"))
          .select(col("q_id"), explode(col("top")).as("t"))
          .select(col("q_id"), col("t.vec_id").as("vec_id"))

        def pqTop5(corpus: org.apache.spark.sql.DataFrame) = {
          val cb = graft.operators.PqIndex.fitCodebooks(corpus)
          val coded = graft.operators.PqIndex.encode(corpus, cb)
          val probes = corpus
            .filter(col("vec_id") < 10)
            .select(col("vec_id").as("q_id"), col("v").as("qv"), col("norm").as("qn"))
          graft.operators.PqIndex.adcTopK(coded, probes, cb, candK = 50, topK = 5)
        }
        def report(name: String, res: org.apache.spark.sql.DataFrame) =
          res
            .select("q_id", "vec_id")
            .join(exact, Seq("q_id", "vec_id"))
            .agg(count(lit(1)).as("hits"))
            .select(
              lit(name).as("variant"),
              col("hits"),
              expr("hits * 1000000L DIV 50").as("recall_ppm")
            )

        report("plain_pq", pqTop5(e))
          .unionByName(report("rotated_pq", pqTop5(rotatedByPcaBasis(s, dir, e))))
          .orderBy("variant")
      },
      None
    ),

    // ------------------------------------------------------------------
    // E13 (rotated-basis IVFADC serving — the q180 verdict FEEDING the
    // serving path instead of ending as a report): the index is built
    // with the eigenvalue-allocated PCA rotation (Ge et al. CVPR 2013
    // §4) persisted in its meta table, so cells, residuals, codes and
    // stored vectors all live in the coding basis; a probe
    // self-configures from meta — it rotates the QUERY once (a 64×64
    // literal-matrix projection, exchange-free) and then runs q153's
    // exact plan: DPP cell skip → codes-only ADC scan → bounded heap →
    // candidate-pruned re-rank. Cosines are rotation-invariant, so the
    // results are directly comparable to a plain index over the same
    // corpus, and an operator can adopt the q180 winner by REBUILDING
    // WITH `rotation=` and changing nothing downstream. Rows-only
    // (cells/codebooks implementation-defined); IvfAdcSpec pins recall
    // ≥0.9 vs exact q40, probe-after-append == rebuild on the union
    // corpus, and the DPP + zero-corpus-exchange plan shape.
    QueryDef(
      "q183_rotated_serving",
      (s, dir) => {
        val idx = freshIndexDir("ivfadc_rot")
        val e = emb(s, dir)
        graft.operators.IvfAdc.build(e, idx, rotation = Some(pcaRotationMatrix(s, dir)))
        graft.operators.IvfAdc.probe(
          s,
          idx,
          e.filter(col("vec_id") < 10)
            .select(col("vec_id").as("q_id"), col("v").as("qv")),
          nprobe = 10,
          candK = 256,
          topK = 5
        )
      },
      None
    ),

    // ------------------------------------------------------------------
    // E13 (FILTERED vector search, exact reference): top-k cosine
    // neighbors restricted to a metadata predicate (label = 2) — the
    // retrieval shape every production vector store serves ("nearest
    // passages in English", "nearest images with license X"). The
    // filter applies to the CANDIDATE stream before the bounded heap:
    // post-filtering an unfiltered top-k under-fills whenever fewer
    // than k unrestricted neighbors match, which is the classic
    // filtered-ANN correctness trap. This is the brute-force exact
    // reference (one broadcast of the 10-query table over the corpus
    // scan, pushed label predicate, bounded heap); q213 serves the
    // same queries from the persisted IVF index with the attribute
    // stored IN the index. ORACLE-EXACT.
    QueryDef(
      "q212_filtered_ann",
      (s, dir) => {
        val e = Tables(s, dir, "embeddings")
          .select(
            col("vec_id"),
            expr("transform(embedding, x -> cast(x AS double))").as("v"),
            col("label")
          )
          .withColumn("norm", sqrt(expr("aggregate(v, cast(0 AS double), (a, x) -> a + x*x)")))
        val q = e
          .filter(col("vec_id") < 10)
          .select(col("vec_id").as("q_id"), col("v").as("qv"))
        e.filter(col("label") === 2)
          .crossJoin(broadcast(q))
          .filter(col("q_id") =!= col("vec_id"))
          .withColumn("cos", expr("cosine_sim(qv, v)"))
          .filter(col("cos").isNotNull)
          .groupBy("q_id")
          .agg(expr("top_k_structs(struct(-cos AS nc, vec_id, cos), 5)").as("top"))
          .select(col("q_id"), posexplode(col("top")))
          .select(
            col("q_id"),
            (col("pos") + 1).cast("long").as("rank"),
            col("col.vec_id"),
            col("col.cos")
          )
          .orderBy("q_id", "rank")
      },
      Some("""WITH n AS (
          SELECT vec_id, label,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
                 sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                      list_transform(list_transform(embedding, x -> CAST(x AS DOUBLE)), x -> x*x)),
                      (a,b) -> a+b)) AS norm
          FROM embeddings),
        q AS (SELECT vec_id AS q_id, v AS qv, norm AS qn FROM n WHERE vec_id < 10),
        pairs AS (
          SELECT q_id, n.vec_id,
                 list_reduce(list_prepend(CAST(0 AS DOUBLE),
                     list_transform(range(1, len(qv)+1), i -> qv[i]*v[i])), (a,b) -> a+b)
                   / (qn * norm) AS cos
          FROM n CROSS JOIN q WHERE q_id <> n.vec_id AND n.label = 2)
        SELECT q_id, CAST(rank AS BIGINT) AS rank, vec_id, cos FROM (
          SELECT q_id, vec_id, cos,
                 row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rank
          FROM pairs WHERE cos IS NOT NULL)
        WHERE rank <= 5 ORDER BY q_id, rank"""),
    ),

    // ------------------------------------------------------------------
    // E13 (filtered vector search, INDEX-SERVED — the scale path): the
    // same filtered queries answered from the persisted IVF index with
    // the label attribute stored INSIDE the index rows, so the
    // predicate pushes into the parquet scan of the probed cells (row
    // groups outside the label range never decompress) and no
    // allowed-id set is built, shipped, or joined. The filter runs
    // before the heap — same under-fill-safety as q212 — and the
    // recall-vs-exact contract is FilteredAnnSpec's (every hit
    // satisfies the predicate; recall ≥ 0.9 against q212 at nprobe=12 —
    // selective predicates need wider probes, the documented trade).
    // Rows-checked (IVF probe misses are implementation-defined, the
    // q46/q133 precedent).
    QueryDef(
      "q213_filtered_ivf",
      (s, dir) => {
        val idx = freshIndexDir("ivf_filtered")
        val e = Tables(s, dir, "embeddings")
          .select(
            col("vec_id"),
            expr("transform(embedding, x -> cast(x AS double))").as("v"),
            col("label")
          )
          .withColumn("norm", sqrt(expr("aggregate(v, cast(0 AS double), (a, x) -> a + x*x)")))
        graft.operators.IvfIndex.build(e, idx, k = 16, maxIter = 5, seed = 42L, attrs = Seq("label"))
        graft.operators.IvfIndex.probeFiltered(
          s,
          idx,
          e.filter(col("vec_id") < 10)
            .select(col("vec_id").as("q_id"), col("v").as("qv")),
          filterExpr = Some("label = 2"),
          nprobe = 12,
          topK = 5
        )
      },
      None
    ),

    // ------------------------------------------------------------------
    // E13 (BINARY-quantized ANN): 1-bit sign quantization — each
    // 64-dim vector becomes ONE bigint signature (bit i = v[i] > 0) —
    // with Hamming distance served by two native codegen'd integer ops
    // (bit_count(sig ^ q_sig)), then an exact-cosine rerank of the
    // top-C Hamming candidates. The most aggressive point on the
    // engine's quantization spectrum (float32 → int8 q147 → PQ q152 →
    // 1-bit here): 256× smaller than the float corpus, the candidate
    // scan is pure ALU on packed longs (no arrays touched until the
    // C-bounded rerank), which at 100 TB is the difference between
    // streaming 64-bit signatures through registers and decoding
    // vectors. Both cuts are bounded heaps with deterministic
    // tie-breaks ((ham, vec_id) then (cos desc, vec_id)), so the
    // WHOLE pipeline — signatures, Hamming top-50, rerank top-5 — is
    // restated by the oracle as integer sign-disagreement counts +
    // window ranks: ORACLE-EXACT, the strongest contract any ANN
    // variant here carries (q147's int8 precedent).
    QueryDef(
      "q222_binary_ann",
      (s, dir) => {
        val e = Tables(s, dir, "embeddings")
          .select(col("vec_id"), expr("transform(embedding, x -> cast(x AS double))").as("v"))
          .withColumn(
            "sig",
            expr(
              "aggregate(sequence(0, 63), cast(0 AS bigint), (acc, i) -> " +
                "acc | shiftleft(CASE WHEN element_at(v, i + 1) > cast(0 AS double) " +
                "THEN cast(1 AS bigint) ELSE cast(0 AS bigint) END, i))"
            )
          )
        val q = e
          .filter(col("vec_id") < 10)
          .select(col("vec_id").as("q_id"), col("v").as("qv"), col("sig").as("q_sig"))
        // stage 1: Hamming top-50 over packed signatures — arrays never
        // touched, the scan is xor + popcount per (vector, query)
        val cands = e
          .drop("v")
          .crossJoin(broadcast(q.select("q_id", "q_sig")))
          .filter(col("q_id") =!= col("vec_id"))
          .withColumn("ham", expr("bit_count(sig ^ q_sig)"))
          .groupBy("q_id")
          .agg(expr("top_k_structs(struct(ham, vec_id), 50)").as("top"))
          .select(col("q_id"), explode(col("top")).as("c"))
          .select(col("q_id"), col("c.vec_id"), col("c.ham"))
        // stage 2: exact-cosine rerank of the C-bounded candidates —
        // one corpus equi-join keyed on the 500-row broadcast cut
        e.select("vec_id", "v")
          .join(broadcast(cands), Seq("vec_id"))
          .join(broadcast(q.select("q_id", "qv")), Seq("q_id"))
          .withColumn("cos", expr("cosine_sim(qv, v)"))
          .filter(col("cos").isNotNull)
          .groupBy("q_id")
          .agg(expr("top_k_structs(struct(-cos AS nc, vec_id, cos), 5)").as("top"))
          .select(col("q_id"), posexplode(col("top")))
          .select(
            col("q_id"),
            (col("pos") + 1).cast("long").as("rank"),
            col("col.vec_id"),
            col("col.cos")
          )
          .orderBy("q_id", "rank")
      },
      Some("""WITH n AS (
          SELECT vec_id,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
                 sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                      list_transform(list_transform(embedding, x -> CAST(x AS DOUBLE)), x -> x*x)),
                      (a,b) -> a+b)) AS norm
          FROM embeddings),
        q AS (SELECT vec_id AS q_id, v AS qv, norm AS qn FROM n WHERE vec_id < 10),
        ham AS (
          SELECT q_id, n.vec_id,
                 CAST(list_sum(list_transform(range(1, 65),
                      i -> CASE WHEN (qv[i] > 0) <> (v[i] > 0) THEN 1 ELSE 0 END)) AS BIGINT)
                   AS ham
          FROM n CROSS JOIN q WHERE n.vec_id <> q_id),
        cand AS (
          SELECT q_id, vec_id, ham,
                 row_number() OVER (PARTITION BY q_id ORDER BY ham, vec_id) AS rn
          FROM ham),
        rr AS (
          SELECT c.q_id, c.vec_id,
                 list_reduce(list_prepend(CAST(0 AS DOUBLE),
                     list_transform(range(1, len(q.qv)+1), i -> q.qv[i]*n.v[i])), (a,b) -> a+b)
                   / (q.qn * n.norm) AS cos
          FROM cand c JOIN n ON n.vec_id = c.vec_id JOIN q ON q.q_id = c.q_id
          WHERE c.rn <= 50)
        SELECT q_id, CAST(rank AS BIGINT) AS rank, vec_id, cos FROM (
          SELECT q_id, vec_id, cos,
                 row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rank
          FROM rr WHERE cos IS NOT NULL)
        WHERE rank <= 5 ORDER BY q_id, rank""")
    ),

    // ------------------------------------------------------------------
    // E13 (late-interaction / multi-vector retrieval, ColBERT-style
    // MaxSim — Khattab & Zaharia, SIGIR 2020): documents are SETS of
    // token vectors (4 per doc here, carved from the embeddings
    // table), and relevance is sum-of-max token interactions:
    // score(q,d) = Σ_{qt∈q} max_{dt∈d} cos(qt, dt) — what single-
    // vector retrieval cannot express (a doc matching ALL query
    // aspects beats one matching one aspect strongly). Serving is the
    // production two-stage shape: (1) mean-POOLED single vectors give
    // a cheap cosine top-50 candidate cut (bounded heap over one
    // corpus scan — the stage an IVF index would serve at scale, cf.
    // q213), then (2) exact MaxSim reranks only the 50 candidates —
    // candidates × 4×4 token pairs, never corpus × tokens. Every
    // float fold is sequenced (pooling sums tokens in tok order,
    // MaxSim sums per-query-token maxima in qtok order via
    // sort_array + sequential aggregate), so the WHOLE pipeline is
    // ORACLE-EXACT — pooling, prefilter cut, and rerank restated in
    // SQL with identical fold orders.
    QueryDef(
      "q225_maxsim_retrieval",
      (s, dir) => {
        // token table: doc = vec_id div 4, tok = vec_id % 4; only
        // complete 4-token docs participate (the tail doc of an
        // indivisible corpus would pool differently)
        val toks = Tables(s, dir, "embeddings")
          .select(
            expr("vec_id div 4").as("doc"),
            (col("vec_id") % 4).as("tok"),
            expr("transform(embedding, x -> cast(x AS double))").as("v")
          )
        val pooled = toks
          .groupBy("doc")
          .agg(sort_array(collect_list(struct(col("tok"), col("v")))).as("ts"))
          .filter(size(col("ts")) === 4)
          .withColumn(
            "pv",
            expr(
              "transform(aggregate(ts, transform(sequence(1, 64), i -> cast(0 AS double)), " +
                "(acc, t) -> zip_with(acc, t.v, (a, b) -> a + b)), x -> x / 4.0d)"
            )
          )
        val qdocs = pooled.filter(col("doc") < 2)
        // stage 1: pooled-cosine top-50 per query — one corpus scan,
        // ≤2 broadcast query vectors, bounded heap cut
        val cands = pooled
          .select(col("doc"), col("pv"))
          .crossJoin(broadcast(qdocs.select(col("doc").as("q_doc"), col("pv").as("qpv"))))
          .filter(col("doc") =!= col("q_doc"))
          .withColumn("cp", expr("cosine_sim(qpv, pv)"))
          .filter(col("cp").isNotNull)
          .groupBy("q_doc")
          .agg(expr("top_k_structs(struct(-cp AS ns, doc), 50)").as("top"))
          .select(col("q_doc"), explode(col("top.doc")).as("doc"))
        // stage 2: exact MaxSim over the bounded candidate set —
        // 100 pairs × 16 token interactions, all broadcast-side
        val qtoks = toks
          .filter(col("doc") < 2)
          .select(col("doc").as("q_doc"), col("tok").as("qtok"), col("v").as("qv"))
        // one broadcast inner join both FILTERS the corpus scan to the
        // candidate docs and fans out their (q_doc, doc) pairs
        toks
          .join(broadcast(cands), Seq("doc"))
          .join(broadcast(qtoks), Seq("q_doc"))
          .withColumn("cos", expr("cosine_sim(qv, v)"))
          .filter(col("cos").isNotNull)
          .groupBy("q_doc", "doc", "qtok")
          .agg(max(col("cos")).as("mx"))
          .groupBy("q_doc", "doc")
          .agg(sort_array(collect_list(struct(col("qtok"), col("mx")))).as("ms"))
          .withColumn(
            "score",
            expr("aggregate(ms, cast(0 AS double), (acc, m) -> acc + m.mx)")
          )
          .groupBy("q_doc")
          .agg(expr("top_k_structs(struct(-score AS ns, doc, score), 5)").as("top"))
          .select(col("q_doc"), posexplode(col("top")))
          .select(
            col("q_doc"),
            (col("pos") + 1).cast("long").as("rank"),
            col("col.doc"),
            col("col.score")
          )
          .orderBy("q_doc", "rank")
      },
      Some("""WITH t AS (
          SELECT vec_id // 4 AS doc, vec_id % 4 AS tok,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings),
        pooled AS (
          SELECT doc,
                 list_transform(range(1, 65),
                   i -> (((l[1][i] + l[2][i]) + l[3][i]) + l[4][i]) / 4.0) AS pv
          FROM (SELECT doc, list(v ORDER BY tok) AS l FROM t GROUP BY doc
                HAVING count(*) = 4)),
        pn AS (
          SELECT doc, pv,
                 sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                      list_transform(pv, x -> x*x)), (a,b) -> a+b)) AS norm
          FROM pooled),
        q AS (SELECT doc AS q_doc, pv AS qpv, norm AS qn FROM pn WHERE doc < 2),
        cand AS (
          SELECT q_doc, doc FROM (
            SELECT q_doc, pn.doc,
                   row_number() OVER (PARTITION BY q_doc ORDER BY
                     list_reduce(list_prepend(CAST(0 AS DOUBLE),
                       list_transform(range(1, 65), i -> qpv[i]*pv[i])), (a,b) -> a+b)
                       / (qn * pn.norm) DESC, pn.doc) AS rn
            FROM pn CROSS JOIN q WHERE pn.doc <> q_doc AND qn * pn.norm <> 0)
          WHERE rn <= 50),
        tn AS (
          SELECT doc, tok, v,
                 sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                      list_transform(v, x -> x*x)), (a,b) -> a+b)) AS norm
          FROM t),
        inter AS (
          SELECT c.q_doc, c.doc, qt.tok AS qtok,
                 max(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                       list_transform(range(1, 65), i -> qt.v[i]*dt.v[i])), (a,b) -> a+b)
                     / (qt.norm * dt.norm)) AS mx
          FROM cand c
          JOIN tn dt ON dt.doc = c.doc
          JOIN tn qt ON qt.doc = c.q_doc
          WHERE qt.norm * dt.norm <> 0
          GROUP BY c.q_doc, c.doc, qt.tok),
        scored AS (
          SELECT q_doc, doc,
                 list_reduce(list_prepend(CAST(0 AS DOUBLE),
                   list(mx ORDER BY qtok)), (a,b) -> a+b) AS score
          FROM inter GROUP BY q_doc, doc)
        SELECT q_doc, CAST(rank AS BIGINT) AS rank, doc, score FROM (
          SELECT q_doc, doc, score,
                 row_number() OVER (PARTITION BY q_doc ORDER BY score DESC, doc) AS rank
          FROM scored)
        WHERE rank <= 5 ORDER BY q_doc, rank""")
    ),

    // ------------------------------------------------------------------
    // E13 (Matryoshka truncation sweep — Kusupati et al. 2022): how
    // many leading dimensions does retrieval actually need? For each
    // truncation d ∈ {8, 16, 32}, rank the corpus by cosine over the
    // FIRST d dimensions and measure top-10 overlap against the
    // full-64-dim ranking, per query — the evaluation that decides
    // whether an MRL-style index can serve d ≪ D and re-rank, the
    // same build-vs-serve trade the IVFADC family already exploits
    // for codes. All cuts are bounded heaps with total (score, id)
    // orders; OVERLAPS are integers, so the whole report is
    // oracle-exact (the sliced-cosine doubles never reach the
    // output). One corpus scan per truncation (4 scans total, each a
    // broadcast of 8 query vectors — no corpus-scaled exchange).
    QueryDef(
      "q245_matryoshka_eval",
      (s, dir) => {
        val e = emb(s, dir)
        val q = e.filter(col("vec_id") < 8).select(col("vec_id").as("q_id"), col("v").as("qv"))
        def top10(d: Int): DataFrame = {
          val (qc, vc) =
            if (d >= 64) (col("qv"), col("v"))
            else (expr(s"slice(qv, 1, $d)"), expr(s"slice(v, 1, $d)"))
          e.crossJoin(broadcast(q))
            .filter(col("q_id") =!= col("vec_id"))
            .withColumn("qs", qc)
            .withColumn("vs", vc)
            .withColumn("cos", expr("cosine_sim(qs, vs)"))
            .filter(col("cos").isNotNull)
            .groupBy("q_id")
            .agg(expr("top_k_structs(struct(-cos AS nc, vec_id), 10)").as("top"))
            .select(col("q_id"), explode(col("top.vec_id")).as("vec_id"))
        }
        val full = top10(64)
        val sess = s
        import sess.implicits._
        val spine = Seq(8, 16, 32)
          .flatMap(d => (0L until 8L).map(qid => (d.toLong, qid)))
          .toDF("d", "q_id")
        val overlaps = Seq(8, 16, 32)
          .map(d =>
            top10(d)
              .join(full, Seq("q_id", "vec_id"), "left_semi")
              .groupBy("q_id")
              .agg(count(lit(1)).as("overlap"))
              .select(lit(d.toLong).as("d"), col("q_id"), col("overlap"))
          )
          .reduce(_ unionByName _)
        spine
          .join(overlaps, Seq("d", "q_id"), "left")
          .select(col("d"), col("q_id"), coalesce(col("overlap"), lit(0L)).as("overlap_at_10"))
          .orderBy("d", "q_id")
      },
      Some("""WITH n AS (
          SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings),
        q AS (SELECT vec_id AS q_id, v AS qv FROM n WHERE vec_id < 8),
        ds AS (SELECT unnest([8, 16, 32, 64]) AS d),
        pairs AS (
          SELECT d, q_id, vec_id,
                 list_reduce(list_prepend(CAST(0 AS DOUBLE),
                     list_transform(range(1, d + 1), i -> qv[i] * v[i])), (a, b) -> a + b)
                   / (sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                        list_transform(range(1, d + 1), i -> qv[i] * qv[i])), (a, b) -> a + b))
                      * sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                        list_transform(range(1, d + 1), i -> v[i] * v[i])), (a, b) -> a + b)))
                   AS cos
          FROM n CROSS JOIN q CROSS JOIN ds
          WHERE q_id <> vec_id),
        ranked AS (
          SELECT d, q_id, vec_id,
                 row_number() OVER (PARTITION BY d, q_id ORDER BY cos DESC, vec_id) AS rk
          FROM pairs WHERE cos IS NOT NULL),
        tops AS (SELECT d, q_id, vec_id FROM ranked WHERE rk <= 10)
        SELECT CAST(t.d AS BIGINT) AS d, t.q_id AS q_id,
               CAST(count(f.vec_id) AS BIGINT) AS overlap_at_10
        FROM (SELECT * FROM tops WHERE d < 64) t
        LEFT JOIN (SELECT q_id, vec_id FROM tops WHERE d = 64) f
          ON t.q_id = f.q_id AND t.vec_id = f.vec_id
        GROUP BY t.d, t.q_id ORDER BY d, t.q_id""")
    ),

    // ------------------------------------------------------------------
    // VECTOR-INDEX AUTOPILOT (round 16): q157 measures IVFADC recall
    // and q180 A/Bs quantizer designs — this closes the loop: the
    // q239 maintenance discipline (audited actions, ZERO jobs when
    // healthy, idempotent re-runs) applied to quantizer drift. The
    // lifecycle: build on the base distribution → maintain() on a
    // healthy index does NOTHING and probes stay BIT-STABLE (REQUIREd
    // by comparing collected probe results across the call) → a
    // drifted batch lands (every component shifted — the appended
    // cloud is assigned and coded under centroids/codebooks fitted on
    // the OLD distribution, the real-world drift failure) → recall
    // over drifted anchors sags under the floor → maintain() refits
    // both quantizers on the CURRENT corpus and atomically swaps the
    // staged layout in → recall REQUIREd back at/above the floor.
    // Rows-only like the rest of the IVF family (cells/codebooks are
    // implementation-defined); the floor/bit-stability/refit REQUIREs
    // and IvfAdcSpec gate it.
    QueryDef(
      "q324_index_autopilot",
      (s, dir) => {
        import graft.operators.IvfAdc
        val idx = freshIndexDir("ivfadc_autopilot")
        // a QUARTER of the corpus: the autopilot's cost is 2 quantizer
        // fits + 4 recall measurements by construction (4-6x a plain
        // build query) — the drift/refit contract is size-blind, so
        // the fixture stays lean
        val e = emb(s, dir).filter(col("vec_id") % 4 < 2).localCheckpoint()
        val base = e.filter(col("vec_id") % 2 === 0)
        // drifted batch: the whole cloud moves (+0.8 on every
        // component), norms recomputed — appended under base-fitted
        // models, the canonical drift degradation
        val drifted = e
          .filter(col("vec_id") % 2 === 1)
          .select(col("vec_id"), expr("transform(v, x -> x + 0.8d)").as("v"))
          .withColumn("norm", sqrt(expr("aggregate(v, cast(0 AS double), (a, x) -> a + x*x)")))
        val corpus0 = base
        IvfAdc.build(corpus0, idx)
        val anchorsHealthy = base
          .filter(col("vec_id") < 40)
          .select(col("vec_id").as("q_id"), col("v").as("qv"))
        // the acceptance floor is pinned at COMMISSIONING: two thirds
        // of the measured healthy recall — how a real deployment sets
        // the SLO (an absolute constant would be wrong at some scale:
        // measured healthy@5 spans 62-88% across sf at these serving
        // params, and a refit on the post-drift TWO-cloud corpus is
        // intrinsically below the single-cloud commissioning number)
        val healthy = IvfAdc.recallPct(s, idx, corpus0, anchorsHealthy, nprobe = 8, candK = 32)
        val floor = healthy * 2 / 3
        // healthy: no action, and the serving path untouched —
        // bit-stable probes across the maintain() call
        val probeBefore =
          IvfAdc.probe(s, idx, anchorsHealthy, nprobe = 8, candK = 32, topK = 5).collect().toSeq
        val healthyActions =
          IvfAdc.maintain(s, idx, corpus0, anchorsHealthy, floor, nprobe = 8, candK = 32,
            knownRecall = Some(healthy))
        require(healthyActions.isEmpty, s"healthy index must schedule zero jobs: $healthyActions")
        val probeAfter =
          IvfAdc.probe(s, idx, anchorsHealthy, nprobe = 8, candK = 32, topK = 5).collect().toSeq
        require(probeBefore == probeAfter, "healthy maintain() must leave probes bit-stable")
        // drift lands
        IvfAdc.append(drifted, idx)
        val corpus1 = base.unionByName(drifted).localCheckpoint()
        val anchorsDrift = drifted
          .filter(col("vec_id") < 80)
          .select(col("vec_id").as("q_id"), col("v").as("qv"))
        val degraded = IvfAdc.recallPct(s, idx, corpus1, anchorsDrift, nprobe = 8, candK = 32)
        val actions =
          IvfAdc.maintain(s, idx, corpus1, anchorsDrift, floor, nprobe = 8, candK = 32,
            knownRecall = Some(degraded))
        require(
          actions.nonEmpty,
          s"drifted recall $degraded% should have sagged under the $floor% floor and refit"
        )
        // maintain() measured the post-refit recall itself (deterministic
        // given the swapped index) — reuse it instead of a fourth full
        // probe + exact pass
        val refit = actions
          .collectFirst { case ("recall_after", v) => v.stripSuffix("%").toLong }
          .getOrElse(IvfAdc.recallPct(s, idx, corpus1, anchorsDrift, nprobe = 8, candK = 32))
        require(
          refit >= floor,
          s"autopilot refit must restore recall to >= $floor%, got $refit% (was $degraded%)"
        )
        require(refit > degraded, "refit must improve recall over the drifted state")
        val sess = s
        import sess.implicits._
        Seq(
          ("healthy_actions", healthyActions.size.toLong),
          ("degraded_recall_pct", degraded),
          ("refit_actions", actions.size.toLong),
          ("refit_recall_pct", refit)
        ).toDF("step", "value").orderBy("step")
      },
      None
    )
  )

  /** Rotate the embedding corpus through the PCA eigenbasis of its
    * int8-code moment matrix (exact integers → deterministic Jacobi →
    * the same basis every run). Returns the same (vec_id, v, norm)
    * shape with v replaced by V·v — a pure rotation, so norms and
    * cosines are preserved up to float fold order.
    */
  private[queries] def rotatedByPcaBasis(
      s: org.apache.spark.sql.SparkSession,
      dir: String,
      e: org.apache.spark.sql.DataFrame
  ): org.apache.spark.sql.DataFrame = {
    val allocated = pcaRotationMatrix(s, dir)
    val matLit = array(
      allocated.toIndexedSeq.map(row => array(row.toIndexedSeq.map(lit): _*)): _*
    )
    e.withColumn(
      "v",
      transform(
        matLit,
        row =>
          aggregate(zip_with(row, col("v"), (a, b) => a * b), lit(0.0), (acc, x) => acc + x)
      )
    ).withColumn("norm", sqrt(expr("aggregate(v, cast(0 AS double), (a, x) -> a + x*x)")))
      // eager materialization: the 64×64 literal-matrix projection is a
      // large codegen expression, and the 8 per-subspace codebook fits
      // downstream each submit their own job — a lazy rotation would be
      // re-evaluated by every one of them (the round-6 lazy-cache
      // lesson; measured 14.5s → ~5s for q180)
      .localCheckpoint()
  }

  /** The eigenvalue-allocated PCA rotation ITSELF (the matrix
    * [[rotatedByPcaBasis]] applies, q183 persists into a serving
    * index): orthonormal rows, one row per output dim. */
  private[graft] def pcaRotationMatrix(
      s: org.apache.spark.sql.SparkSession,
      dir: String
  ): Seq[Seq[Double]] = {
    val op = udaf(new graft.operators.VectorAggregates.IntOuterProduct(64))
    val m = Tables(s, dir, "embeddings")
      .withColumn(
        "mx",
        greatest(
          expr(
            "aggregate(embedding, cast(0 AS double), (a, x) -> greatest(a, abs(cast(x AS double))))"
          ),
          lit(1e-30)
        )
      )
      .withColumn(
        "qc",
        expr("transform(embedding, x -> cast(round(cast(x AS double) * 127 / mx) AS bigint))")
      )
      .groupBy()
      .agg(op(col("qc")).as("m"))
      .select(col("m.upper"), col("m.sums"), col("m.n"))
      .head()
    val cov = graft.operators.Pca.covarianceFromMoments(
      m.getSeq[Long](0).toArray,
      m.getSeq[Long](1).toArray,
      m.getLong(2),
      64
    )
    val (vals, basis) = graft.operators.Pca.jacobiEigen(cov)
    // Eigenvalue allocation (Ge et al. §4, the parametric OPQ init):
    // a RAW PCA ordering stuffs all the variance into the first PQ
    // subspace — 16 centroids then face the hardest dims while the
    // trailing codebooks quantize near-zeros (measured: recall@5
    // collapsed to 0.58). Distribute the eigen-dims greedily so every
    // subspace carries a balanced variance PRODUCT: assign each dim,
    // descending by eigenvalue, to the least-loaded non-full subspace
    // (log-sum load; ε floors a zero eigenvalue). The result is a
    // permutation of orthonormal rows — still a pure rotation.
    val m0 = 8
    val per = 64 / m0
    val load = Array.fill(m0)(0.0)
    val members = Array.fill(m0)(List.empty[Int])
    (0 until 64).foreach { k =>
      val open = (0 until m0).filter(sb => members(sb).length < per)
      val sb = open.minBy(s => (load(s), s))
      load(sb) += math.log(math.max(vals(k), 1e-12))
      members(sb) ::= k
    }
    val order = (0 until m0).flatMap(sb => members(sb).reverse)
    order.map(k => basis(k).toSeq)
  }
}
