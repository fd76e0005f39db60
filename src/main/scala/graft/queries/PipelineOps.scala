package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Training-run preparation operators — the steps between a curated
  * corpus and actual training input: sequence packing into fixed
  * context windows, temperature-weighted mixture design, deterministic
  * hash sharding, storage-layout optimization (Z-order), and
  * retrieval-style overlapping chunking. Outputs are integers or
  * single exactly-rounded IEEE ops over integers, so every query here
  * is DuckDB-oracle-exact.
  */
object PipelineOps {

  val defs: Seq[QueryDef] = Seq(
    // ------------------------------------------------------------------
    // Sequence packing ("concatenate and chop"): documents are laid out
    // in a deterministic order and cut into fixed token-budget context
    // windows; a doc belongs to the bin where its first token lands.
    // Packing is per STRATUM (lang here): the running-sum window is
    // partitioned, so strata pack in parallel — the production layout
    // uses (lang, shard) strata to bound any one window's data, never a
    // global cumsum (a partition-less window is a single-task
    // bottleneck by construction). Integer cumsum → oracle-exact.
    QueryDef(
      "q96_sequence_pack",
      (s, dir) => {
        val budget = 2048L
        val docs = Tables(s, dir, "documents")
          .select(col("doc_id"), col("lang"), size(split(col("text"), " ")).cast("long").as("n_tok"))
        val w = Window.partitionBy("lang").orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, -1)
        docs
          .withColumn("cum_before", coalesce(sum("n_tok").over(w), lit(0L)))
          .withColumn("bin", (col("cum_before") / budget).cast("long"))
          .groupBy("lang", "bin")
          .agg(
            count(lit(1)).as("n_docs"),
            sum("n_tok").as("tokens"),
            min("doc_id").as("first_doc"),
            max("doc_id").as("last_doc")
          )
          .orderBy("lang", "bin")
      },
      Some("""WITH t AS (
          SELECT doc_id, lang,
                 CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
          FROM documents
        ), c AS (
          SELECT doc_id, lang, n_tok,
                 COALESCE(sum(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
          FROM t
        )
        SELECT lang, CAST(cum_before // 2048 AS BIGINT) AS bin,
               count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS tokens,
               min(doc_id) AS first_doc, max(doc_id) AS last_doc
        FROM c GROUP BY 1, 2 ORDER BY 1, 2"""),
    ),

    // ------------------------------------------------------------------
    // Temperature-weighted mixture design (the "alpha = 0.5" corpus
    // rebalancing used to up-sample low-resource slices): per-language
    // token mass and the unnormalized sampling weight mass^alpha.
    // alpha is fixed at 0.5 because sqrt is an IEEE exactly-rounded
    // operation — sqrt(exact integer) is bit-identical in any compliant
    // engine, where pow(x, 0.7) is not. rel_weight divides two such
    // exact doubles (division is exactly rounded too), so even the
    // derived column hash-matches. The normalized share (a float SUM
    // whose value depends on accumulation order) is deliberately left
    // to the spec, not the oracle.
    QueryDef(
      "q97_temperature_mix",
      (s, dir) => {
        val mass = Tables(s, dir, "documents")
          .groupBy("lang")
          .agg(
            count(lit(1)).as("n_docs"),
            sum(size(split(col("text"), " ")).cast("long")).as("n_tokens")
          )
          .withColumn("weight", sqrt(col("n_tokens").cast("double")))
        mass
          .withColumn("rel_weight", col("weight") / min("weight").over(Window.orderBy()))
          .orderBy("lang")
      },
      Some("""WITH m AS (
          SELECT lang, count(*) AS n_docs,
                 CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
          FROM documents GROUP BY lang
        )
        SELECT lang, n_docs, n_tokens,
               sqrt(CAST(n_tokens AS DOUBLE)) AS weight,
               sqrt(CAST(n_tokens AS DOUBLE)) / min(sqrt(CAST(n_tokens AS DOUBLE))) OVER ()
                 AS rel_weight
        FROM m ORDER BY lang"""),
    ),

    // ------------------------------------------------------------------
    // Deterministic hash sharding: shard = first hex digit of
    // md5(doc_id) → 16 shards. This is the reproducible global shuffle
    // of a training pipeline — shard assignment depends only on the
    // key, never on partitioning, task order or a seed table, so any
    // re-run (or any engine) lands every doc in the same shard. The
    // report proves balance: per-shard doc counts and token mass.
    // Fully parallel — a pure projection + one 16-group aggregate.
    QueryDef(
      "q98_shard_assign",
      (s, dir) =>
        Tables(s, dir, "documents")
          .select(
            col("doc_id"),
            size(split(col("text"), " ")).cast("long").as("n_tok"),
            (instr(lit("0123456789abcdef"), substring(md5(col("doc_id").cast("string")), 1, 1)) - 1)
              .cast("long")
              .as("shard")
          )
          .groupBy("shard")
          .agg(
            count(lit(1)).as("n_docs"),
            sum("n_tok").as("n_tokens"),
            min("doc_id").as("min_doc"),
            max("doc_id").as("max_doc")
          )
          .orderBy("shard"),
      Some("""SELECT CAST(strpos('0123456789abcdef',
                 substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1 AS BIGINT) AS shard,
               count(*) AS n_docs,
               CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
               min(doc_id) AS min_doc, max(doc_id) AS max_doc
        FROM documents GROUP BY 1 ORDER BY 1"""),
    ),

    // ------------------------------------------------------------------
    // Z-order layout report: interleave the bits of two query dimensions
    // (user bucket × day-of-month) into a space-filling-curve key, cut
    // the curve into files (top bits of the z-value), and report each
    // file's min/max on BOTH dimensions. The point of Z-ordering a
    // 100 TB table is that every file then covers a small RANGE of every
    // clustered dimension, so min/max file statistics prune scans on
    // either predicate — the ranges in this report ARE those statistics
    // (ZOrderSpec asserts they beat a single-dimension sort layout on
    // the non-sorted dimension). Bit spreading is 7 explicit shift/mask
    // terms per dimension — pure integer arithmetic, no window, no
    // global sort needed for the report itself; the physical rewrite
    // would be orderBy(z) + maxRecordsPerFile.
    QueryDef(
      "q99_zorder_layout",
      (s, dir) => {
        def spread(c: String, offset: Int): String =
          (0 until 7)
            .map(b => s"(shiftleft(shiftright($c, $b) & 1, ${2 * b + offset}))")
            .mkString(" + ")
        Tables(s, dir, "events")
          .select(
            (col("user_id") % 128).cast("long").as("x"),
            dayofmonth(col("ts")).cast("long").as("y")
          )
          .withColumn("z", expr(s"${spread("x", 0)} + ${spread("y", 1)}"))
          .withColumn("file_id", (col("z") / 64).cast("long"))
          .groupBy("file_id")
          .agg(
            count(lit(1)).as("n_rows"),
            min("x").as("min_x"),
            max("x").as("max_x"),
            min("y").as("min_y"),
            max("y").as("max_y")
          )
          .orderBy("file_id")
      },
      Some {
        def spread(c: String, offset: Int): String =
          (0 until 7)
            .map(b => s"((($c >> $b) & 1) << ${2 * b + offset})")
            .mkString(" + ")
        s"""WITH d AS (
          SELECT CAST(user_id % 128 AS BIGINT) AS x,
                 CAST(date_part('day', ts) AS BIGINT) AS y
          FROM events
        ), z AS (
          SELECT x, y, ${spread("x", 0)} + ${spread("y", 1)} AS z FROM d
        )
        SELECT CAST(z // 64 AS BIGINT) AS file_id, count(*) AS n_rows,
               min(x) AS min_x, max(x) AS max_x,
               min(y) AS min_y, max(y) AS max_y
        FROM z GROUP BY 1 ORDER BY 1"""
      },
    ),

    // ------------------------------------------------------------------
    // Retrieval-style overlapping chunking (RAG ingestion): fixed
    // 64-token windows at stride 32, so consecutive chunks share half
    // their tokens and no boundary sentence is ever split away from all
    // its context. Differs from q94 (NON-overlapping chunks keyed by
    // content for chunk-level dedup); here chunk identity is
    // (doc, position) and the payload hash rides along for downstream
    // exact dedup of the chunk store. One generate per doc — linear,
    // shuffle-free until the final sort.
    QueryDef(
      "q100_rag_chunks",
      (s, dir) =>
        Tables(s, dir, "documents")
          .select(col("doc_id"), split(col("text"), " ").as("ws"))
          .select(
            col("doc_id"),
            size(col("ws")).as("n"),
            col("ws"),
            explode(
              expr("sequence(0, greatest(0, cast(ceil((size(ws) - 64) / 32.0) AS INT)))")
            ).as("k")
          )
          .select(
            col("doc_id"),
            col("k").cast("long").as("chunk_id"),
            expr("size(slice(ws, k * 32 + 1, 64))").cast("long").as("chunk_tokens"),
            expr("md5(array_join(slice(ws, k * 32 + 1, 64), ' '))").as("chunk_md5")
          )
          .orderBy("doc_id", "chunk_id"),
      Some("""WITH t AS (
          SELECT doc_id, string_split(text, ' ') AS ws,
                 len(string_split(text, ' ')) AS n
          FROM documents
        ), k AS (
          SELECT doc_id, ws, n,
                 unnest(range(0, greatest(0, CAST(ceil((n - 64) / 32.0) AS INT)) + 1)) AS k
          FROM t
        )
        SELECT doc_id, CAST(k AS BIGINT) AS chunk_id,
               CAST(len(list_slice(ws, k * 32 + 1, least(k * 32 + 64, n))) AS BIGINT)
                 AS chunk_tokens,
               md5(array_to_string(list_slice(ws, k * 32 + 1, least(k * 32 + 64, n)), ' '))
                 AS chunk_md5
        FROM k ORDER BY doc_id, chunk_id"""),
    ),

    // ------------------------------------------------------------------
    // Leakage-safe train/val/test split: assignment is a pure function
    // of the GROUP key (source), not the row, so every document from
    // one source lands in the same split — the standard guard against
    // near-duplicate leakage across splits (train/test contamination
    // via shared boilerplate). The first md5 hex digit gives 16
    // deterministic buckets → 12/2/2 ≈ 75%/12.5%/12.5%; both engines
    // compute identical md5 hex, so the assignment is engine-portable
    // and stable under re-runs and repartitioning by construction.
    QueryDef(
      "q108_grouped_split",
      (s, dir) =>
        Tables(s, dir, "documents")
          .withColumn(
            "split",
            expr(
              "CASE WHEN substring(md5(source), 1, 1) < 'c' THEN 'train' " +
                "WHEN substring(md5(source), 1, 1) < 'e' THEN 'val' " +
                "ELSE 'test' END"
            )
          )
          .groupBy("split")
          .agg(
            count(lit(1)).as("n_docs"),
            countDistinct(col("source")).as("n_sources"),
            sum(size(split(col("text"), " "))).cast("long").as("n_tokens")
          )
          .orderBy("split"),
      Some("""SELECT CASE WHEN substr(md5(source), 1, 1) < 'c' THEN 'train'
                     WHEN substr(md5(source), 1, 1) < 'e' THEN 'val'
                     ELSE 'test' END AS split,
               count(*) AS n_docs,
               CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
               CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
          FROM documents GROUP BY 1 ORDER BY 1""")
    ),

    // ------------------------------------------------------------------
    // Deterministic weighted sampling — the corpus-rebalancing step
    // that turns a mixture design (q97) into an actual materialized
    // sample: downsample the dominant language (en keeps 1/2, de 3/4,
    // the rest keep all) by comparing a 32-bit md5 prefix of the doc id
    // against an EXACT RATIONAL threshold in integer arithmetic — no
    // RNG, no floats. At 100 TB this is the only sampling shape that
    // survives task retries and re-runs: membership is a pure function
    // of the row, so a re-executed partition keeps exactly the same
    // docs (rand(seed) does not — it is per-task-attempt), and both
    // engines compute identical md5 hex, so the oracle checks the
    // sample itself, not just its size. Map-side filter → one
    // aggregation; nothing shuffles but the 5-row result.
    QueryDef(
      "q116_weighted_sample",
      (s, dir) =>
        Tables(s, dir, "documents")
          .withColumn(
            "h32",
            conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10).cast("long")
          )
          .withColumn("keep_num", expr("CASE lang WHEN 'en' THEN 2 WHEN 'de' THEN 3 ELSE 4 END"))
          .filter(col("h32") * 4 < col("keep_num") * lit(4294967296L))
          .groupBy("lang")
          .agg(
            count(lit(1)).as("n_docs"),
            sum(size(split(col("text"), " "))).cast("long").as("n_tokens")
          )
          .orderBy("lang"),
      Some("""SELECT lang, count(*) AS n_docs,
            CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
          FROM documents
          WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) * 4
                < (CASE lang WHEN 'en' THEN 2 WHEN 'de' THEN 3 ELSE 4 END) * 4294967296
          GROUP BY 1 ORDER BY 1""")
    ),

    // ------------------------------------------------------------------
    // Token-budget corpus selection — "fill a 20%-of-corpus token
    // budget with the best documents": the curation step that turns a
    // quality score into an actual training set under a token cap.
    // Selection order is (quality bucket DESC, doc_id ASC) — quality is
    // bucketed to 1/1000ths precisely so the plan can be TWO-PASS
    // instead of a global per-doc sort: (1) per-bucket token sums roll
    // up map-side into a ≤1001-row table whose running sum (the only
    // partition-less window here — bounded by CONSTRUCTION, not data)
    // yields each bucket's tokens-above prefix; (2) docs join their
    // bucket's prefix by broadcast and a PARTITIONED running-sum window
    // (by bucket) decides the partial bucket at the cutoff. No
    // data-scaled single-task stage anywhere; the 100 TB caveat is
    // quality-skew (many docs in one bucket) — the fix is more bucket
    // digits, the same knob as any histogram. Budget arithmetic is
    // integer (total DIV 5) and quality is the shared bit-identical
    // qualityExpr, so the kept SET is oracle-exact.
    QueryDef(
      "q143_token_budget",
      (s, dir) => {
        val docs = Tables(s, dir, "documents")
          .select(
            col("doc_id"),
            size(split(col("text"), " ")).cast("long").as("n_tokens"),
            TextOps.qualityExpr.as("quality")
          )
          .withColumn("bucket", floor(col("quality") * lit(1000)).cast("long"))
        val budget = docs.agg((sum("n_tokens").cast("long")).as("t")).select(expr("t DIV 5").as("budget"))
        val wB = Window.orderBy(col("bucket").desc).rowsBetween(Window.unboundedPreceding, -1)
        val bpre = docs
          .groupBy("bucket")
          .agg(sum("n_tokens").as("btok"))
          .withColumn("above", coalesce(sum("btok").over(wB), lit(0L)))
          .select("bucket", "above")
        val wD = Window.partitionBy("bucket").orderBy("doc_id")
        docs
          .join(broadcast(bpre), Seq("bucket"))
          .crossJoin(broadcast(budget))
          .withColumn("cum_in", sum("n_tokens").over(wD))
          .filter(col("above") + col("cum_in") <= col("budget"))
          .select("doc_id", "bucket", "n_tokens", "quality")
          .orderBy(col("bucket").desc, col("doc_id"))
      },
      Some(s"""WITH d AS (
          SELECT doc_id,
                 CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                 ${TextOps.QualitySql} AS quality
          FROM documents),
        db AS (SELECT *, CAST(floor(quality * 1000) AS BIGINT) AS bucket FROM d),
        tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) // 5 AS budget FROM db),
        bk AS (SELECT bucket, CAST(sum(n_tokens) AS BIGINT) AS btok FROM db GROUP BY 1),
        bp AS (SELECT bucket,
                      COALESCE(CAST(sum(btok) OVER (ORDER BY bucket DESC
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS above
               FROM bk),
        k AS (SELECT db.doc_id, db.bucket, db.n_tokens, db.quality, bp.above,
                     CAST(sum(db.n_tokens) OVER (PARTITION BY db.bucket
                       ORDER BY db.doc_id) AS BIGINT) AS cum_in
              FROM db JOIN bp USING (bucket))
        SELECT doc_id, bucket, n_tokens, quality
        FROM k, tot WHERE above + cum_in <= budget
        ORDER BY bucket DESC, doc_id""")
    ),

    // ------------------------------------------------------------------
    // Export manifest with content checksums — the handoff artifact
    // between data-prep and the training job: the corpus is physically
    // WRITTEN out as md5-assigned shards (q98's assignment rule), the
    // files are read BACK, and the manifest is computed from the
    // re-read bytes — per-shard doc count, token count, and an
    // order-independent XOR of per-doc content fingerprints
    // (md5 over id:text, engine-independent — the q116/q121 md5
    // integer trick). The oracle computes the identical manifest from
    // the SOURCE table, so one lost, duplicated, re-id'd, or
    // bit-flipped document anywhere in the write→read round trip
    // breaks the hash. XOR makes the checksum order- and
    // partitioning-independent — the property a distributed writer
    // needs (q112 proves sink exactness by re-aggregation; this is
    // the portable artifact form of the same guarantee). Fresh scratch
    // dir per run (q112's rule).
    QueryDef(
      "q148_export_manifest",
      (s, dir) => {
        val out = Similarity.freshIndexDir("export_shards")
        Tables(s, dir, "documents")
          .select(
            col("doc_id"),
            col("text"),
            (instr(lit("0123456789abcdef"), substring(md5(col("doc_id").cast("string")), 1, 1)) - 1)
              .cast("long")
              .as("shard")
          )
          .write
          .partitionBy("shard")
          .parquet(out)
        s.read
          .parquet(out)
          .select(
            col("shard").cast("long").as("shard"),
            size(split(col("text"), " ")).cast("long").as("n_tok"),
            expr("cast(conv(substring(md5(concat(cast(doc_id AS string), ':', text)), 1, 15), 16, 10) AS bigint)")
              .as("fp")
          )
          .groupBy("shard")
          .agg(
            count(lit(1)).as("n_docs"),
            sum("n_tok").as("n_tokens"),
            expr("bit_xor(fp)").as("fp_xor")
          )
          .orderBy("shard")
      },
      Some("""SELECT CAST(strpos('0123456789abcdef',
                 substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1 AS BIGINT) AS shard,
               count(*) AS n_docs,
               CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
               bit_xor(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || text), 1, 15)) AS BIGINT)) AS fp_xor
        FROM documents GROUP BY 1 ORDER BY 1""")
    ),

    // ------------------------------------------------------------------
    // E-family (budget WATER-FILLING — the allocation step of data
    // mixing): split a token budget across sources proportionally to
    // priority weights, but no source can give more than it has.
    // The exact solution needs no iteration: sort sources by their
    // saturation breakpoint cap/w ascending; the number of SATURATED
    // sources k* is the largest prefix where the residual water level
    // still reaches the prefix's own breakpoint — checked in exact
    // integer CROSS-MULTIPLICATION ((B − prefixCap)·w ≥ cap·suffixW),
    // never a float threshold; everyone past k* gets floor(w·λ) via
    // one integer DIV. Budget = 60% of total capacity, so saturation
    // is real. The breakpoint sort key is one IEEE division of exact
    // integers — identical in both engines — and every allocation is
    // integer, so the whole solve is ORACLE-EXACT. Groups-scaled
    // end to end: one keyed aggregate over the corpus, then windows
    // over the source-count-sized table.
    QueryDef(
      "q252_budget_waterfill",
      (s, dir) => {
        val caps = Tables(s, dir, "documents")
          .groupBy("source")
          .agg(sum(col("n_chars").cast("long")).as("cap"))
          .withColumn("w", (expr("CAST(substring(source, 4, 2) AS int) % 3") + 1).cast("long"))
        val tot = caps.agg(
          sum("cap").as("tcap"),
          sum("w").as("tw"),
          expr("(sum(cap) * 6) DIV 10").as("budget")
        )
        val win = Window.orderBy(col("ratio"), col("source"))
        val ranked = caps
          .crossJoin(broadcast(tot))
          .withColumn("ratio", col("cap").cast("double") / col("w").cast("double"))
          .withColumn("rn", row_number().over(win).cast("long"))
          .withColumn("prefix_cap", sum("cap").over(win.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .withColumn("suffix_w", col("tw") - sum("w").over(win.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .withColumn(
            "feasible",
            col("budget") - col("prefix_cap") >= 0L &&
              (col("budget") - col("prefix_cap")) * col("w") >= col("cap") * col("suffix_w")
          )
        val kstar = ranked
          .agg(coalesce(max(when(col("feasible"), col("rn"))), lit(0L)).as("kstar"))
        val level = ranked
          .crossJoin(broadcast(kstar))
          .filter(col("rn") === col("kstar"))
          .select(
            (col("budget") - col("prefix_cap")).as("rbudget"),
            col("suffix_w").as("rw"),
            col("kstar")
          )
          .unionByName(
            // kstar = 0: nothing saturates — the level uses the full pools
            kstar
              .filter(col("kstar") === 0L)
              .crossJoin(broadcast(tot))
              .select(col("budget").as("rbudget"), col("tw").as("rw"), col("kstar"))
          )
        ranked
          .crossJoin(broadcast(level))
          .select(
            col("source"),
            col("w"),
            col("cap"),
            when(col("rn") <= col("kstar"), col("cap"))
              .otherwise(least(col("cap"), expr("(w * rbudget) DIV rw")))
              .as("alloc")
          )
          .orderBy("source")
      },
      Some("""WITH caps AS (
          SELECT source, CAST(sum(n_chars) AS BIGINT) AS cap,
                 CAST(CAST(substring(source, 4, 2) AS INT) % 3 + 1 AS BIGINT) AS w
          FROM documents GROUP BY source),
        tot AS (SELECT sum(cap) AS tcap, sum(w) AS tw, (sum(cap) * 6) // 10 AS budget FROM caps),
        ranked AS (
          SELECT source, cap, w, budget, tw,
                 row_number() OVER ord AS rn,
                 sum(cap) OVER (ord ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prefix_cap,
                 tw - sum(w) OVER (ord ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS suffix_w
          FROM caps CROSS JOIN tot
          WINDOW ord AS (ORDER BY CAST(cap AS DOUBLE) / CAST(w AS DOUBLE), source)),
        feas AS (
          SELECT *, (budget - prefix_cap >= 0 AND (budget - prefix_cap) * w >= cap * suffix_w) AS feasible
          FROM ranked),
        ks AS (SELECT coalesce(max(CASE WHEN feasible THEN rn END), 0) AS kstar FROM feas),
        lvl AS (
          SELECT budget - prefix_cap AS rbudget, suffix_w AS rw, kstar
          FROM feas CROSS JOIN ks WHERE rn = kstar
          UNION ALL
          SELECT budget, tw, kstar FROM tot CROSS JOIN ks WHERE kstar = 0)
        SELECT f.source, f.w, f.cap,
               CAST(CASE WHEN f.rn <= l.kstar THEN f.cap
                    ELSE least(f.cap, (f.w * l.rbudget) // l.rw) END AS BIGINT) AS alloc
        FROM feas f CROSS JOIN lvl l
        ORDER BY f.source""")
    ),

    // ------------------------------------------------------------------
    // CONVERSATION-STRUCTURE VALIDATION (SFT-data hygiene, round 13):
    // multi-turn training conversations must be CONTIGUOUS (turn
    // indexes 0..n-1, no gaps), ALTERNATING (no two consecutive turns
    // by one role), user-first and assistant-final — the four checks
    // every chat-SFT pipeline runs before packing. Conversations are
    // synthesized deterministically from `documents` (6 turns per
    // conv, roles by turn parity) with two planted defect classes:
    // dropped turns (doc_id % 17 = 5 → gaps) and role flips
    // (doc_id % 23 = 7 → alternation breaks). Each conv gets the
    // FIRST failing verdict in a fixed rule order, so the census is
    // deterministic; all checks are one conv-keyed aggregate + one
    // lag window — conv-bounded, never corpus-sorted. ORACLE-EXACT.
    QueryDef(
      "q262_conversation_validate",
      (s, dir) => {
        val turns = Tables(s, dir, "documents")
          .filter(col("doc_id") % 17 =!= 5) // planted gaps
          .select(
            (col("doc_id") / 6).cast("long").as("conv_id"),
            (col("doc_id") % 6).as("turn_idx"),
            when(col("doc_id") % 23 === 7, lit("user")) // planted role flips
              .otherwise(when(col("doc_id") % 2 === 0, "user").otherwise("assistant"))
              .as("role"),
            size(split(col("text"), " ")).cast("long").as("n_tok")
          )
        val w = Window.partitionBy("conv_id").orderBy("turn_idx")
        val per = turns
          .withColumn("prev_role", lag("role", 1).over(w))
          .groupBy("conv_id")
          .agg(
            count(lit(1)).as("n_turns"),
            sum("n_tok").as("tokens"),
            min("turn_idx").as("min_i"),
            max("turn_idx").as("max_i"),
            sum(when(col("role") === col("prev_role"), 1L).otherwise(0L)).as("n_same"),
            min(when(col("turn_idx") === 0, col("role"))).as("first_role"),
            max(struct(col("turn_idx"), col("role"))).as("last")
          )
          .withColumn(
            "verdict",
            when(col("min_i") =!= 0 || col("max_i") =!= col("n_turns") - 1, "gap")
              .when(col("n_same") > 0, "role_break")
              .when(col("first_role") =!= "user", "not_user_first")
              .when(col("last.role") =!= "assistant", "not_assistant_final")
              .otherwise("ok")
          )
        per
          .groupBy("verdict")
          .agg(count(lit(1)).as("n_convs"), sum("n_turns").as("n_turns"), sum("tokens").as("tokens"))
          .orderBy("verdict")
      },
      Some("""WITH turns AS (
          SELECT doc_id // 6 AS conv_id, doc_id % 6 AS turn_idx,
                 CASE WHEN doc_id % 23 = 7 THEN 'user'
                      WHEN doc_id % 2 = 0 THEN 'user' ELSE 'assistant' END AS role,
                 CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
          FROM documents WHERE doc_id % 17 <> 5),
        lagged AS (
          SELECT *, lag(role) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev_role
          FROM turns),
        per AS (
          SELECT conv_id, count(*) AS n_turns, sum(n_tok) AS tokens,
                 min(turn_idx) AS min_i, max(turn_idx) AS max_i,
                 sum(CASE WHEN role = prev_role THEN 1 ELSE 0 END) AS n_same,
                 min(CASE WHEN turn_idx = 0 THEN role END) AS first_role,
                 max_by(role, turn_idx) AS last_role
          FROM lagged GROUP BY conv_id),
        verdicts AS (
          SELECT *,
                 CASE WHEN min_i <> 0 OR max_i <> n_turns - 1 THEN 'gap'
                      WHEN n_same > 0 THEN 'role_break'
                      WHEN first_role <> 'user' THEN 'not_user_first'
                      WHEN last_role <> 'assistant' THEN 'not_assistant_final'
                      ELSE 'ok' END AS verdict
          FROM per)
        SELECT verdict, count(*) AS n_convs,
               CAST(sum(n_turns) AS BIGINT) AS n_turns,
               CAST(sum(tokens) AS BIGINT) AS tokens
        FROM verdicts GROUP BY verdict ORDER BY verdict""")
    ),

    // ------------------------------------------------------------------
    // DPO PREFERENCE-PAIR CONSTRUCTION (round 13): per prompt group,
    // emit (chosen, rejected) = (best, worst) response by an integer
    // quality score, kept only when the margin clears a floor — the
    // preference-data prep step for direct preference optimization.
    // Groups are deterministic doc buckets; the score is n_chars with
    // an md5 tiebreak so argmax/argmin are total. Both extremes come
    // from ONE window pass each (row_number over the group — compiled
    // by TopKRewrite into the bounded-heap operator, so no group is
    // ever sorted whole). ORACLE-EXACT.
    QueryDef(
      "q263_dpo_pairs",
      (s, dir) => {
        val docs = Tables(s, dir, "documents")
          .select(
            col("lang"),
            (col("doc_id") / 50).cast("long").as("grp"),
            col("doc_id"),
            col("n_chars").cast("long").as("score"),
            md5(col("doc_id").cast("string")).as("tb")
          )
        val up = Window.partitionBy("lang", "grp").orderBy(desc("score"), asc("tb"))
        val dn = Window.partitionBy("lang", "grp").orderBy(asc("score"), desc("tb"))
        val chosen = docs
          .withColumn("rn", row_number().over(up))
          .filter(col("rn") === 1)
          .select(col("lang"), col("grp"), col("doc_id").as("chosen"), col("score").as("cs"))
        val rejected = docs
          .withColumn("rn", row_number().over(dn))
          .filter(col("rn") === 1)
          .select(col("lang"), col("grp"), col("doc_id").as("rejected"), col("score").as("rs"))
        chosen
          .join(rejected, Seq("lang", "grp"))
          .withColumn("margin", col("cs") - col("rs"))
          .filter(col("margin") >= 50)
          .select("lang", "grp", "chosen", "rejected", "margin")
          .orderBy("lang", "grp")
      },
      Some("""WITH docs AS (
          SELECT lang, doc_id // 50 AS grp, doc_id,
                 CAST(n_chars AS BIGINT) AS score,
                 md5(CAST(doc_id AS VARCHAR)) AS tb
          FROM documents),
        up AS (SELECT lang, grp, doc_id AS chosen, score AS cs FROM (
            SELECT *, row_number() OVER (PARTITION BY lang, grp
                        ORDER BY score DESC, tb ASC) AS rn FROM docs) WHERE rn = 1),
        dn AS (SELECT lang, grp, doc_id AS rejected, score AS rs FROM (
            SELECT *, row_number() OVER (PARTITION BY lang, grp
                        ORDER BY score ASC, tb DESC) AS rn FROM docs) WHERE rn = 1)
        SELECT up.lang, up.grp, chosen, rejected, cs - rs AS margin
        FROM up JOIN dn ON up.lang = dn.lang AND up.grp = dn.grp
        WHERE cs - rs >= 50
        ORDER BY up.lang, up.grp""")
    ),

    // ------------------------------------------------------------------
    // CURRICULUM ORDERING MANIFEST (round 13): training-order prep —
    // docs bucketed into difficulty STAGES by fixed length thresholds,
    // deterministically shuffled within a stage by md5, and emitted as
    // a (stage, shard) MANIFEST (16 md5 shards per stage: counts,
    // token mass, an order-independent XOR fingerprint of member ids)
    // rather than one totally-ordered list — the q148 handoff shape,
    // which is what keeps curriculum emission DISTRIBUTED at 100 TB:
    // a loader streams shards in (stage, shard) order and shuffles
    // within a shard buffer, so no stage is ever a single sorted
    // partition. ORACLE-EXACT including the fingerprints.
    QueryDef(
      "q264_curriculum_manifest",
      (s, dir) => {
        val staged = Tables(s, dir, "documents")
          .select(
            col("doc_id"),
            size(split(col("text"), " ")).cast("long").as("n_tok"),
            when(col("n_chars") < 150, 0L)
              .when(col("n_chars") < 300, 1L)
              .when(col("n_chars") < 450, 2L)
              .otherwise(3L)
              .as("stage"),
            md5(col("doc_id").cast("string")).as("h")
          )
          .withColumn("shard", expr("instr('0123456789abcdef', substring(h, 1, 1)) - 1").cast("long"))
        staged
          .withColumn("fp", expr("cast(conv(substring(h, 2, 15), 16, 10) AS bigint)"))
          .groupBy("stage", "shard")
          .agg(
            count(lit(1)).as("n_docs"),
            sum("n_tok").as("tokens"),
            expr("bit_xor(fp)").as("fp_xor")
          )
          .orderBy("stage", "shard")
      },
      Some("""WITH staged AS (
          SELECT doc_id,
                 CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
                 CASE WHEN n_chars < 150 THEN 0
                      WHEN n_chars < 300 THEN 1
                      WHEN n_chars < 450 THEN 2 ELSE 3 END AS stage,
                 md5(CAST(doc_id AS VARCHAR)) AS h
          FROM documents)
        SELECT CAST(stage AS BIGINT) AS stage,
               CAST(strpos('0123456789abcdef', substring(h, 1, 1)) - 1 AS BIGINT) AS shard,
               count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS tokens,
               bit_xor(CAST(('0x' || substring(h, 2, 15)) AS BIGINT)) AS fp_xor
        FROM staged GROUP BY 1, 2 ORDER BY 1, 2""")
    )
  )
}
