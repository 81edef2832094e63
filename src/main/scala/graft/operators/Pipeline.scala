package graft.operators

import graft.{QuerySpec, Tables}
import graft.functions.{RollingHash, TextFunctions}
import graft.pipeline.{Dedup, Multimodal, Similarity}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** LLM-training-data pipeline operators over the `documents` /
  * `embeddings` corpus tables: deduplication, text analysis, similarity
  * search, multimodal plumbing. SQL-expressible ops carry DuckDB oracles;
  * hash-based ops (engine-specific xxhash64) are rows-only here and
  * pinned by ScalaTest specs instead.
  */
object PipelineOps {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  private val annLock = new Object

  /** Idempotently materialize the ANN index side table for a scale
    * factor (signatures + IVF cells, cell-partitioned parquet). Queries
    * probe this instead of recomputing per scan. */
  private def ensureAnnIndex(s: SparkSession, sfDir: String, dim: Int): String =
    annLock.synchronized {
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_ann/" +
        s"${sfDir.replaceAll("[^a-zA-Z0-9.]", "_")}/embeddings"
      if (!new java.io.File(s"$path/_SUCCESS").exists()) {
        graft.pipeline.AnnIndex.build(t(s, sfDir, "embeddings"), path, dim)
      }
      path
    }

  val specs: Seq[QuerySpec] = Seq(

    // ── deduplication ────────────────────────────────────────────────────
    QuerySpec.checked("dd1_exact_dedup",
      """SELECT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS text_hash,
        |  min(doc_id) AS keep_id, count(1) AS n_copies
        |FROM documents GROUP BY 1 ORDER BY keep_id""") { (s, d) =>
      Dedup.exactDedup(t(s, d, "documents")).orderBy("keep_id")
    },

    QuerySpec.checked("dd2_dedup_stats",
      """SELECT count(*) AS n_docs, count(DISTINCT text) AS n_unique,
        |  count(*) - count(DISTINCT text) AS n_dupes FROM documents""") { (s, d) =>
      t(s, d, "documents").agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("text")).as("n_unique"),
        (count(lit(1)) - countDistinct(col("text"))).as("n_dupes"))
    },

    // MinHash/LSH + SimHash near-dup: xxhash64-based, not ANSI-expressible.
    QuerySpec.rowsOnly("dd3_minhash_lsh_neardup") { (s, d) =>
      Dedup.minhashNearDuplicates(t(s, d, "documents"), k = 64, bands = 16)
        .orderBy("doc_a", "doc_b")
    },

    QuerySpec.rowsOnly("dd4_simhash") { (s, d) =>
      Dedup.simhash64(t(s, d, "documents")).orderBy("doc_id")
    },

    QuerySpec.rowsOnly("dd5_simhash_neardup") { (s, d) =>
      Dedup.simhashNearDuplicates(t(s, d, "documents"), maxDist = 3)
        .orderBy("doc_a", "doc_b")
    },

    QuerySpec.rowsOnly("dd6_ngram_jaccard") { (s, d) =>
      val docs = t(s, d, "documents")
      // exact Jaccard over LSH candidates, threshold 0 = report all pairs
      Dedup.jaccardVerify(docs, Dedup.lshCandidatePairs(
        Dedup.minhashSignatures(docs), bands = 16), threshold = 0.0)
        .orderBy("doc_a", "doc_b")
    },

    // near-dup clustering: connected components over the verified pairs,
    // one canonical doc per cluster (the step that turns pairs into a
    // deduplicated corpus)
    QuerySpec.rowsOnly("dd7_neardup_clusters") { (s, d) =>
      Dedup.nearDupClusters(Dedup.minhashNearDuplicates(t(s, d, "documents")))
        .orderBy("doc_id")
    },

    // ── text analysis ────────────────────────────────────────────────────
    QuerySpec.checked("tx1_token_count",
      """SELECT doc_id, CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens
        |FROM documents ORDER BY doc_id""") { (s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"), size(split(col("text"), " ")).as("n_tokens"))
        .orderBy("doc_id")
    },

    QuerySpec.checked("tx2_quality_stats",
      """SELECT doc_id,
        |  CAST(length(text) AS INTEGER) AS n_chars,
        |  CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
        |  (length(text) - length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g'))) * 1.0
        |    / length(text) AS punct_ratio
        |FROM documents WHERE length(text) > 0 ORDER BY doc_id""") { (s, d) =>
      t(s, d, "documents").filter(length(col("text")) > 0)
        .select(col("doc_id"),
          length(col("text")).as("n_chars"),
          size(split(col("text"), " ")).as("n_tokens"),
          TextFunctions.punctRatio(col("text")).as("punct_ratio"))
        .orderBy("doc_id")
    },

    QuerySpec.rowsOnly("tx3_quality_score") { (s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"), TextFunctions.qualityScore(col("text")).as("quality"),
          TextFunctions.stopwordRatio(col("text")).as("stopword_ratio"),
          TextFunctions.meanTokenLen(col("text")).as("mean_token_len"),
          TextFunctions.subwordCount(col("text")).as("n_subwords"))
        .orderBy("doc_id")
    },

    QuerySpec.rowsOnly("tx4_lang_id") { (s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"), col("lang").as("labeled_lang"),
          TextFunctions.langId(col("text")).as("pred_lang"))
        .orderBy("doc_id")
    },

    QuerySpec.checked("tx5_fingerprint_md5",
      """SELECT doc_id, md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
        |FROM documents ORDER BY doc_id""") { (s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"), TextFunctions.fingerprintMd5(col("text")).as("fp"))
        .orderBy("doc_id")
    },

    // custom Catalyst Expression (codegen'd Karp–Rabin rolling hash)
    QuerySpec.rowsOnly("tx6_rolling_fingerprint") { (s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"), RollingHash.rolling_hash(col("text"), 16).as("rfp"))
        .orderBy("doc_id")
    },

    // ── similarity search ────────────────────────────────────────────────
    // Exact brute-force cosine top-k (vs vec_id 0's embedding); floating
    // cosine values are engine-specific in the last ulps → rows-only, with
    // exactness pinned in SimilaritySpec against an in-test oracle.
    QuerySpec.rowsOnly("ann1_bruteforce_topk") { (s, d) =>
      val emb = t(s, d, "embeddings")
      val q = emb.filter(col("vec_id") === 0).select("embedding")
        .head().getSeq[Float](0)
      Similarity.bruteForceTopK(emb, q, k = 10)
    },

    // LSH/IVF probes run against the materialized AnnIndex side table
    // (built once per corpus): signatures/cells are precomputed, so a
    // query is a bucket probe, not an O(N·dim·planes) corpus scan.
    QuerySpec.rowsOnly("ann2_lsh_topk") { (s, d) =>
      val emb = t(s, d, "embeddings")
      val q = emb.filter(col("vec_id") === 0).select("embedding")
        .head().getSeq[Float](0)
      // synthetic embeddings are near-orthogonal: widen the multiprobe
      // radius so the candidate set is ~10% of the corpus, not ~0.
      graft.pipeline.AnnIndex.annTopK(s, ensureAnnIndex(s, d, q.length), q,
        k = 10, dim = q.length, probe = 5)
    },

    QuerySpec.rowsOnly("ann4_ivf_topk") { (s, d) =>
      val emb = t(s, d, "embeddings")
      val q = emb.filter(col("vec_id") === 0).select("embedding")
        .head().getSeq[Float](0)
      graft.pipeline.AnnIndex.ivfTopK(s, ensureAnnIndex(s, d, q.length), q,
        k = 10, nProbe = 4)
    },

    QuerySpec.rowsOnly("ann3_embedding_neardup") { (s, d) =>
      Similarity.embeddingNearDupPairs(t(s, d, "embeddings"), dim = 64,
        threshold = 0.5, nPlanes = 8).orderBy("vec_a", "vec_b")
    },

    // ── multimodal plumbing (STUB kernels, real Spark machinery) ─────────
    // The raw `features array<float>` column is pinned by MultimodalSpec;
    // here it is projected to a hashable fingerprint because the driver's
    // rows-only check still sorts/hashes the result (arrays aren't
    // hashable in its pandas compare).
    QuerySpec.rowsOnly("mm1_decode_featurize") { (s, d) =>
      Multimodal.decodeAndFeaturize(
        Multimodal.syntheticMediaTable(t(s, d, "documents")))
        .select(col("media_id"), col("mime"), col("n_bytes"), col("mean_byte"),
          xxhash64(to_json(col("features"))).as("features_fp"))
        .orderBy("media_id")
    },

    QuerySpec.rowsOnly("mm2_frame_sample") { (s, d) =>
      Multimodal.sampleFrames(
        Multimodal.syntheticMediaTable(t(s, d, "documents")))
        .select(col("media_id"), col("frame_idx"), length(col("frame_bytes")).as("n"))
        .orderBy("media_id", "frame_idx")
    },

    QuerySpec.rowsOnly("mm3_resize") { (s, d) =>
      Multimodal.resize(
        Multimodal.syntheticMediaTable(t(s, d, "documents")), factor = 2)
        .select(col("media_id"), col("width"), col("height"),
          length(col("payload")).as("n_bytes"),
          xxhash64(col("payload")).as("payload_fp"))
        .orderBy("media_id")
    },

    // BPE-ish subword counting (alnum runs + isolated symbols)
    QuerySpec.checked("tx7_subword_count",
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+|[^a-z0-9\s]')) AS INTEGER) AS n_subwords
        |FROM documents ORDER BY doc_id""") { (s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"),
          TextFunctions.subwordCount(col("text")).as("n_subwords"))
        .orderBy("doc_id")
    },

    // ── curation: quality selection, mixing, packing ─────────────────────
    QuerySpec.checked("cu1_topk_per_group",
      """SELECT lang, doc_id, n_tokens, rank_in_group FROM (
        |  SELECT lang, doc_id,
        |    CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
        |    CAST(row_number() OVER (PARTITION BY lang
        |      ORDER BY CAST(len(string_split(text, ' ')) AS INTEGER) DESC, doc_id)
        |      AS INTEGER) AS rank_in_group
        |  FROM documents)
        |WHERE rank_in_group <= 5 ORDER BY lang, rank_in_group""") { (s, d) =>
      graft.pipeline.Curation.topKPerGroup(
        t(s, d, "documents").withColumn("n_tokens",
          TextFunctions.tokenCount(col("text"))),
        groupCol = "lang", scoreCol = "n_tokens", k = 5)
        .select(col("lang"), col("doc_id"), col("n_tokens"), col("rank_in_group"))
        .orderBy("lang", "rank_in_group")
    },

    // seed-deterministic per-stratum Bernoulli — Spark's RNG, so rows-only
    QuerySpec.rowsOnly("cu2_stratified_sample") { (s, d) =>
      graft.pipeline.Curation.stratifiedSample(t(s, d, "documents"),
        stratumCol = "lang",
        fractions = Map("en" -> 0.5, "de" -> 1.0, "fr" -> 1.0, "es" -> 0.25),
        seed = 42L)
        .select(col("doc_id"), col("lang")).orderBy("doc_id")
    },

    // greedy next-fit packing — order-dependent, pinned by CurationSpec
    QuerySpec.rowsOnly("cu3_sequence_pack") { (s, d) =>
      graft.pipeline.Curation.packSequences(t(s, d, "documents"),
        budgetTokens = 512).toDF().orderBy("doc_id")
    },

    QuerySpec.rowsOnly("cu4_pack_stats") { (s, d) =>
      graft.pipeline.Curation.packStats(
        graft.pipeline.Curation.packSequences(t(s, d, "documents"),
          budgetTokens = 512), budgetTokens = 512)
        .orderBy("pack_id")
    },

    // the full curation chain (quality gate → exact dedup → near-dup
    // drop → packing) — packing is order-dependent, near-dup semantics
    // are engine-specific, so rows-only; CurationSpec pins the chain
    QuerySpec.rowsOnly("cu6_corpus_pipeline") { (s, d) =>
      graft.pipeline.Curation.curateCorpus(t(s, d, "documents"))
        .toDF().orderBy("doc_id")
    },

    // PII-style scrub before training: identical regex chain replayed by
    // the oracle (Java∩RE2-safe patterns)
    QuerySpec.checked("cu5_redact_pii",
      """SELECT doc_id,
        |  regexp_replace(
        |    regexp_replace(
        |      regexp_replace(text,
        |        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
        |      'https?://[^\s]+', '[URL]', 'g'),
        |    '[0-9]{6,}', '[NUM]', 'g') AS clean_text
        |FROM documents ORDER BY doc_id""") { (s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"),
          TextFunctions.redactPii(col("text")).as("clean_text"))
        .orderBy("doc_id")
    },

    // JSON column access (events.props is a JSON string)
    QuerySpec.checked("ev3_json_extract",
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
        |FROM events ORDER BY event_id""") { (s, d) =>
      t(s, d, "events")
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("int").as("k"))
        .orderBy("event_id")
    },

    // ── events: windowed aggregation (batch form of the streaming op) ────
    QuerySpec.checked("ev1_tumbling_window",
      """SELECT time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP)) AS ws, event_type,
        |  count(*) AS cnt,
        |  CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""") { (s, d) =>
      t(s, d, "events")
        .groupBy(window(col("ts"), "1 hour").getField("start").as("ws"),
          col("event_type"))
        .agg(count(lit(1)).as("cnt"),
          graft.QuerySpec.dsum(col("value")).as("sum_value"))
        .orderBy("ws", "event_type")
    },

    // session windows have a plain ANSI restatement (gaps-and-islands:
    // a session break is a gap >= 10 min, sessions are the running sum
    // of breaks), so the engine-specific operator gets a real oracle
    QuerySpec.checked("ev2_session_window",
      """SELECT user_id, ws, we, cnt FROM (
        |  SELECT user_id, min(t) AS ws, max(t) + INTERVAL 10 MINUTE AS we,
        |    count(*) AS cnt
        |  FROM (
        |    SELECT user_id, t,
        |      sum(CASE WHEN prev_t IS NULL
        |               OR t - prev_t >= INTERVAL 10 MINUTE THEN 1 ELSE 0 END)
        |        OVER (PARTITION BY user_id ORDER BY t
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |    FROM (
        |      SELECT user_id, CAST(ts AS TIMESTAMP) AS t,
        |        lag(CAST(ts AS TIMESTAMP))
        |          OVER (PARTITION BY user_id ORDER BY ts) AS prev_t
        |      FROM events))
        |  GROUP BY user_id, sid
        |) ORDER BY user_id, ws""") { (s, d) =>
      t(s, d, "events")
        .groupBy(session_window(col("ts"), "10 minutes").as("w"), col("user_id"))
        .agg(count(lit(1)).as("cnt"))
        .select(col("user_id"), col("w.start").as("ws"), col("w.end").as("we"), col("cnt"))
        .orderBy("user_id", "ws")
    }
  )
}
