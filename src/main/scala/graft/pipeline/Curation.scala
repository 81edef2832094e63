package graft.pipeline

import graft.functions.TextFunctions
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus curation for training-data pipelines: per-group quality
  * selection, stratified source mixing, and sequence packing — the
  * steps between "deduplicated corpus" and "training batches".
  *
  * All three are designed for the 100 TB shape:
  *  - top-k per group is one shuffle on the group key with map-side
  *    partial ranking left to Spark's window machinery;
  *  - stratified sampling is map-only (per-row Bernoulli against the
  *    stratum's fraction — no shuffle at all);
  *  - sequence packing is per-partition imperative logic (the one
  *    genuinely sequential step, so it runs via mapPartitions after an
  *    explicit deterministic repartition, never on the driver).
  */
object Curation {

  /** Deterministic epoch shuffle + shard assignment — the step between
    * "curated corpus" and "training shards": every epoch must read the
    * corpus in a pseudo-random but REPRODUCIBLE order, split into N
    * shards a loader can consume independently. The shuffle key is a
    * seeded affine hash in pure 64-bit modular arithmetic,
    * `((id mod p) * 2654435761 + seed * 40503) mod p` with
    * p = 1e9+7: staged `mod p` keeps every intermediate below 2^63 at
    * ANY id scale (ANSI-overflow-safe), and the same arithmetic is
    * exact in any engine — the gate re-derives shard and position in
    * SQL verbatim, no engine-specific hash. Shard = key mod nShards;
    * position = rank within the shard (a PARTITIONED window — one
    * shuffle on the shard column, each shard sorts independently, so
    * the plan is shard-parallel at any corpus size). Ids ≥ p collide
    * onto the same key; `idCol` tie-breaks, keeping the order total
    * and deterministic. Write shards with
    * `.repartition(col("shard")).write.partitionBy("shard")` — one
    * directory per shard, loader-addressable.
    *
    * SIZING RULE: the position window sorts each shard in ONE task
    * (that is what makes `pos_in_shard` a total in-shard order), so
    * nShards must scale with the corpus — size it so a shard's rows
    * fit a task's sort buffer comfortably, e.g.
    * `nShards >= corpusRows / 10M` (the sort is (key, id) pairs, ~16
    * bytes/row, so 10M rows ≈ 160 MB — spills safely inside a
    * standard task, never the driver). The affine key is uniform, so
    * shards are balanced by construction and one skewed shard cannot
    * form; too-few SHARDS (one giant sort per task) is the only
    * degenerate shape, and it degrades to task-local disk spill, not
    * an error. */
  def epochShuffle(docs: DataFrame, nShards: Int, seed: Long = 0L,
      idCol: String = "doc_id"): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    val p = 1000000007L
    val key = pmod(
      pmod(col(idCol).cast("long"), lit(p)) * lit(2654435761L) +
        lit(seed % p) * lit(40503L), lit(p))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy(col("shuffle_key"), col(idCol))
    docs.withColumn("shuffle_key", key)
      .withColumn("shard", pmod(col("shuffle_key"), lit(nShards.toLong)).cast("int"))
      .withColumn("pos_in_shard", (row_number().over(w) - 1).cast("long"))
  }

  /** Keep the `k` highest-quality documents per group (e.g. language or
    * source domain): the standard per-stratum quality filter. Rank by
    * `scoreCol` descending with `idCol` as the deterministic tie-break.
    * One shuffle on the group key; composes entirely from windowed
    * algebra so Catalyst/AQE own the physical plan. */
  def topKPerGroup(docs: DataFrame, groupCol: String, scoreCol: String,
      k: Int, idCol: String = "doc_id"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(col(scoreCol).desc, col(idCol))
    docs.withColumn("rank_in_group", row_number().over(w))
      .filter(col("rank_in_group") <= k)
  }

  /** Stratified sample: per-stratum Bernoulli fractions (a training-mix
    * re-weighting, e.g. upsample low-resource languages). Map-only and
    * seed-deterministic — `sampleBy` evaluates a per-row uniform draw
    * against the stratum's fraction, so no shuffle and no skew at any
    * corpus size. Strata absent from `fractions` are dropped (fraction
    * 0.0), matching the usual mixture-spec semantics. */
  def stratifiedSample(docs: DataFrame, stratumCol: String,
      fractions: Map[String, Double], seed: Long): DataFrame =
    docs.stat.sampleBy(stratumCol, fractions, seed)

  /** Per-stratum fractions realizing a TARGET MIXTURE `weights` as the
    * largest downsample-only plan: total size T = min over weighted
    * strata of n_s / w_s, fraction f_s = w_s · T / n_s — so the binding
    * stratum keeps everything, every other stratum downsamples to match
    * the target proportions in expectation, and no stratum ever
    * upsamples. Driver-side state is one (stratum, count) row per
    * stratum — constant at any corpus size. Strata without a weight are
    * dropped (fraction 0). */
  def mixtureFractions(docs: DataFrame, stratumCol: String,
      weights: Map[String, Double]): Map[String, Double] = {
    require(weights.values.forall(_ > 0.0), "weights must be positive")
    val counts = docs.filter(col(stratumCol).isin(weights.keys.toSeq: _*))
      .groupBy(stratumCol).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val present = weights.filter { case (s, _) => counts.getOrElse(s, 0L) > 0 }
    if (present.isEmpty) Map.empty
    else {
      val t = present.map { case (s, w) => counts(s) / w }.min
      present.map { case (s, w) =>
        val f = math.min(1.0, w * t / counts(s))
        // the binding stratum's fraction is 1.0 by construction, but
        // w·(n/w)/n only evaluates to an exact 1.0 for dyadic weights
        // (w = 1/3 gives 0.9999999999999999) — clamp so "the binding
        // stratum keeps everything" holds as stated, never stochastically
        s -> (if (f >= 1.0 - 1e-9) 1.0 else f)
      }
    }
  }

  /** Resample to a target mixture over `stratumCol` (e.g. re-balance
    * training sources to spec proportions): [[mixtureFractions]] then
    * the map-only deterministic per-stratum Bernoulli. */
  def mixtureResample(docs: DataFrame, stratumCol: String,
      weights: Map[String, Double], seed: Long): DataFrame =
    stratifiedSample(docs, stratumCol,
      mixtureFractions(docs, stratumCol, weights), seed)

  /** Leakage-safe train/eval split: a near-duplicate of a training
    * document inside the eval set is contamination (the eval measures
    * memorization, not generalization), so the unit of assignment is
    * the near-dup CLUSTER — every document of a cluster lands on the
    * same side. Clusters come from [[Dedup.nearDupClusters]] over the
    * caller's pair set (un-paired docs are their own singleton
    * cluster); the bucket is the same seeded affine-mod-p hash as
    * [[epochShuffle]] over the cluster id — pure 64-bit integer
    * arithmetic, so the whole assignment is deterministic, engine-
    * independent, and oracle-exact. `trainPct` of the BUCKETS go to
    * "train" (cluster-weighted, so realized doc proportions track it
    * in expectation); one broadcast-size join against the pair-graph
    * labels plus map-only arithmetic — no extra shuffle of the corpus
    * beyond the label join. */
  def splitByCluster(docs: DataFrame, pairs: DataFrame, trainPct: Int,
      seed: Long = 0L, idCol: String = "doc_id"): DataFrame = {
    require(trainPct >= 0 && trainPct <= 100,
      s"trainPct must be in [0, 100], got $trainPct")
    val clusters = Dedup.nearDupClusters(pairs, idCol = idCol)
    val p = 1000000007L
    val withCluster = docs.join(clusters, Seq(idCol), "left")
      .withColumn("cluster_id",
        coalesce(col("cluster_id"), col(idCol).cast("long")))
    val key = pmod(
      pmod(col("cluster_id"), lit(p)) * lit(2654435761L) +
        lit(seed % p) * lit(40503L), lit(p))
    withCluster
      .withColumn("split_bucket", pmod(key, lit(100L)).cast("int"))
      .withColumn("split",
        when(col("split_bucket") < trainPct, lit("train"))
          .otherwise(lit("eval")))
  }

  final case class PackedDoc(doc_id: Long, n_tokens: Int, pack_id: Long,
      pack_seq: Int)

  /** Sequence packing: assign documents to fixed token-budget packs
    * (context-window filling) with a greedy next-fit pass. Documents
    * split into `numGroups` groups by `id mod numGroups` and are walked
    * in `idCol` order inside each group; a pack closes when the next
    * document would overflow `budgetTokens`. Pack ids are
    * `group * 2^32 + localIndex` — a pure function of (ids, token
    * counts), NEVER of the physical partition layout, so the whole
    * assignment is reproducible at any parallelism and restatable in
    * ANSI SQL (the gate's DuckDB oracle re-derives it row for row). A
    * single document longer than the budget gets a pack of its own
    * (callers chunk oversized docs upstream).
    *
    * The sequential pass is genuinely order-dependent, so it runs as
    * per-partition imperative logic — one shuffle on the group key,
    * then each task packs its groups independently (a physical
    * partition may hold several groups; the walk resets per group),
    * which is exactly how a 1000-executor run wants it: no global
    * coordination, no driver involvement, and `numGroups` — not the
    * cluster's partition count — fixes the pack-id space. */
  def packSequences(docs: DataFrame, budgetTokens: Int,
      numGroups: Int = 32, idCol: String = "doc_id",
      textCol: String = "text"): Dataset[PackedDoc] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col(idCol).cast("long").as("doc_id"),
        TextFunctions.tokenCount(col(textCol)).as("n_tokens"),
        pmod(col(idCol).cast("long"), lit(numGroups.toLong)).as("grp"))
      .repartition(numGroups, col("grp"))
      .sortWithinPartitions("grp", "doc_id")
      .as[(Long, Int, Long)]
      .mapPartitions { it =>
        var curGrp = -1L
        var packLocal = -1L
        var used = 0
        var seq = 0
        var open = false
        it.map { case (docId, nTokens, grp) =>
          if (grp != curGrp) { curGrp = grp; packLocal = -1L; open = false }
          if (!open || used + nTokens > budgetTokens) {
            packLocal += 1
            used = 0; seq = 0; open = true
          }
          used += nTokens
          val out = PackedDoc(docId, nTokens, (grp << 32) | packLocal, seq)
          seq += 1
          out
        }
      }
  }

  /** Split documents into fixed-size token chunks with overlap (context-
    * window chunking: long docs become training-sized pieces, the
    * overlap preserving cross-boundary context). Map-only column
    * algebra — chunk starts are a stepped sequence, each chunk a token
    * slice — so it scales linearly with corpus bytes and introduces no
    * shuffle. A document shorter than `chunkTokens` yields exactly one
    * chunk (itself); an empty document yields none. Chunks are 1-indexed
    * in document order and every chunk starts within the document, so
    * the final chunk may be shorter than `chunkTokens` but never empty. */
  def chunkDocuments(docs: DataFrame, chunkTokens: Int, overlapTokens: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(chunkTokens > 0 && overlapTokens >= 0 &&
      overlapTokens < chunkTokens, "need 0 <= overlap < chunk")
    val step = chunkTokens - overlapTokens
    val tok = docs.select(col(idCol),
      TextFunctions.tokens(col(textCol)).as("w"))
    // stepped starts, dropping any whose PREVIOUS chunk already covered
    // the document end (the first start always stays)
    val starts = when(size(col("w")) === 0, array().cast("array<int>"))
      .otherwise(filter(
        sequence(lit(1), size(col("w")), lit(step)),
        s => s === 1 || s + lit(chunkTokens - step) <= size(col("w"))))
    tok
      .select(col(idCol), col("w"), posexplode(starts).as(Seq("i", "s")))
      .select(col(idCol),
        (col("i") + 1).cast("int").as("chunk_idx"),
        concat_ws(" ", slice(col("w"), col("s"), lit(chunkTokens)))
          .as("chunk_text"),
        least(lit(chunkTokens), size(col("w")) - col("s") + 1)
          .cast("int").as("n_tokens"))
  }

  /** Pack utilization report: docs per pack, tokens used, fill ratio —
    * the curation dashboard number ("how full are the context windows"). */
  def packStats(packed: Dataset[PackedDoc], budgetTokens: Int): DataFrame =
    packed.groupBy(col("pack_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("tokens_used"))
      .withColumn("fill", col("tokens_used").cast("double") / budgetTokens)

  /** The whole raw-corpus → training-batches chain as one declarative
    * flow: quality gate (map-only) → exact dedup (one hash shuffle) →
    * MinHash near-dup drop (banded LSH, candidates only) → token-budget
    * packing (per-partition sequential pass). Each stage only ever
    * narrows the corpus, so the expensive near-dup join runs on the
    * already-gated survivors — the stage order IS the scale design. */
  def curateCorpus(docs: DataFrame, minTokens: Int = 10,
      budgetTokens: Int = 512, threshold: Double = 0.8): Dataset[PackedDoc] = {
    val gated = docs.filter(
      TextFunctions.tokenCount(col("text")) >= minTokens)
    val exact = Dedup.dropExactDuplicates(gated)
    val pairs = Dedup.minhashNearDuplicates(exact, k = 64, bands = 16,
      shingle = 3, threshold = threshold)
    val unique = Dedup.dropNearDuplicates(exact, pairs)
    packSequences(unique, budgetTokens)
  }
}
