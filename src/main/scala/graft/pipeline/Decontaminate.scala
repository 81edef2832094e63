package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-corpus decontamination: remove training documents that overlap
  * an evaluation/benchmark corpus by word n-gram collision — the
  * standard leakage guard run before LLM training (extension scope; the
  * reference has no text pipeline).
  *
  * Scale shape (the 100 TB side is `train`; `eval` is benchmarks —
  * orders of magnitude smaller): both sides reduce to DISTINCT
  * shingle-hash sets via the one-pass native kernel
  * ([[graft.functions.ShingleHashes]], codegen'd — no shingle strings
  * ever materialize), the eval side collapses to one deduplicated gram
  * column, and the overlap is a hash equi-join on (gram) of the
  * EXPLODED train sets — near-linear in corpus token count, the same
  * shuffle shape as the LSH banding in [[Dedup]]. Catalyst/AQE
  * broadcast the eval gram set when it fits (the common case: a
  * benchmark suite is MBs against a 100 TB train corpus); nothing
  * collects to the driver at any size. Counting needs no
  * count-distinct: shingle sets are distinct by construction, so the
  * post-join row count per doc IS the distinct overlapping-gram count.
  */
object Decontaminate {

  /** Per-train-document benchmark overlap: the document's distinct
    * n-gram count, how many of those n-grams appear anywhere in `eval`,
    * and the contamination ratio (overlap / distinct grams; 0.0 for
    * gram-less docs). Hash-gram equality stands in for string-gram
    * equality (64-bit xxhash collisions are negligible at corpus scale
    * — the same equivalence the Jaccard verifier rests on). */
  def overlapStats(train: DataFrame, eval: DataFrame, shingle: Int = 3,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val evalGrams = Dedup.shingleHashSets(eval, shingle, textCol, idCol)
      .select(explode(col("shset")).as("gram")).distinct()
      .withColumn("__hit", lit(1))
    // ONE train pass: the doc's gram count rides along the exploded
    // rows, a LEFT join marks eval hits, and one grouping folds both
    // numbers back. Non-null sub-n docs get the whole-document shingle,
    // but a NULL text yields a NULL shset — explode_outer (plus the
    // coalesced count) keeps such docs in the stats with n_grams = 0
    // instead of silently dropping them; their NULL gram never matches
    // an eval gram.
    Dedup.shingleHashSets(train, shingle, textCol, idCol)
      .select(col(idCol),
        coalesce(size(col("shset")), lit(0)).cast("long").as("n_grams"),
        explode_outer(col("shset")).as("gram"))
      .join(evalGrams, Seq("gram"), "left")
      .groupBy(idCol)
      .agg(max(col("n_grams")).as("n_grams"),
        count(col("__hit")).as("n_overlap"))
      .withColumn("overlap_ratio",
        when(col("n_grams") === 0, 0.0)
          .otherwise(col("n_overlap").cast("double") / col("n_grams")))
  }

  /** Ingest-time decontamination for UNBOUNDED document streams —
    * completely stateless: the benchmark gram set folds into ONE array
    * row on the static side (executor-side collect_set, never a driver
    * collect), a stream-static cross join broadcasts it to every task,
    * and each streamed document computes its overlap map-side via
    * array_intersect. No state store, no shuffle, append-mode —
    * the right shape for filtering a firehose against a benchmark
    * suite (MBs of grams vs an unbounded stream). Overlap counts are
    * identical to [[overlapStats]]: shingle sets are distinct, so
    * |array_intersect| is the batch join's per-doc hit count. */
  def decontaminateStream(stream: DataFrame, eval: DataFrame,
      shingle: Int = 3, maxRatio: Double = 0.2, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    // collect_set deduplicates on its own (map-side too) — no distinct()
    val evalSet = Dedup.shingleHashSets(eval, shingle, textCol, idCol)
      .select(explode(col("shset")).as("gram"))
      .agg(collect_set(col("gram")).as("__eval_set"))
    stream
      .withColumn("__shset", graft.functions.ShingleHashes.shingle_hashes(
        graft.functions.TextFunctions.tokens(col(textCol)), shingle))
      .crossJoin(broadcast(evalSet))
      // NULL text ⇒ null shset ⇒ ratio must be 0.0, matching the batch
      // path (a null-text doc contributes no grams, is never dirty,
      // and survives the anti-join there)
      .withColumn("__ratio",
        when(col("__shset").isNull || size(col("__shset")) === 0, 0.0)
          .otherwise(size(array_intersect(col("__shset"), col("__eval_set")))
            .cast("double") / size(col("__shset"))))
      .filter(col("__ratio") <= maxRatio)
      .drop("__shset", "__eval_set", "__ratio")
  }

  /** Training rows surviving decontamination: documents whose
    * contamination ratio exceeds `maxRatio` are dropped (ratio, not
    * absolute count, so long documents aren't over-penalized for one
    * quoted benchmark line). Keeps every train column. */
  def decontaminate(train: DataFrame, eval: DataFrame, shingle: Int = 3,
      maxRatio: Double = 0.2, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val dirty = overlapStats(train, eval, shingle, textCol, idCol)
      .filter(col("overlap_ratio") > maxRatio)
      .select(col(idCol))
    train.join(dirty, Seq(idCol), "left_anti")
  }
}
