package graft.pipeline

import graft.connector.KvCommands
import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Full-text retrieval over the documents corpus: BM25 ranking, a
  * persistent inverted index on the kv store, and exact phrase search.
  *
  * Scale posture (the 100-TB story):
  *  - The postings build is ONE explode + groupBy — shuffle bytes are
  *    O(total tokens), and for a fixed query the token stream is filtered
  *    to the query terms BEFORE the shuffle, so an ad-hoc search moves
  *    only matching tokens.
  *  - Per-term document frequencies and the corpus length stats are tiny
  *    (|query| rows / 1 row) and broadcast — the scoring join never
  *    shuffles the corpus side.
  *  - The materialized index stores postings in a graftkv table keyed by
  *    (term, doc_id): a query probes |query| key ranges through the
  *    engine's own seek/prune machinery instead of re-tokenizing the
  *    corpus; index size is O(total tokens) once, amortized over every
  *    subsequent search.
  *  - Phrase counting is MAP-ONLY (a higher-order filter over the token
  *    array) — zero shuffle, linear in corpus bytes.
  *
  * BM25 arithmetic is deliberately IEEE-mirrorable for the DuckDB oracle:
  * the idf is the rational Robertson–Sparck-Jones form (N − df + 0.5) /
  * (df + 0.5) — no transcendental log whose libm could differ by an ulp
  * between engines — and every division/multiplication is a single IEEE
  * double op in the same tree shape on both sides. Per-term contributions
  * are summed through DECIMAL(38,6) (the [[graft.QuerySpec.dsum]]
  * contract) so the fold is order-independent.
  */
object Retrieval {

  val K1 = 1.2
  val B = 0.75

  /** (doc_id, w: array<string>) whitespace tokens, empties removed —
    * identical to the oracle's string_split_regex('\s+') + filter. */
  private def toks(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), TextFunctions.tokens(col("text")).as("w"))

  /** Postings list: one row per (term, doc_id) with the term frequency.
    * One explode + one groupBy; never materializes per-doc maps. */
  def postings(docs: DataFrame): DataFrame =
    toks(docs)
      .select(col("doc_id"), explode(col("w")).as("term"))
      .groupBy("term", "doc_id")
      .agg(count(lit(1)).as("tf"))

  /** Per-document token counts (BM25's dl). */
  def docLengths(docs: DataFrame): DataFrame =
    toks(docs).select(col("doc_id"), size(col("w")).as("dl"))

  /** BM25 score contribution of one (tf, dl, df) posting given corpus
    * stats. Every op is one IEEE double op; the oracle SQL restates the
    * identical tree with explicit DOUBLE casts (DuckDB numeric literals
    * default to DECIMAL). */
  private def contribution(tf: org.apache.spark.sql.Column,
      dl: org.apache.spark.sql.Column, df: org.apache.spark.sql.Column,
      nDocs: org.apache.spark.sql.Column,
      sumDl: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val idf = ((nDocs - df).cast("double") + lit(0.5)) /
      (df.cast("double") + lit(0.5))
    val avgdl = sumDl.cast("double") / nDocs.cast("double")
    val num = tf.cast("double") * lit(K1 + 1.0)
    val den = tf.cast("double") +
      lit(K1) * (lit(1.0 - B) + lit(B) * (dl.cast("double") / avgdl))
    idf * (num / den)
  }

  /** Rank (doc_id, score, n_terms) rows given `hits` = (term, doc_id,
    * tf, dl) postings restricted to the query terms, plus the corpus
    * totals. Shared by the scan path and the index path, so both return
    * bit-identical scores. */
  private def rank(hits: DataFrame, stats: DataFrame, k: Int): DataFrame = {
    val dfreq = hits.groupBy("term").agg(count(lit(1)).as("df"))
    hits
      .join(broadcast(dfreq), "term")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"),
        contribution(col("tf"), col("dl"), col("df"),
          col("n_docs"), col("sum_dl")).as("contrib"))
      .groupBy("doc_id")
      .agg(sum(col("contrib").cast(DecimalType(38, 6))).cast("double")
          .as("score"),
        count(lit(1)).cast("int").as("n_terms"))
      .orderBy(desc("score"), asc("doc_id"))
      .limit(k)
  }

  /** The empty-query result shape: no term can match, so no document
    * scores — mirrors the pre-round-11 `isin(nothing)` = false
    * behavior instead of building an untyped `array()` that
    * `array_contains` rejects at analysis time. */
  private def emptyBm25(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), lit(0.0).as("score"),
      lit(0).cast("int").as("n_terms")).limit(0)

  /** Tokenize the corpus ONCE into its narrowest useful form —
    * (doc_id, dl, query-term tokens only), O(n_docs + matching tokens)
    * — and materialize it via an eager localCheckpoint so both
    * consumers (corpus stats, postings) read the stored rows instead
    * of re-tokenizing (the round-10 shape paid two full tokenize
    * scans; exchange reuse cannot merge them because each consumer
    * prunes different columns). localCheckpoint stores plain RDD
    * blocks — NOT a CacheManager entry, which would hold a strong
    * reference until an explicit unpersist — so the blocks are freed
    * by the ContextCleaner as soon as the query's RDDs are
    * unreachable: a long-running SEARCH-serving session stays bounded
    * across distinct queries. Trade-off: lineage is truncated, so an
    * executor loss mid-query fails the query instead of recomputing
    * (acceptable for an interactive search; re-issue retries). */
  private def narrowToks(docs: DataFrame, terms: Seq[String]): DataFrame = {
    val qArr = array(terms.map(lit): _*)
    // parallelizeInput: the tokenize (regex split per row) is the
    // dominant per-row cost; on an under-split source (the corpus is
    // single-row-group parquet → a one-task scan) it would otherwise
    // run on one core — see Scale.parallelizeInput (guide §2.5)
    toks(graft.operators.Scale.parallelizeInput(docs))
      .select(col("doc_id"), size(col("w")).as("dl"),
        filter(col("w"), t => array_contains(qArr, t)).as("qw"))
      .localCheckpoint(true)
  }

  /** Corpus stats AND per-term document frequencies in ONE single-row
    * aggregation over the narrow token projection: df(term) is
    * count(WHEN array_contains(qw, term)) — one literal aggregate per
    * query term, so the whole pass reduces map-side to one row per task
    * and the exchange moves O(|query|) longs. The row carries n_docs,
    * sum_dl and a term → df map, ready to broadcast — per-document
    * scoring then needs no join and no doc-keyed shuffle at all. */
  private def statsAndDfMap(narrow: DataFrame,
      terms: Seq[String]): DataFrame = {
    val dfAggs = terms.zipWithIndex.map { case (t, i) =>
      count(when(array_contains(col("qw"), t), lit(1))).as(s"__df_$i")
    }
    narrow
      .agg(count(lit(1)).as("n_docs"),
        (sum(col("dl")).as("sum_dl") +: dfAggs): _*)
      .select(col("n_docs"), col("sum_dl"),
        map(terms.zipWithIndex.flatMap { case (t, i) =>
          Seq(lit(t), col(s"__df_$i"))
        }: _*).as("__dfmap"))
  }

  /** Map-side BM25 score of one document row (columns dl, qw, plus the
    * broadcast __dfmap / n_docs / sum_dl): fold the document's distinct
    * matched terms through the SAME per-term contribution tree as the
    * join path, each contribution quantized to DECIMAL(38,6) before the
    * fold exactly like the oracle's sum(CAST(contrib AS DECIMAL(38,6)))
    * — decimal addition is exact, so the fold order cannot matter and
    * the value is bit-identical to the grouped sum it replaces. */
  private def mapSideScore(terms: Column): Column =
    aggregate(terms,
      lit(0).cast(DecimalType(38, 6)),
      (acc, term) => (acc + contribution(
          size(filter(col("qw"), x => x === term)),
          col("dl"), element_at(col("__dfmap"), term),
          col("n_docs"), col("sum_dl")).cast(DecimalType(38, 6)))
        .cast(DecimalType(38, 6)))
      .cast("double")

  /** BM25 top-k straight off the corpus (no index), tokenizing the
    * corpus once (see [[narrowToks]]). Query-term filtering happens
    * BEFORE any shuffle — and since round 15 the scoring itself is
    * MAP-SIDE: tf per (doc, term) is a column fold over the stored
    * query-term tokens and df arrives as a broadcast single-row map, so
    * the round-14 plan's two document-keyed exchanges
    * (hashpartitioning(doc_id, term) for tf, hashpartitioning(doc_id)
    * for the score sum) are gone; the only remaining shuffles are the
    * O(|query|)-row df aggregation and the single-row corpus stats.
    * Returns (doc_id, score, n_terms) ordered by score desc, doc_id —
    * bit-identical to the join-shaped plan (exact decimal folds, same
    * IEEE contribution tree). */
  def bm25TopK(docs: DataFrame, query: Seq[String], k: Int): DataFrame = {
    if (query.isEmpty) return emptyBm25(docs)
    // dedupe at entry (round 16, advisor): a repeated term (SEARCH t FOR
    // 'spark spark' — the parser splits on whitespace without distinct)
    // would produce duplicate literal keys in statsAndDfMap's map() and
    // throw DUPLICATED_MAP_KEY under Spark 4's default dedup policy;
    // scoring already folds over array_distinct(qw), so results are
    // unchanged
    val terms = query.distinct
    val narrow = narrowToks(docs, terms)
    narrow
      .filter(size(col("qw")) > 0)
      .crossJoin(broadcast(statsAndDfMap(narrow, terms)))
      .select(col("doc_id"),
        mapSideScore(array_distinct(col("qw"))).as("score"),
        size(array_distinct(col("qw"))).cast("int").as("n_terms"))
      .orderBy(desc("score"), asc("doc_id"))
      .limit(k)
  }

  /** Materialize the inverted index at `dir`: a graftkv `postings` table
    * keyed by (term, doc_id) — range-shuffled and sorted, so one term =
    * one contiguous key range — a kv `doclen` table keyed by doc_id, and
    * a one-row parquet of corpus totals (derived from doclen, the single
    * source of truth the append path also folds into). */
  /** Positional postings: one row per token occurrence, (term, doc_id,
    * pos) with pos 1-based — the phrase-query side table. */
  def positions(docs: DataFrame): DataFrame =
    toks(docs)
      .select(col("doc_id"), posexplode(col("w")).as(Seq("pos0", "term")))
      .select(col("term"), col("doc_id"), (col("pos0") + 1).as("pos"))

  def buildIndex(docs: DataFrame, dir: String,
      maxSegBytes: Option[Long] = None): Unit = {
    val t = toks(docs)
    KvCommands.createTable(postings(docs), s"$dir/postings",
      Seq("term", "doc_id"), maxSegBytes = maxSegBytes)
    KvCommands.createTable(positions(docs), s"$dir/positions",
      Seq("term", "doc_id", "pos"), maxSegBytes = maxSegBytes)
    KvCommands.createTable(t.select(col("doc_id"), size(col("w")).as("dl")),
      s"$dir/doclen", Seq("doc_id"))
    // forward index (doc_id, term): the update path's key enumerator —
    // re-ingesting a MODIFIED document must be able to find and
    // tombstone the (term, doc_id) keys its new content no longer
    // produces, without scanning the whole inverted index
    KvCommands.createTable(postings(docs).select(col("doc_id"), col("term")),
      s"$dir/docterms", Seq("doc_id", "term"), maxSegBytes = maxSegBytes)
    refreshStats(t.sparkSession, dir)
  }

  /** Incrementally index new OR MODIFIED documents. New doc_ids grow the
    * postings/positions/doclen tables by O(new tokens). A re-ingested
    * doc_id is a true UPDATE: its previous (doc_id, term) pairs are
    * enumerated from the `docterms` forward index (a doc_id-prefix key
    * probe, O(old tokens of the changed docs)); pairs the new content no
    * longer produces get tombstones in postings and docterms, and every
    * old positional key of the changed docs is tombstoned before the new
    * positions land at the next generation (generation-ordered
    * last-write-wins resurrects the re-put ones) — so stale tf/df and
    * phantom phrase matches cannot survive an update. Replaying an
    * identical batch stays idempotent: the stale set is empty and the
    * re-puts converge. Corpus totals re-derive from doclen. */
  def appendToIndex(spark: SparkSession, dir: String,
      newDocs: DataFrame, inListCap: Int = 10000): Unit = {
    val t = toks(newDocs)
    val dtPath = s"$dir/docterms"
    if (graft.connector.GraftKvMeta.read(dtPath).isEmpty)
      throw new IllegalStateException(
        s"no docterms forward index at $dtPath — rebuild the index with " +
          "buildIndex (pre-round-11 indexes are append-only)")
    val newIds = newDocs.select(col("doc_id")).distinct()
    // the batch's postings are consumed three times (stale diff, the
    // postings append, the docterms append) — tokenize the batch once
    val post = postings(newDocs).persist()
    // old pairs of the re-ingested docs (empty for brand-new doc_ids).
    // For the common update shape — a modest batch — the ids become an
    // explicit IN filter on the doc_id key prefix: STATIC segment
    // pruning through the kv in-list machinery, which fires
    // deterministically (DPP-style runtime filtering on a semi-join is
    // benefit-gated and skips small tables). A batch too large to
    // enumerate falls back to the semi-join, whose cost a full probe
    // scan then matches anyway.
    val batchIds = newIds.limit(inListCap + 1).collect().map(_.get(0))
    val dtProbe =
      if (batchIds.isEmpty) // empty batch: no old pairs by definition
        KvCommands.table(spark, dtPath).filter(lit(false))
      else if (batchIds.length <= inListCap)
        KvCommands.table(spark, dtPath)
          .filter(col("doc_id").isin(batchIds.toSeq: _*))
      else
        KvCommands.table(spark, dtPath)
          .join(newIds, Seq("doc_id"), "left_semi")
    val oldPairs = dtProbe
      .select(col("term"), col("doc_id"))
      .persist()
    try {
      val newPairs = post.select(col("term"), col("doc_id"))
      val stale = oldPairs.join(newPairs, Seq("term", "doc_id"), "left_anti")
        .persist()
      try {
        // CRASH-ORDERING CONTRACT (foreachBatch retries the batch until
        // it completes, so each step must leave a replay able to finish
        // the job): inverted-side tombstones FIRST, appends SECOND, and
        // the docterms rows that located the stale keys are deleted
        // LAST — a replay after any prefix still finds every stale key
        // through docterms and re-converges (tombstone-then-append
        // within one run means appends always win the final state).
        if (!stale.isEmpty) {
          stale.select(col("term"), col("doc_id"))
            .write.format("graftkv").option("tombstone", "true")
            .mode("append").save(s"$dir/postings")
        }
        // positions: a term can SURVIVE an edit at different offsets, so
        // every old positional key of the changed docs is tombstoned
        // (re-put ones resurrect at the append's later generation)
        if (!oldPairs.isEmpty) {
          KvCommands.table(spark, s"$dir/positions")
            .join(oldPairs, Seq("term", "doc_id"), "left_semi")
            .select(col("term"), col("doc_id"), col("pos"))
            .write.format("graftkv").option("tombstone", "true")
            .mode("append").save(s"$dir/positions")
        }
        KvCommands.append(post, s"$dir/postings")
        KvCommands.append(positions(newDocs), s"$dir/positions")
        KvCommands.append(t.select(col("doc_id"), size(col("w")).as("dl")),
          s"$dir/doclen")
        if (!stale.isEmpty) {
          stale.select(col("doc_id"), col("term"))
            .write.format("graftkv").option("tombstone", "true")
            .mode("append").save(dtPath)
        }
        KvCommands.append(post.select(col("doc_id"), col("term")), dtPath)
      } finally stale.unpersist()
    } finally { oldPairs.unpersist(); post.unpersist() }
    refreshStats(spark, dir)
    compactIndexTables(spark, dir)
  }

  /** Remove documents from the index entirely — the symmetric
    * counterpart of [[appendToIndex]]'s update path. Old (term, doc_id)
    * pairs are enumerated from the `docterms` forward index (doc_id-
    * prefix key probe, O(tokens of the deleted docs)); their postings
    * and positional keys get tombstones, the doclen rows follow (corpus
    * totals re-derive from doclen, so df/avgdl shrink with the corpus),
    * and the docterms rows that located them are deleted LAST — the
    * same crash-ordering contract as the update path: a replay after
    * any prefix still finds every stale key through docterms and
    * re-converges (all steps are idempotent re-tombstones). Deleting
    * ids absent from the index is a no-op. `ids` is a one-column
    * (doc_id) frame so callers can delete from a predicate without
    * collecting the id set. */
  def deleteFromIndex(spark: SparkSession, dir: String,
      ids: DataFrame, inListCap: Int = 10000): Unit = {
    val dtPath = s"$dir/docterms"
    if (graft.connector.GraftKvMeta.read(dtPath).isEmpty)
      throw new IllegalStateException(
        s"no docterms forward index at $dtPath — rebuild the index with " +
          "buildIndex (pre-round-11 indexes are append-only)")
    val delIds = ids.select(col("doc_id")).distinct()
    // same probe shape as the update path: modest batches become an
    // explicit IN list (deterministic static segment pruning on the
    // key prefix); larger ones fall back to the semi-join
    val batchIds = delIds.limit(inListCap + 1).collect().map(_.get(0))
    if (batchIds.isEmpty) return
    def byIds(df: DataFrame): DataFrame =
      if (batchIds.length <= inListCap)
        df.filter(col("doc_id").isin(batchIds.toSeq: _*))
      else df.join(delIds, Seq("doc_id"), "left_semi")
    val oldPairs = byIds(KvCommands.table(spark, dtPath))
      .select(col("term"), col("doc_id"))
      .persist()
    try {
      // inverted side FIRST (postings, then positions), doclen next,
      // docterms LAST — see the crash-ordering contract above
      if (!oldPairs.isEmpty) {
        oldPairs.select(col("term"), col("doc_id"))
          .write.format("graftkv").option("tombstone", "true")
          .mode("append").save(s"$dir/postings")
        KvCommands.table(spark, s"$dir/positions")
          .join(oldPairs, Seq("term", "doc_id"), "left_semi")
          .select(col("term"), col("doc_id"), col("pos"))
          .write.format("graftkv").option("tombstone", "true")
          .mode("append").save(s"$dir/positions")
      }
      // doclen is keyed by doc_id alone; probe to the rows that exist
      // (a zero-token doc has a doclen row but no docterms pairs, so
      // this probe must NOT go through oldPairs)
      val delLens = byIds(KvCommands.table(spark, s"$dir/doclen"))
        .select(col("doc_id"))
      delLens.write.format("graftkv").option("tombstone", "true")
        .mode("append").save(s"$dir/doclen")
      if (!oldPairs.isEmpty) {
        oldPairs.select(col("doc_id"), col("term"))
          .write.format("graftkv").option("tombstone", "true")
          .mode("append").save(dtPath)
      }
    } finally oldPairs.unpersist()
    refreshStats(spark, dir)
    compactIndexTables(spark, dir)
  }

  /** Scala-collection convenience over [[deleteFromIndex]]. */
  def deleteIdsFromIndex(spark: SparkSession, dir: String,
      docIds: Seq[Long]): Unit = {
    import spark.implicits._
    deleteFromIndex(spark, dir, docIds.toDF("doc_id"))
  }

  /** Long-running index-at-ingest hygiene: updates and deletes stack
    * generations and tombstones; the policy-gated minor compaction
    * (metadata-only check, overlapDepth = probe read amplification)
    * keeps the probe path flat. Manifest-CAS + grace retention make it
    * safe under concurrent readers/writers. Best-effort: a failed
    * compaction is logged and retried by the next append/delete. */
  private def compactIndexTables(spark: SparkSession, dir: String): Unit =
    Seq("postings", "positions", "doclen", "docterms").foreach { tbl =>
      try KvCommands.autoCompact(spark, s"$dir/$tbl")
      catch {
        case scala.util.control.NonFatal(e) =>
          org.slf4j.LoggerFactory.getLogger(getClass)
            .warn(s"auto-compaction of $dir/$tbl failed (will retry on " +
              s"next index write): $e")
      }
    }

  /** Phrase search served from the POSITIONAL index: each phrase term
    * probes its own contiguous (term, …) key range, then adjacency is
    * an equi-join on (doc_id, pos − offset) — the scan never touches
    * the corpus text, and a rare first term makes the whole chain tiny.
    * Returns (doc_id, n_occ), occurrences > 0 only — bit-identical to
    * [[phraseCounts]] on the indexed corpus. */
  def phraseSearchIndex(spark: SparkSession, dir: String,
      phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty)
    val pos = KvCommands.table(spark, s"$dir/positions")
    val heads = pos.filter(col("term") === phrase.head)
      .select(col("doc_id"), col("pos"))
    val matches = phrase.zipWithIndex.drop(1).foldLeft(heads) {
      case (acc, (p, off)) =>
        acc.join(pos.filter(col("term") === p)
            .select(col("doc_id"), (col("pos") - off).as("pos")),
          Seq("doc_id", "pos"))
    }
    matches.groupBy("doc_id")
      .agg(count(lit(1)).cast("int").as("n_occ"))
  }

  /** foreachBatch sink maintaining the index from a STREAM of documents
    * (index-at-ingest; composes with the graftkv change feed). Replays
    * are IDEMPOTENT without any sink-side ledger: a re-ingested batch
    * re-puts the same (term, doc_id) → tf and doc_id → dl rows, so
    * last-write-wins upsert converges to the same index — the stats
    * re-derive from doclen either way. */
  def indexSink(dir: String): (DataFrame, Long) => Unit =
    (batch, _) => appendToIndex(batch.sparkSession, dir, batch)

  private def refreshStats(spark: SparkSession, dir: String): Unit =
    KvCommands.table(spark, s"$dir/doclen")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("dl").cast("long")).as("sum_dl"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/stats")

  /** BM25 top-k probing the materialized index: the term IN (...) filter
    * pushes into the kv scan as |query| point ranges on the key prefix
    * (zone pruning + floor seeks — the corpus text is never read).
    * Bit-identical to [[bm25TopK]] on the same corpus. */
  def bm25SearchIndex(spark: SparkSession, dir: String, query: Seq[String],
      k: Int): DataFrame = {
    val hits = KvCommands.table(spark, s"$dir/postings")
      .filter(col("term").isin(query: _*))
      .join(KvCommands.table(spark, s"$dir/doclen"), "doc_id")
    val stats = spark.read.parquet(s"$dir/stats")
    rank(hits, stats, k)
  }

  /** Batch BM25: score MANY queries in one corpus pass — the serving
    * shape at scale (one tokenize + one shuffle amortized over the whole
    * query set, instead of one scan per query). The query set arrives as
    * (query_id, terms) and is broadcast; per-term df is shared across
    * queries. Returns the top-k (query_id, doc_id, score, n_terms, rk)
    * per query, ranked per query by score desc then doc_id. */
  def bm25TopKBatch(docs: DataFrame, queries: Seq[(String, Seq[String])],
      k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val allTerms = queries.flatMap(_._2).distinct
    if (allTerms.isEmpty)
      return emptyBm25(docs)
        .select(lit("").as("query_id"), col("doc_id"), col("score"),
          col("n_terms"), lit(0).cast("int").as("rk"))
    // one tokenize pass stored narrow (same shape as bm25TopK)
    val narrow = narrowToks(docs, allTerms)
    // Per-(query, doc) scoring is MAP-SIDE (round 15), like bm25TopK:
    // the query set is a driver-side Seq, so each query's score/n_terms
    // is a column fold over its own matched terms — the round-14 plan's
    // (doc_id, term) tf exchange and broadcast joins are gone. Only the
    // per-query top-k rank still shuffles, and its input is one row per
    // MATCHED (query, doc), the rank's true domain. Duplicate terms
    // within one query are deduped (the gates pass distinct terms).
    val perQuery = array(queries.map { case (qid, ts) =>
      val qArr = array(ts.distinct.map(lit): _*)
      val present = filter(array_distinct(col("qw")),
        t => array_contains(qArr, t))
      struct(lit(qid).as("query_id"),
        mapSideScore(present).as("score"),
        size(present).cast("int").as("n_terms"))
    }: _*)
    val scored = narrow
      .filter(size(col("qw")) > 0)
      .crossJoin(broadcast(statsAndDfMap(narrow, allTerms)))
      .select(col("doc_id"), explode(perQuery).as("__q"))
      .select(col("__q.query_id").as("query_id"), col("doc_id"),
        col("__q.score").as("score"), col("__q.n_terms").as("n_terms"))
      .filter(col("n_terms") > 0)
    // Round-16 NEGATIVE RESULT (tried, measured, reverted): ranking
    // through the bounded_top_k partial aggregate — a measured win on
    // the knnJoin pair space — made ir4 32% SLOWER here (same-process
    // interleaved A/B, median 1.15 s vs 0.87 s): this window's input is
    // small (|matched (query, doc)| rows) and Spark 4 already truncates
    // it map-side via WindowGroupLimit inside whole-stage codegen,
    // while ObjectHashAggregate runs outside codegen and pays the typed
    // aggregator's per-row encoder. The window stays.
    scored
      .withColumn("rk", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(desc("score"), asc("doc_id"))).cast("int"))
      .filter(col("rk") <= k)
      .orderBy("query_id", "rk")
  }

  /** Java/py4j-friendly entry (the Python shim's `bm25_top_k`). */
  def bm25TopKJ(docs: DataFrame, query: java.util.List[String],
      k: Int): DataFrame = {
    import scala.jdk.CollectionConverters._
    bm25TopK(docs, query.asScala.toSeq, k)
  }

  /** Java/py4j-friendly entry (the Python shim's `phrase_counts`). */
  def phraseCountsJ(docs: DataFrame,
      phrase: java.util.List[String]): DataFrame = {
    import scala.jdk.CollectionConverters._
    phraseCounts(docs, phrase.asScala.toSeq)
  }

  // Java/py4j-friendly index-lifecycle entries (the Python shim's
  // text_index_* family): no Option/Seq/default-arg in the signatures.
  def buildIndexJ(docs: DataFrame, dir: String): Unit =
    buildIndex(docs, dir)
  def appendToIndexJ(dir: String, newDocs: DataFrame): Unit =
    appendToIndex(newDocs.sparkSession, dir, newDocs)
  def deleteIdsFromIndexJ(spark: SparkSession, dir: String,
      docIds: java.util.List[java.lang.Number]): Unit = {
    import scala.jdk.CollectionConverters._
    deleteIdsFromIndex(spark, dir, docIds.asScala.toSeq.map(_.longValue()))
  }
  def bm25SearchIndexJ(spark: SparkSession, dir: String,
      query: java.util.List[String], k: Int): DataFrame = {
    import scala.jdk.CollectionConverters._
    bm25SearchIndex(spark, dir, query.asScala.toSeq, k)
  }
  def phraseSearchIndexJ(spark: SparkSession, dir: String,
      phrase: java.util.List[String]): DataFrame = {
    import scala.jdk.CollectionConverters._
    phraseSearchIndex(spark, dir, phrase.asScala.toSeq)
  }

  /** Exact phrase-occurrence counts: number of token positions where the
    * full phrase matches, per document. Map-only — a higher-order filter
    * over the token array, no explode, no shuffle (the final orderBy is
    * presentation). Overlapping occurrences count individually. */
  def phraseCounts(docs: DataFrame, phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty)
    val L = phrase.length
    val w = TextFunctions.tokens(col("text"))
    // positions i in [1, len-L+1] (1-based, like the oracle's list index)
    val matches = filter(
      sequence(lit(1), size(w) - lit(L - 1)),
      i => phrase.zipWithIndex.map { case (p, off) =>
        element_at(w, i + lit(off)) === lit(p)
      }.reduce(_ && _))
    docs.select(col("doc_id"),
        when(size(w) < L, lit(0)).otherwise(size(matches)).as("n_occ"))
      .filter(col("n_occ") > 0)
  }
}
