package graft.pipeline

import graft.io.SidecarFs
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Materialized ANN index over an embedding column — the scale path for
  * similarity search: one build pass computes every vector's hyperplane
  * signature and IVF cell assignment and writes them as a parquet side
  * table PARTITIONED BY cell, with the centroids in a sidecar. Queries
  * then probe the index:
  *
  *  - IVF top-k prunes to `nProbe` cell DIRECTORIES (partition pruning —
  *    only nProbe/nCentroids of the index is read at any corpus size);
  *  - LSH top-k filters on the precomputed signature column (no
  *    per-query O(N·dim·planes) signature recomputation).
  *
  * Centroids come from a deterministic sampled k-means: Lloyd iterations
  * over a hash-ordered sample, run driver-side (the sample is
  * nCentroids×factor rows — constant-size at any corpus scale).
  */
object AnnIndex {

  /** Bump when the signature / centroid / layout scheme changes: callers
    * key cached index paths on it, so an index materialized by an older
    * scheme is rebuilt instead of probed with mismatched signatures. */
  val FormatVersion = 5 // v5: + int8 quantized vectors (_scales.txt)

  // Sidecar and commit I/O go through [[graft.io.SidecarFs]] (Hadoop
  // FileSystem) — the parquet payloads already do, so the whole index
  // lives on whatever shared filesystem the path's scheme names.
  private def centroidFile(path: String) = SidecarFs.child(path, "_centroids.txt")
  private def paramsFile(path: String) = SidecarFs.child(path, "_params.txt")
  private def driftFile(path: String) = SidecarFs.child(path, "_drift.txt")
  private def scalesFile(path: String) = SidecarFs.child(path, "_scales.txt")

  // ── centroid selection (sampled k-means, cosine metric) ────────────────

  private[pipeline] def cosLocal(a: Array[Double], b: Array[Double]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    if (na == 0 || nb == 0) 0.0 else d / math.sqrt(na * nb)
  }

  /** Deterministic sampled k-means(-ish): take a hash-ordered sample
    * (stable across runs, no Math.random), seed with its first
    * `nCentroids` rows, run a few Lloyd iterations with the cosine
    * metric. Driver-side on a constant-size sample — not a full-corpus
    * k-means, but real cluster structure instead of "first N ids". */
  def sampleCentroids(embeddings: DataFrame, nCentroids: Int,
      sampleFactor: Int = 8, iters: Int = 5,
      vecCol: String = "embedding", idCol: String = "vec_id"): Array[Array[Double]] = {
    val sample: Array[Array[Double]] = embeddings
      .orderBy(xxhash64(col(idCol)), col(idCol))
      .limit(nCentroids * sampleFactor)
      .select(col(vecCol)).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    require(sample.nonEmpty, "cannot build centroids over an empty table")
    var centroids = sample.take(math.min(nCentroids, sample.length))
    for (_ <- 1 to iters) {
      val buckets = sample.groupBy { v =>
        centroids.indices.maxBy(i => cosLocal(v, centroids(i)))
      }
      centroids = centroids.indices.map { i =>
        buckets.get(i) match {
          case Some(vs) =>
            val mean = new Array[Double](vs(0).length)
            vs.foreach(v => { var j = 0; while (j < v.length) { mean(j) += v(j); j += 1 } })
            var j = 0
            while (j < mean.length) { mean(j) /= vs.length; j += 1 }
            mean
          case None => centroids(i) // empty cluster keeps its centroid
        }
      }.toArray
    }
    centroids
  }

  /** The centroid matrix as ONE nested array literal + the per-row
    * cosine list via `transform` — O(nCentroids × dim) expression
    * nodes total. The previous argmax (a greatest + when-chain where
    * every branch re-embedded every cosine) duplicated each centroid
    * expression ~nCentroids times: O(nCentroids² × dim) nodes, a
    * 70 MB task binary and an executor OOM at 64 centroids — a hard
    * ceiling on cell count that a 100 TB index (thousands of cells)
    * cannot live with. */
  private def centroidSims(centroids: Array[Array[Double]], v: Column): Column =
    transform(
      array(centroids.map(c => array(c.map(x => lit(x)): _*)): _*),
      c => Similarity.cosine(v, c))

  /** Nearest-cell assignment as column algebra (argmax over centroid
    * cosines) — distributes and codegens; no UDF on the build path.
    * Ties resolve to the smallest index (array_position finds the
    * first match), matching the previous fold's semantics. */
  def nearestCell(centroids: Array[Array[Double]], v: Column): Column = {
    val sims = centroidSims(centroids, v)
    // -1 sentinel for a row with no computable similarity (null
    // embedding / null elements) — the old fold's seed value, kept so
    // such rows land in cell=-1 on disk, never the null partition
    coalesce((array_position(sims, array_max(sims)) - 1).cast("int"), lit(-1))
  }

  /** Cosine of a vector to its assigned (nearest) centroid — the
    * per-row "how well does the clustering fit this vector" signal the
    * drift accounting aggregates. */
  def assignCos(centroids: Array[Array[Double]], v: Column): Column =
    array_max(centroidSims(centroids, v))

  // ── drift accounting ───────────────────────────────────────────────────
  // `append` never re-clusters, so probe RECALL erodes as the corpus
  // drifts from the build-time centroids: a query near a new mode
  // probes cells whose centroids don't face it. The index therefore
  // keeps a sidecar ledger of assignment fit — rows and
  // sum-of-assigned-cosines at build, and the same accumulated over
  // every appended batch (one cheap aggregate over data each op scans
  // anyway; no corpus rescan at read time). [[driftStats]] folds the
  // ledger into the two erosion signals, and [[appendAndMaintain]]
  // auto-rebuilds past the threshold.

  final case class AnnDriftStats(buildRows: Long, buildMeanCos: Double,
      appendedRows: Long, appendMeanCos: Double,
      appendComps: Long = 0L, appendClamped: Long = 0L,
      deletedRows: Long = 0L) {
    /** Appended volume relative to the clustered base (1.0 = the corpus
      * doubled since clustering). */
    def growth: Double =
      if (buildRows == 0) Double.PositiveInfinity
      else appendedRows.toDouble / buildRows
    /** How much worse appended vectors fit their assigned cells than
      * the build-time corpus fit its own (positive = drifting away). */
    def cosErosion: Double =
      if (appendedRows == 0) 0.0 else buildMeanCos - appendMeanCos
    /** Fraction of appended vector COMPONENTS that fell outside the
      * build-time int8 grid (clamped at ±127, or a nonzero value in a
      * dimension the build saw as all-zero). Distinct failure mode
      * from cosErosion: a magnitude shift clamps heavily while cosine
      * fit — scale-invariant — stays perfect, so quantized-sim
      * fidelity erodes with NO centroid-fit signal. */
    def gridErosion: Double =
      if (appendComps == 0) 0.0 else appendClamped.toDouble / appendComps
    /** Fraction of the stored rows tombstoned by [[AnnIndex.delete]]:
      * every probe pays a (broadcast) anti-join against the deleted
      * set, and the dead rows still occupy probed cells — past the
      * threshold a rebuild is cheaper than carrying them. */
    def deletedFraction: Double =
      if (buildRows + appendedRows == 0) 0.0
      else deletedRows.toDouble / (buildRows + appendedRows)
    /** Rebuild when the un-clustered volume rivals the clustered base,
      * when appended vectors visibly stopped fitting the cells, when
      * the int8 grid is clamping enough appended components to erode
      * quantized-similarity fidelity, or when tombstoned rows are a
      * material fraction of the index. */
    def needsRebuild(maxGrowth: Double = 1.0,
        maxCosErosion: Double = 0.05,
        maxGridErosion: Double = 0.05,
        maxDeletedFraction: Double = 0.25): Boolean =
      (appendedRows > 0 && (growth >= maxGrowth ||
        cosErosion >= maxCosErosion || gridErosion >= maxGridErosion)) ||
        deletedFraction >= maxDeletedFraction
  }

  private def writeDrift(path: String, buildRows: Long, buildCosSum: Double,
      appendRows: Long, appendCosSum: Double,
      appendComps: Long = 0L, appendClamped: Long = 0L,
      deletedRows: Long = 0L): Unit =
    SidecarFs.writeString(driftFile(path),
      s"build_rows=$buildRows\nbuild_cos_sum=$buildCosSum\n" +
        s"append_rows=$appendRows\nappend_cos_sum=$appendCosSum\n" +
        s"append_comps=$appendComps\nappend_clamped=$appendClamped\n" +
        s"deleted_rows=$deletedRows")

  private def readDrift(path: String)
      : (Long, Double, Long, Double, Long, Long, Long) = {
    val kv = SidecarFs.readString(driftFile(path)).split('\n')
      .map(_.split('=')).collect { case Array(k, v) => k -> v.trim }.toMap
    (kv("build_rows").toLong, kv("build_cos_sum").toDouble,
      kv("append_rows").toLong, kv("append_cos_sum").toDouble,
      // pre-round-9 ledgers lack the grid counters — read as zero
      kv.getOrElse("append_comps", "0").toLong,
      kv.getOrElse("append_clamped", "0").toLong,
      // pre-round-12 ledgers lack the deletion counter
      kv.getOrElse("deleted_rows", "0").toLong)
  }

  /** The index's drift ledger, folded — a sidecar read, no data scan.
    * A legacy (pre-v4) index reports zero drift; rebuild it to start
    * the accounting. */
  def driftStats(path: String): AnnDriftStats = {
    if (!SidecarFs.exists(driftFile(path)))
      return AnnDriftStats(0L, 0.0, 0L, 0.0)
    val (br, bcs, ar, acs, ac, acl, del) = readDrift(path)
    AnnDriftStats(br, if (br == 0) 0.0 else bcs / br,
      ar, if (ar == 0) 0.0 else acs / ar, ac, acl, del)
  }

  // ── build ──────────────────────────────────────────────────────────────

  /** One pass over the corpus: signature + cell per vector, written as a
    * cell-partitioned parquet side table; centroids in a sidecar file. */
  def build(embeddings: DataFrame, path: String, dim: Int,
      nPlanes: Int = 16, nCentroids: Int = 16,
      vecCol: String = "embedding", idCol: String = "vec_id"): Unit =
    graft.connector.KvMaintenance.withLease(maintScope(path)) {
      buildImpl(embeddings, path, dim, nPlanes, nCentroids, vecCol, idCol)
    }

  /** [[build]] without the maintenance lease — for scratch directories
    * a swap-based rewrite assembles privately (rebuildInPlace), where
    * the OUTER operation already holds the live index's lease. */
  private def buildImpl(embeddings: DataFrame, path: String, dim: Int,
      nPlanes: Int, nCentroids: Int,
      vecCol: String, idCol: String): Unit = {
    val cents = sampleCentroids(embeddings, nCentroids,
      vecCol = vecCol, idCol = idCol)
    // int8 quantized form alongside the float vectors (1 byte/dim +
    // exact norm): a quantized probe projects ONLY (id, qvec, vnorm) —
    // parquet column pruning skips the float column, so the probe reads
    // ~4× fewer vector bytes per cell. Scales persist with the index
    // (appends must quantize on the SAME grid or sims are garbage).
    val scales = Similarity.quantizationScales(embeddings, dim, vecCol)
    // build-time assignment fit rides the write pass as observed
    // metrics (round 15, guide §1.2 "don't compute things twice"): the
    // old shape re-READ the whole just-written index and re-ran the
    // interpreted assignCos over it in a second job just to seed the
    // drift ledger — same rows, same expression, one job instead of two
    val fit = org.apache.spark.sql.Observation("annBuildFit")
    embeddings.select(col(idCol), col(vecCol),
        Similarity.hyperplaneSignature(col(vecCol), dim, nPlanes).as("sig"),
        nearestCell(cents, col(vecCol)).as("cell"),
        Similarity.quantizeExpr(scales, col(vecCol)).as("qvec"),
        Similarity.norm(col(vecCol)).as("vnorm"))
      .observe(fit, count(lit(1)).as("n"),
        coalesce(sum(assignCos(cents, col(vecCol))), lit(0.0)).as("s"))
      // cluster by cell before the partitioned write: one file per cell
      // directory instead of (#tasks × #cells) shards — probes then open
      // nProbe files, not hundreds
      .repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(path)
    SidecarFs.writeString(centroidFile(path),
      cents.map(_.mkString(",")).mkString("\n"))
    // the signature scheme is part of the index: append/probe must use
    // the SAME plane count or Hamming filters compare garbage
    SidecarFs.writeString(paramsFile(path), s"nPlanes=$nPlanes\ndim=$dim")
    SidecarFs.writeString(scalesFile(path), scales.mkString(","))
    writeDrift(path, fit.get("n").asInstanceOf[Long],
      fit.get("s").asInstanceOf[Double], 0L, 0.0)
  }

  /** (dim, nPlanes) persisted at build. */
  def loadParams(path: String): (Int, Int) = {
    val kv = SidecarFs.readString(paramsFile(path)).split('\n')
      .map(_.split('=')).collect { case Array(k, v) => k -> v.trim.toInt }
      .toMap
    (kv("dim"), kv("nPlanes"))
  }

  /** Append new vectors to an EXISTING index without re-clustering —
    * the maintenance path for a growing corpus: signatures compute
    * exactly as at build, cells assign against the PERSISTED centroids
    * (cells only gain members, so probe semantics are unchanged), and
    * the new rows land as additional parquet files inside their cell
    * partitions. Probes stay EXACT over whichever cells they read at
    * any staleness — centroid drift can only erode which cells a query
    * probes (recall), never the ranking of what it reads; rebuild when
    * the corpus has grown far past the clustering. */
  def append(newVectors: DataFrame, path: String,
      vecCol: String = "embedding", idCol: String = "vec_id"): Unit =
    graft.connector.KvMaintenance.withLease(maintScope(path)) {
    val cents = loadCentroids(path)
    // dim/nPlanes/scales come from the index itself — caller-supplied
    // values could silently write signatures from a DIFFERENT
    // hyperplane set (Hamming garbage) or quantize on a different grid
    // (sim garbage). Appended values beyond the build-time grid clamp
    // at ±127 — a fidelity loss the drift ledger's cosErosion surfaces
    // and rebuildInPlace repairs with fresh scales.
    val (dim, nPlanes) = loadParams(path)
    val scales = loadScales(path)
    // The batch's assignment fit AND its int8 grid fit ride the append
    // write as observed metrics (round 15): the old shape re-aggregated
    // the batch twice in separate jobs AFTER the write — same rows,
    // same expressions, one job instead of three. grid-fit counts the
    // components the persisted scales CLAMP (|round(v/s)| > 127, or
    // nonzero in an all-zero-at-build dim) — the int8-fidelity signal
    // cosine fit cannot see.
    val sArr = array(scales.map(lit): _*)
    val clampedPerRow = aggregate(
      zip_with(col(vecCol), sArr, (x, s) =>
        when(s === 0.0, when(x =!= 0.0f, 1L).otherwise(0L))
          .otherwise(when(abs(round(x.cast("double") / s)) > 127.0, 1L)
            .otherwise(0L))),
      lit(0L), (acc, v) => acc + v)
    val fit = org.apache.spark.sql.Observation("annAppendFit")
    newVectors.select(col(idCol), col(vecCol),
        Similarity.hyperplaneSignature(col(vecCol), dim, nPlanes).as("sig"),
        nearestCell(cents, col(vecCol)).as("cell"),
        Similarity.quantizeExpr(scales, col(vecCol)).as("qvec"),
        Similarity.norm(col(vecCol)).as("vnorm"))
      .observe(fit, count(lit(1)).as("n"),
        coalesce(sum(assignCos(cents, col(vecCol))), lit(0.0)).as("s"),
        coalesce(sum(size(col(vecCol)).cast("long")), lit(0L)).as("comps"),
        coalesce(sum(clampedPerRow), lit(0L)).as("clamped"))
      .repartition(col("cell"))
      .write.mode("append").partitionBy("cell").parquet(path)
    // fold this batch's fit into the drift ledger (metrics from the
    // write pass only — never a corpus rescan). Appends are maintenance
    // ops: like the parquet append itself, the ledger update assumes
    // one maintainer at a time (serialize via KvMaintenance.acquire
    // when that isn't structural).
    // a re-appended id must come back: fold the batch's ids OUT of the
    // tombstone list (the new row would otherwise stay hidden forever)
    val unTombstoned = removeFromDeleted(newVectors.sparkSession, path,
      newVectors.select(col(idCol)).distinct(), idCol)
    if (SidecarFs.exists(driftFile(path))) {
      val (br, bcs, ar, acs, ac, acl, del) = readDrift(path)
      writeDrift(path, br, bcs,
        ar + fit.get("n").asInstanceOf[Long],
        acs + fit.get("s").asInstanceOf[Double],
        ac + fit.get("comps").asInstanceOf[Long],
        acl + fit.get("clamped").asInstanceOf[Long],
        math.max(0L, del - unTombstoned))
    }
    }

  /** Append + drift-triggered re-cluster: the growing-corpus
    * maintenance loop in one call. Appends the batch, reads the drift
    * ledger, and when the index has grown past `maxGrowth`× its
    * clustered base (or appended vectors stopped fitting the cells by
    * `maxCosErosion`), REBUILDS in place from the index's own stored
    * vectors — fresh centroids over the full current corpus, so probe
    * recall recovers. Returns true when a rebuild ran. */
  def appendAndMaintain(spark: SparkSession, newVectors: DataFrame,
      path: String, maxGrowth: Double = 1.0, maxCosErosion: Double = 0.05,
      maxGridErosion: Double = 0.05,
      vecCol: String = "embedding", idCol: String = "vec_id"): Boolean =
    graft.connector.KvMaintenance.withLease(maintScope(path)) {
    append(newVectors, path, vecCol, idCol)
    if (driftStats(path)
        .needsRebuild(maxGrowth, maxCosErosion, maxGridErosion)) {
      rebuildInPlace(spark, path, vecCol, idCol)
      true
    } else false
    }

  /** Streaming vector ingest with DURABLE index state — the ANN
    * counterpart of [[graft.pipeline.Dedup.streamingIngestDedup]]. Per
    * microbatch: (1) drop ids the index already stores — one
    * column-pruned id scan + anti-join. This is what makes replays
    * idempotent: a crash between the append and the checkpoint commit
    * re-runs the batch, and a raw [[append]] of an existing id would
    * DUPLICATE it (that is append's documented contract; the minhash
    * ingest gets idempotence from its id-unique index instead); (2)
    * append the remainder through the real [[append]] path — frozen
    * centroids, frozen int8 grid, drift-ledger update; (3) let
    * [[appendAndMaintain]]'s drift thresholds trigger an in-place
    * re-cluster when the stream outgrows the bootstrap clustering.
    *
    * A NEW index dir bootstraps from the FIRST non-empty batch:
    * centroids and quantization scales are sampled from it — the only
    * population the clustering has seen — and the drift ledger then
    * measures exactly how far later batches stray, so `maxGrowth = 1`
    * re-clusters once the streamed volume rivals the bootstrap. A dir
    * holding index data without its params sidecar (crashed build) is
    * refused loudly — silently rebuilding there would wipe the
    * ingested horizon. An empty first batch is skipped (no population
    * to cluster); the first non-empty one bootstraps.
    *
    * `onBatch(batchId, driftStats, rebuilt)` observes every committed
    * batch — wire it to a metrics sink to watch erosion between
    * rebuilds; default no-op. */
  def streamingIngestAnn(vectors: DataFrame, path: String,
      nPlanes: Int = 16, nCentroids: Int = 16,
      maxGrowth: Double = 1.0, maxCosErosion: Double = 0.05,
      maxGridErosion: Double = 0.05,
      vecCol: String = "embedding", idCol: String = "vec_id",
      onBatch: (Long, AnnDriftStats, Boolean) => Unit = (_, _, _) => ())
      : org.apache.spark.sql.streaming.DataStreamWriter[
        org.apache.spark.sql.Row] =
    vectors.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          batchId: Long) =>
        // Duplicate ids WITHIN a microbatch would slip past the
        // stored-ids anti-join and land twice — dedup the batch first,
        // matching streamingIngestDedup's contract (Dedup.scala).
        val b = batch.toDF().dropDuplicates(idCol)
        val spark = b.sparkSession
        if (!SidecarFs.exists(paramsFile(path))) {
          require(!SidecarFs.exists(SidecarFs.child(path, "_SUCCESS")),
            s"index at $path has data but no params sidecar (crashed " +
              "build?) — recover it with AnnIndex.build before " +
              "streaming into it")
          val first = b.persist()
          try {
            if (!first.isEmpty) {
              val dim = first.select(vecCol).head().getSeq[Any](0).length
              build(first, path, dim, nPlanes, nCentroids, vecCol, idCol)
              onBatch(batchId, driftStats(path), false)
            }
          } finally { first.unpersist(); () }
        } else {
          val fresh = b.join(
            spark.read.parquet(path).select(col(idCol)),
            Seq(idCol), "left_anti")
          val rebuilt = appendAndMaintain(spark, fresh, path,
            maxGrowth, maxCosErosion, maxGridErosion, vecCol, idCol)
          onBatch(batchId, driftStats(path), rebuilt)
        }
    }

  /** Py4j/Java-friendly arity for [[streamingIngestAnn]] (the py4j
    * bridge can supply neither Scala default args nor the `onBatch`
    * function value): default no-op observer, checkpointed at
    * `checkpoint`, started. Returns the live query. */
  def streamingIngestAnnStart(vectors: DataFrame, path: String,
      checkpoint: String, nPlanes: Int, nCentroids: Int,
      maxGrowth: Double, maxCosErosion: Double, maxGridErosion: Double,
      vecCol: String, idCol: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    streamingIngestAnn(vectors, path, nPlanes, nCentroids, maxGrowth,
      maxCosErosion, maxGridErosion, vecCol, idCol)
      .option("checkpointLocation", checkpoint).start()

  // ── deletion ───────────────────────────────────────────────────────────

  /** Tombstone sidecar: deleted ids live as parquet under `_deleted`
    * (underscore-hidden, so the index's own parquet read never lists
    * it). Probes anti-join against it (broadcast — the set is bounded
    * by `maxDeletedFraction` before a rebuild folds it away). */
  private def deletedDir(path: String) = SidecarFs.child(path, "_deleted")
  private def deletedNewDir(path: String) = SidecarFs.child(path, "_deleted__new")
  private def deletedOldDir(path: String) = SidecarFs.child(path, "_deleted__old")

  /** Crash recovery for [[removeFromDeleted]]'s directory swap. The
    * rewrite commits in four steps — (1) write the new list to
    * `_deleted__new` (parquet's `_SUCCESS` is the completion marker),
    * (2) move `_deleted` → `_deleted__old`, (3) move `__new` →
    * `_deleted`, (4) drop `__old` — and a crash between (2) and (3)
    * used to leave NO live tombstone dir, silently resurfacing every
    * tombstoned vector in every probe. Every read now funnels through
    * [[hasDeleted]], which rolls the swap forward (complete `__new`)
    * or back (incomplete `__new` → the old list stays authoritative)
    * before answering. Single-maintainer, like all index maintenance. */
  /** Per-index lock: recovery (which every READ path runs) and the
    * maintenance rewrite-and-swap serialize within the JVM, so a probe
    * racing an append's un-tombstone can never half-apply the swap —
    * or purge the in-flight `__new` — under the maintainer's feet.
    * Cross-process, the single-maintainer contract covers writers; a
    * reader in another process racing the swap is additionally
    * tolerated by [[moveQuiet]] plus a bounded re-check. Keys
    * normalize to the absolute path (two spellings of one index must
    * share the lock) and values are weak, so locks for abandoned index
    * paths are collectable instead of accumulating for the JVM's
    * lifetime. */
  private val pathLocks = com.google.common.cache.CacheBuilder.newBuilder()
    .weakValues().build[String, Object]()
  private def lockFor(path: String): Object = {
    val key = SidecarFs.qualified(path)
    pathLocks.get(key, () => new Object)
  }

  /** Stable SIBLING directory housing this index's cross-process
    * maintenance lease (KvMaintenance.withLease): compaction and
    * rebuild REPLACE the index directory wholesale, so a lease inside
    * it would vanish mid-swap and hand the index to a second maintainer
    * at the worst possible moment. The scope dir survives every swap.
    * All mutators (build/append/appendAndMaintain/delete/rebuildInPlace/
    * compactAnnIndex) serialize on it; probes stay lock-free. */
  private def maintScope(path: String): String = path + "__maint"

  private def recoverDeleted(path: String): Unit = lockFor(path).synchronized {
    val live = deletedDir(path)
    val nw = deletedNewDir(path)
    val old = deletedOldDir(path)
    def complete(d: String): Boolean =
      SidecarFs.exists(SidecarFs.child(d, "_SUCCESS"))
    if (SidecarFs.isDirectory(live)) {
      // crash after (3): finish step (4)
      if (SidecarFs.isDirectory(old)) SidecarFs.deleteRecursively(old)
      if (SidecarFs.isDirectory(nw)) {
        // crash between (1) and (2): the rewrite is complete but the
        // swap never began — finish it (it encodes an un-tombstone an
        // append already relies on); an incomplete __new never happened
        if (complete(nw)) {
          if (SidecarFs.moveQuiet(live, old)) {
            if (SidecarFs.moveQuiet(nw, live)) SidecarFs.deleteRecursively(old)
            else SidecarFs.moveQuiet(old, live): Unit // lost a race — restore
          }
        } else SidecarFs.deleteRecursively(nw)
      }
    } else {
      if (SidecarFs.isDirectory(old)) {
        // crash between (2) and (3): roll forward when __new committed,
        // back to the old list otherwise
        if (SidecarFs.isDirectory(nw) && complete(nw)) {
          if (SidecarFs.moveQuiet(nw, live)) SidecarFs.deleteRecursively(old)
        } else {
          SidecarFs.moveQuiet(old, live)
          if (SidecarFs.isDirectory(nw)) SidecarFs.deleteRecursively(nw)
        }
      } else if (SidecarFs.isDirectory(nw)) {
        // unreachable under the step order (a __new is only written
        // against an existing live dir); drop the orphan defensively
        SidecarFs.deleteRecursively(nw)
      }
    }
  }

  private[pipeline] def hasDeleted(path: String): Boolean = {
    recoverDeleted(path)
    SidecarFs.isDirectory(deletedDir(path))
  }

  private def deletedIds(spark: SparkSession, path: String,
      idCol: String): DataFrame =
    spark.read.parquet(deletedDir(path))
      .select(col("id").as(idCol)).distinct()

  /** Remove vectors from the index — the curation-pipeline counterpart
    * of document deletion (a dropped/decontaminated doc's embedding
    * must stop surfacing as a neighbor). Parquet is immutable, so the
    * ids land in the `_deleted` tombstone sidecar; every probe
    * anti-joins it (broadcast), the drift ledger counts the dead rows,
    * and [[rebuildInPlace]] (or [[appendAndMaintain]] past
    * `maxDeletedFraction`) folds them away physically. Deleting an
    * absent id is a no-op; a later [[append]] of the same id
    * un-tombstones it (the tombstone would otherwise hide the new
    * row) — note that un-tombstoning resurfaces EVERY stored copy of
    * that id, so the supported path for a CHANGED embedding is
    * rebuild, exactly as for plain duplicate appends.
    * Serializes with the other mutators via the per-index maintenance
    * lease (cross-thread and cross-process). */
  def delete(spark: SparkSession, path: String, ids: DataFrame,
      idCol: String = "vec_id"): Unit =
    graft.connector.KvMaintenance.withLease(maintScope(path)) {
    val del = ids.select(col(idCol).as("id")).distinct()
    // sidecar and ledger both take only ids that are genuinely in the
    // index and not already tombstoned: deletedFraction must reflect
    // dead ROWS, and the sidecar must stay bounded by them — appending
    // the raw request would grow it without bound under idempotent
    // replays and absent-id deletes while deletedFraction stayed 0,
    // breaking the "broadcast set is bounded before a rebuild" contract
    val existing = spark.read.parquet(path).select(col(idCol).as("id"))
      .join(broadcast(del), Seq("id"), "left_semi")
    val already =
      if (hasDeleted(path))
        spark.read.parquet(deletedDir(path)).select(col("id"))
      else existing.limit(0)
    val newDeadIds = existing.join(broadcast(already), Seq("id"), "left_anti")
      .distinct().persist()
    try {
      // materialized by the count, so the append below never re-reads
      // the sidecar it is writing to
      val newDead = newDeadIds.count()
      if (newDead > 0) {
        newDeadIds.write.mode("append").parquet(deletedDir(path))
        if (SidecarFs.exists(driftFile(path))) {
          val (br, bcs, ar, acs, ac, acl, d0) = readDrift(path)
          writeDrift(path, br, bcs, ar, acs, ac, acl, d0 + newDead)
        }
      }
    } finally newDeadIds.unpersist()
    }

  /** Scala-collection convenience over [[delete]]. */
  def deleteIds(spark: SparkSession, path: String, ids: Seq[Long],
      idCol: String = "vec_id"): Unit = {
    import spark.implicits._
    delete(spark, path, ids.toDF(idCol), idCol)
  }

  /** Java/py4j-friendly entry (the Python shim's `ann_delete_ids`). */
  def deleteIdsJ(spark: SparkSession, path: String,
      ids: java.util.List[java.lang.Number]): Unit = {
    import scala.jdk.CollectionConverters._
    deleteIds(spark, path, ids.asScala.toSeq.map(_.longValue()))
  }

  /** Rewrite the tombstone list minus `ids` (append's un-tombstone
    * path). Returns how many tombstones were removed. */
  private def removeFromDeleted(spark: SparkSession, path: String,
      ids: DataFrame, idCol: String): Long = {
    if (!hasDeleted(path)) return 0L
    val cur = spark.read.parquet(deletedDir(path))
      .select(col("id")).distinct().persist()
    try {
      val keep = cur.join(
        broadcast(ids.select(col(idCol).as("id"))), Seq("id"), "left_anti")
        .persist()
      try {
        val removed = cur.count() - keep.count()
        if (removed == 0) return 0L
        // rewrite + four-step swap UNDER the per-index lock — the
        // `__new` write itself must be covered, or an in-JVM probe's
        // recovery could purge the incomplete directory mid-write.
        // Crash at any point is healed by recoverDeleted (parquet's
        // _SUCCESS marks __new committed); a cross-process reader's
        // recovery losing/winning a move is tolerated, with the final
        // state re-checked for a bounded window before failing.
        lockFor(path).synchronized {
          keep.write.mode("overwrite").parquet(deletedNewDir(path))
          // __new already gone = a racing reader's recovery completed
          // the swap for us; otherwise perform it, restoring the old
          // list if the forward move loses a cross-process race
          if (SidecarFs.isDirectory(deletedNewDir(path))) {
            if (SidecarFs.moveQuiet(deletedDir(path), deletedOldDir(path)) &&
              !SidecarFs.moveQuiet(deletedNewDir(path), deletedDir(path)))
              SidecarFs.moveQuiet(deletedOldDir(path), deletedDir(path)): Unit
          }
          if (SidecarFs.isDirectory(deletedOldDir(path)) &&
            SidecarFs.isDirectory(deletedDir(path)))
            SidecarFs.deleteRecursively(deletedOldDir(path))
          // a cross-process reader may be mid-swap (live moved away,
          // its forward move pending): re-run the recovery state
          // machine for a bounded window before declaring a real loss
          var tries = 0
          while (!SidecarFs.isDirectory(deletedDir(path)) && tries < 40) {
            recoverDeleted(path)
            if (!SidecarFs.isDirectory(deletedDir(path))) {
              Thread.sleep(50)
              tries += 1
            }
          }
          require(SidecarFs.isDirectory(deletedDir(path)),
            s"tombstone swap left no live _deleted dir under $path")
        }
        removed
      } finally keep.unpersist()
    } finally cur.unpersist()
  }

  /** Drop tombstoned rows from a probe's candidate set. The deleted
    * set is broadcast: it is bounded by the rebuild threshold, and the
    * anti-join must never shuffle the probed cells. */
  private def withoutDeleted(spark: SparkSession, path: String,
      df: DataFrame, idCol: String): DataFrame =
    if (!hasDeleted(path)) df
    else df.join(broadcast(deletedIds(spark, path, idCol)),
      Seq(idCol), "left_anti")

  /** Re-cluster an existing index from its own stored vectors: build a
    * fresh index (new sampled-k-means centroids over the FULL current
    * corpus, same dim/nPlanes/cell-count) beside it, then swap
    * directories. The index parquet stores the full vectors, so no
    * source table is needed. Tombstoned rows are excluded and the
    * tombstone list dies with the old directory. */
  def rebuildInPlace(spark: SparkSession, path: String,
      vecCol: String = "embedding", idCol: String = "vec_id"): Unit =
    graft.connector.KvMaintenance.withLease(maintScope(path)) {
    val (dim, nPlanes) = loadParams(path)
    val nCentroids = loadCentroids(path).length
    val all = withoutDeleted(spark, path,
      spark.read.parquet(path).select(col(idCol), col(vecCol)), idCol)
    val tmp = path + "__rebuild"
    // scratch build runs under THIS index's lease; no lease on tmp
    buildImpl(all, tmp, dim, nPlanes, nCentroids, vecCol, idCol)
    // `build` is an action — `all` is fully consumed before the swap.
    // A crash between the two moves leaves no live index dir but both
    // __old and the complete rebuild beside it — loud (probes fail on
    // the missing dir), never silently stale.
    val old = path + "__old"
    SidecarFs.move(path, old)
    SidecarFs.move(tmp, path)
    SidecarFs.deleteRecursively(old)
    }

  /** Number of parquet data files in the index across all `cell=`
    * directories (underscore/dot entries — sidecars, markers, the
    * tombstone dir — skipped): the quantity probe latency follows. */
  private[pipeline] def dataFileCount(path: String): Int = {
    val conf = SidecarFs.hadoopConf
    def count(p: org.apache.hadoop.fs.Path): Int = {
      val fs = p.getFileSystem(conf)
      fs.listStatus(p).iterator.map { st =>
        val n = st.getPath.getName
        if (n.startsWith("_") || n.startsWith(".")) 0
        else if (st.isDirectory) count(st.getPath)
        else 1
      }.sum
    }
    count(new org.apache.hadoop.fs.Path(path))
  }

  /** Small-file compaction — the append-path counterpart of
    * [[graft.pipeline.Dedup.compactMinhashIndex]]. Every [[append]]
    * lands one file set per batch in each touched `cell=` directory, so
    * a long-running ingest accumulates files and probe latency follows
    * the file count (an IVF probe opens every file of each probed
    * cell). This maintenance call rewrites the data into
    * ≈`targetRowsPerFile`-row runs, range-clustered on (cell, id) — each
    * cell directory collapses to its minimal file count with contiguous
    * id locality — WITHOUT re-clustering: centroids, scales, per-row
    * signatures/cells/quantized vectors, the drift ledger, and the
    * tombstone sidecar all carry over verbatim. (Folding tombstones
    * away physically stays [[rebuildInPlace]]'s job — the ledger's row
    * counts keep meaning "stored rows".) Commit is the same directory
    * swap [[rebuildInPlace]] uses: write scratch `__compact` (data +
    * copied sidecars) → move live to `__old` → move scratch in → drop
    * `__old`; a crash between the moves leaves no live dir — loud,
    * never silently stale. Mutators serialize on the per-index
    * maintenance lease (cross-thread and cross-process): an append or
    * delete racing this rewrite lands entirely before the snapshot
    * read or entirely after the swap, never in the lost window between
    * them. The tombstone sidecar is additionally (re-)copied UNDER the
    * in-JVM swap lock. Returns (filesBefore, filesAfter). */
  def compactAnnIndex(spark: SparkSession, path: String,
      targetRowsPerFile: Long = 1L << 22,
      idCol: String = "vec_id"): (Int, Int) =
    graft.connector.KvMaintenance.withLease(maintScope(path)) {
    require(targetRowsPerFile > 0,
      s"targetRowsPerFile must be positive, got $targetRowsPerFile")
    loadParams(path) // loud on a non-index dir before any write
    val before = dataFileCount(path)
    val data = spark.read.parquet(path)
    val rows = data.count()
    val nFiles = math.max(1L,
      (rows + targetRowsPerFile - 1) / targetRowsPerFile).toInt
    val tmp = path + "__compact"
    data.repartitionByRange(nFiles, col("cell"), col(idCol))
      .sortWithinPartitions(col("cell"), col(idCol))
      .write.mode("overwrite").partitionBy("cell").parquet(tmp)
    Seq(centroidFile(path) -> centroidFile(tmp),
        paramsFile(path) -> paramsFile(tmp),
        scalesFile(path) -> scalesFile(tmp),
        driftFile(path) -> driftFile(tmp)).foreach { case (src, dst) =>
      if (SidecarFs.exists(src))
        SidecarFs.writeString(dst, SidecarFs.readString(src))
    }
    // Tombstone copy OUTSIDE the in-JVM monitor: delete() takes the
    // same cross-process maintenance lease this whole method holds, so
    // no delete can land anywhere between the snapshot and the swap —
    // and holding the monitor through a Spark read+write job would
    // stall every concurrent probe (they take it in recoverDeleted)
    // for the duration of the rewrite instead of just two renames.
    if (hasDeleted(path))
      spark.read.parquet(deletedDir(path))
        .write.mode("overwrite").parquet(deletedDir(tmp))
    lockFor(path).synchronized {
      val old = path + "__old"
      SidecarFs.move(path, old)
      SidecarFs.move(tmp, path)
      SidecarFs.deleteRecursively(old)
    }
    (before, dataFileCount(path))
    }

  def loadCentroids(path: String): Array[Array[Double]] =
    SidecarFs.readString(centroidFile(path)).split("\n")
      .map(_.split(",").map(_.toDouble))

  def loadScales(path: String): Array[Double] =
    SidecarFs.readString(scalesFile(path)).split(",").map(_.toDouble)

  // ── probes ─────────────────────────────────────────────────────────────

  /** Exact cosine to the query using the index's STORED vector norm —
    * one dot per scanned row instead of cosine's three (the query norm
    * folds driver-side, left-to-right in double exactly like the dot
    * kernel, so the doubles are bit-identical to the recomputation the
    * hash gates pinned). */
  private def storedNormSim(query: Seq[Float], vecCol: String): Column = {
    var s = 0.0
    query.foreach(v => s += v.toDouble * v.toDouble)
    val qn = math.sqrt(s)
    val qArr = array(query.map(v => lit(v)): _*)
    when(col("vnorm") === 0.0 || lit(qn) === 0.0, lit(0.0))
      .otherwise(Similarity.dot(col(vecCol), qArr) / (col("vnorm") * lit(qn)))
  }

  /** LSH top-k against the index: Hamming-filter the PRECOMPUTED
    * signature column (cheap bit ops over two pruned columns), rank only
    * the survivors exactly. */
  def annTopK(spark: SparkSession, path: String, query: Seq[Float], k: Int,
      dim: Int, nPlanes: Int = 16, probe: Int = 2,
      vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    val qArr = array(query.map(v => lit(v)): _*)
    val qSig = Similarity.hyperplaneSignature(qArr, dim, nPlanes)
    withoutDeleted(spark, path, spark.read.parquet(path), idCol)
      .filter(bit_count(col("sig").bitwiseXOR(qSig)) <= probe)
      .select(col(idCol), storedNormSim(query, vecCol).as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
  }

  /** IVF top-k against the index: pick the `nProbe` closest centroids
    * driver-side (constant work), then read ONLY those cell partitions
    * (directory-level pruning) and rank exactly. */
  def ivfTopK(spark: SparkSession, path: String, query: Seq[Float], k: Int,
      nProbe: Int = 4,
      vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    val cents = loadCentroids(path)
    val q = query.map(_.toDouble).toArray
    val probeCells = cents.indices.sortBy(i => -cosLocal(q, cents(i)))
      .take(nProbe)
    withoutDeleted(spark, path, spark.read.parquet(path), idCol)
      .filter(col("cell").isin(probeCells: _*))
      .select(col(idCol), storedNormSim(query, vecCol).as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
  }

  /** Batch k-NN JOIN over the materialized index: every query vector's
    * top-k neighbors by exact cosine, each query probing only its
    * `nProbe` nearest centroid cells — the pair space is CELL-LOCAL
    * (never |Q|×|N|), the join key a short uniform cell id, tombstoned
    * rows excluded like every probe. Per-query cell selection is pure
    * column algebra (sort (−sim, idx) structs, keep nProbe indices —
    * O(C·dim) per query row, the [[nearestCell]] kernel shape), so the
    * query side needs no driver round-trip and scales to any |Q|; the
    * first probed cell is exactly the query's own assignment cell, so
    * an indexed query always finds itself. */
  def knnJoin(spark: SparkSession, path: String, queries: DataFrame,
      k: Int, nProbe: Int = 4, vecCol: String = "embedding",
      idCol: String = "vec_id"): DataFrame = {
    // norms hoisted OUT of the pair space: the index's stored vnorm
    // and a once-per-query __qn replace Similarity.cosine's two
    // per-pair norm recomputations — one dot per pair instead of
    // three, bit-identical doubles (vnorm is the same sqrt(dot(c,c))
    // the build computed; the division/multiplication order matches
    // cosine's), which is what the ann8 hash gate pins.
    //
    // Round 16 NEGATIVE RESULT (tried, measured, reverted — kept here
    // so round 17 doesn't re-walk it): a centroid-residual
    // Cauchy–Schwarz upper-bound prefilter (sim ≤ (dot(q,μ)/|q| +
    // |c−μ|)/|c|, exact re-rank of survivors, provably lossless,
    // property-pinned) made the 20k self-join 2.6× SLOWER. Measured
    // root cause (tools/KnnBoundStats on the bench index): the corpus
    // embeddings are near-isotropic — residual/vnorm median 0.98, so
    // the bound sits a full ~1.0 ABOVE the sim (slack median 1.04) and
    // even a perfect τ = 1.0 threshold keeps 93% of the pair space.
    // No sound geometric bound prunes isotropic high-dim data; the
    // productive levers were the ones below (tools/KnnStageProbe
    // decomposition: window 44%, exact sims 30%, join 25%).
    knnJoinScaffold(spark, path, queries, k, nProbe, vecCol, idCol,
      prepQuery = _.withColumn("__qn", Similarity.norm(col("__qe"))),
      idxCols = Seq(col("__nid").as("neighbor_id"),
        col(vecCol).as("__ce"), col("vnorm"), col("cell")),
      sim = when(col("vnorm") === 0.0 || col("__qn") === 0.0, lit(0.0))
        .otherwise(Similarity.dot(col("__qe"), col("__ce"))
          / (col("vnorm") * col("__qn"))))
  }

  /** Per-row query-vector guard: a ragged query OR a null element would
    * null-poison every centroid sim — probe-cell selection degrades to
    * the index tiebreak and the window still ranks k NULL-sim rows,
    * garbage shaped like results — so both raise loudly per row.
    * Expects the raw vector in `__qe0`. */
  private def checkedQueryVec(dim: Int): Column =
    when(size(col("__qe0")) === dim &&
        !exists(col("__qe0"), x => x.isNull), col("__qe0"))
      .otherwise(raise_error(concat(
        lit("knnJoin: query vector dim "), size(col("__qe0")).cast("string"),
        lit(s" != index dim $dim, or null vector elements")))
        .cast("array<float>"))

  /** The `np` nearest centroid indices for query vector `qe` as pure
    * column algebra — sort (−sim, idx) structs, keep np indices (the
    * [[nearestCell]] kernel shape and tie rule, so the FIRST probed
    * cell is the query's own assignment cell). */
  private def probeCellsOf(cents: Array[Array[Double]], np: Int,
      qe: Column): Column =
    transform(
      slice(array_sort(zip_with(centroidSims(cents, qe),
        sequence(lit(0), lit(cents.length - 1)),
        (s, i) => struct((-s).as("ns"), i.as("idx")))), 1, np),
      st => st.getField("idx"))

  /** The shared shape of the batch joins: per-query probe-cell
    * selection ([[probeCellsOf]]), the loud per-row dimension guard
    * ([[checkedQueryVec]]), the cell equi-join, and the per-query
    * top-k rank. Callers supply only the index projection and the
    * scoring expression. */
  private def knnJoinScaffold(spark: SparkSession, path: String,
      queries: DataFrame, k: Int, nProbe: Int, vecCol: String,
      idCol: String, prepQuery: DataFrame => DataFrame,
      idxCols: Seq[Column], sim: Column): DataFrame = {
    val cents = loadCentroids(path)
    val (dim, _) = loadParams(path)
    val np = math.min(nProbe, cents.length)
    val q = prepQuery(queries
      .select(col(idCol).as("query_id"), col(vecCol).as("__qe0"))
      .withColumn("__qe", checkedQueryVec(dim))
      .drop("__qe0")
      .withColumn("cell", explode(probeCellsOf(cents, np, col("__qe")))))
    val idx = withoutDeleted(spark, path, spark.read.parquet(path), idCol)
      .withColumnRenamed(idCol, "__nid")
      .select(idxCols: _*)
    // Round-16 NEGATIVE RESULT #2 (tried, measured, reverted): a
    // bounded-top-k PARTIAL aggregate in place of this window — heap
    // truncation instead of WindowGroupLimit's map- and reduce-side
    // sorts, bit-identical output, property-pinned — measured a WASH
    // within machine noise across three same-process interleaved A/Bs
    // at 20k vectors (−8% / +3% / +4%, tools/AnnProbe): the window's
    // input is already truncated map-side by Spark 4's WindowGroupLimit
    // inside whole-stage codegen, while ObjectHashAggregate runs
    // outside codegen and pays a typed-aggregator per-row encoder (and
    // its 128-key sort-based fallback re-introduces a map-side sort at
    // real group counts). On ir4's window the same rewrite measured 32%
    // WORSE. No reliable win ⇒ reverted, per the r15 discipline.
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
    idx.join(q, Seq("cell"))
      .select(col("query_id"), col("neighbor_id"), sim.as("sim"))
      .withColumn("rk", row_number().over(win))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("sim"),
        col("rk").cast("int").as("rk"))
  }

  /** [[knnJoin]] over the QUANTIZED vectors: the same cell-local batch
    * join, but each probed cell reads only (id, qvec, vnorm) — parquet
    * column pruning skips the float column, ~4× fewer vector bytes per
    * cell, the difference between an in-page-cache batch serve and a
    * disk-bound one at corpus scale. Per-query dequantization folds
    * into a weight array built from the query's own floats
    * (w_i = q_i · s_i, column algebra over the broadcast scales), so
    * the scan does one int8×double multiply-add per dim. Ranking is
    * within int8 quantization error of [[knnJoin]]'s exact cosines —
    * the same contract the single-query quantized probes pin. */
  def knnJoinQuantized(spark: SparkSession, path: String,
      queries: DataFrame, k: Int, nProbe: Int = 4,
      vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    val sArr = array(loadScales(path).map(lit): _*)
    knnJoinScaffold(spark, path, queries, k, nProbe, vecCol, idCol,
      prepQuery = _.withColumn("__qw",
          zip_with(col("__qe"), sArr, (x, s) => x.cast("double") * s))
        .withColumn("__qn", Similarity.norm(col("__qe")))
        .drop("__qe"),
      idxCols = Seq(col("__nid").as("neighbor_id"), col("qvec"),
        col("vnorm"), col("cell")),
      sim = when(col("vnorm") === 0.0 || col("__qn") === 0.0, lit(0.0))
        .otherwise(Similarity.dot(col("qvec"), col("__qw"))
          / (col("vnorm") * col("__qn"))))
  }

  /** IVF top-k over the QUANTIZED vectors: same cell pruning, but the
    * probe projects only (id, qvec, vnorm) — parquet column pruning
    * skips the float vector column, so each probed cell reads ~4× fewer
    * vector bytes. Ranking is the asymmetric dequantized cosine
    * ([[Similarity.quantizedTopK]]'s arithmetic): within int8
    * quantization error of the exact ranking, which is what the gates
    * pin. */
  def ivfTopKQuantized(spark: SparkSession, path: String,
      query: Seq[Float], k: Int, nProbe: Int = 4,
      idCol: String = "vec_id"): DataFrame = {
    val cents = loadCentroids(path)
    val scales = loadScales(path)
    val q = query.map(_.toDouble).toArray
    val probeCells = cents.indices.sortBy(i => -cosLocal(q, cents(i)))
      .take(nProbe)
    val pruned = withoutDeleted(spark, path, spark.read.parquet(path), idCol)
      .filter(col("cell").isin(probeCells: _*))
      .select(col(idCol), col("qvec"), col("vnorm"))
    Similarity.quantizedTopK(pruned, scales, query, k, idCol)
  }
}
