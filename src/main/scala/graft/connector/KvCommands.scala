package graft.connector

import graft.io.SidecarFs
import graft.store.SegmentFile
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** DDL/DML command surface over graftkv tables — the Spark-native
  * restatement of the reference's parser-level commands
  * (/root/reference src/main/scala/.../execution/hbaseCommands.scala):
  * CREATE (O1) → createTable, DROP (O2) → dropTable, INSERT SELECT (O7)
  * → append, LOAD DATA (O8) → bulkLoadCsv, SHOW/DESCRIBE (O4/O5) →
  * describe. Each is a thin declarative wrapper: the heavy lifting
  * (range shuffle + sort + segment write) is the connector's
  * RequiresDistributionAndOrdering write path.
  */
object KvCommands {

  /** O1: CREATE TABLE ... (+ initial data). The key columns are the
    * composite primary key, in order; `encoding` picks the per-table
    * codec (binary | stringformat, reference DDL `IN stringformat`). */
  def createTable(df: DataFrame, path: String, keys: Seq[String],
      encoding: String = graft.store.RowCodec.Binary,
      genOverride: Option[Long] = None,
      zorder: Seq[graft.codec.ZDim] = Nil,
      maxSegBytes: Option[Long] = None,
      compress: Option[String] = None): Unit = {
    val w = df.write.format("graftkv")
      .option("key", keys.mkString(","))
      .option("encoding", encoding)
      .mode("overwrite")
    genOverride.foreach(g => w.option("gen.override", g.toString))
    if (zorder.nonEmpty) w.option("zorder", graft.codec.ZDim.serialize(zorder))
    maxSegBytes.foreach(b => w.option("segment.maxBytes", b.toString))
    compress.foreach(c => w.option(GraftKvMeta.SegmentCompressProp, c))
    w.save(path)
  }

  /** O7: INSERT INTO t SELECT ... (append new sorted segments). On a
    * z-clustered table the `_z` lead is derived here with the table's
    * persisted dim normalization, so callers append the logical schema
    * and clustering stays an implementation detail. */
  def append(df: DataFrame, path: String): Unit = {
    val df2 = GraftKvMeta.read(path) match {
      case Some(m) if m.zorder.nonEmpty && !df.columns.contains("_z") =>
        df.withColumn("_z", graft.functions.ZValue.forDims(
          m.zorder, m.zorder.map(d => df(d.name))))
      case _ => df
    }
    df2.write.format("graftkv").mode("append").save(path)
  }

  /** O1 variant: CREATE a z-clustered table. The physical composite key
    * is `(_z, dims…)` where `_z` is the dims' Morton interleave
    * (graft.codec.ZOrder) — the bulk load range-shuffles on `_z`, so
    * segments tile the z-curve and a box predicate over the dims prunes
    * to the segments whose z-span intersects the box's quadtree cover.
    * The trailing dims keep physical keys exactly as unique as the
    * logical key, so Put/upsert semantics are unchanged.
    *
    * One cheap extra aggregate over the input fixes each dim's
    * (minCode, shift) normalization for the TABLE'S LIFETIME — codes
    * use the observed value range at full per-dim resolution; later
    * appends outside the range clamp consistently on the write and
    * query sides (clustering degrades, correctness holds). */
  def createZOrderTable(df: DataFrame, path: String, dims: Seq[String],
      encoding: String = graft.store.RowCodec.Binary,
      maxSegBytes: Option[Long] = None,
      compress: Option[String] = None): Unit = {
    require(dims.length >= 2, "z-order clustering wants >= 2 dimensions")
    import org.apache.spark.sql.functions.{max, min}
    import graft.codec.{ZDim, ZOrder}
    val bits = ZOrder.bitsPerDim(dims.length)
    val aggs = dims.flatMap(d => Seq(min(d), max(d)))
    val stats = df.agg(aggs.head, aggs.tail: _*).head()
    val zdims = dims.zipWithIndex.map { case (d, i) =>
      val dt = df.schema(d).dataType
      val (lo, hi) = (stats.get(2 * i), stats.get(2 * i + 1))
      if (lo == null || hi == null) ZDim.legacy(d, bits)
      else {
        val loC = ZOrder.dimCode(dt, graft.pruning.TriEval.normalize(dt, lo))
        val hiC = ZOrder.dimCode(dt, graft.pruning.TriEval.normalize(dt, hi))
        ZDim(d, loC, ZOrder.shiftFor(hiC - loC, bits)) // unsigned diff: hi >= lo
      }
    }
    val withZ = df.withColumn("_z",
      graft.functions.ZValue.forDims(zdims, dims.map(df(_))))
    val w = withZ.write.format("graftkv")
      .option("key", ("_z" +: dims).mkString(","))
      .option("zorder", ZDim.serialize(zdims))
      .option("encoding", encoding)
      .mode("overwrite")
    maxSegBytes.foreach(b => w.option("segment.maxBytes", b.toString))
    compress.foreach(c => w.option(GraftKvMeta.SegmentCompressProp, c))
    w.save(path)
  }

  /** Read back (the relation itself). */
  def table(spark: SparkSession, path: String): DataFrame =
    spark.read.format("graftkv").load(path)

  /** Re-cluster an EXISTING table z-ordered by `dims` (the
    * `OPTIMIZE t ZORDER BY (…)` statement): builds the z-clustered
    * form in a hidden scratch subdirectory (full rewrite through the
    * range-shuffled sorted write — the data never round-trips the
    * driver), moves the new segments in unmanifested (invisible), and
    * commits through the SAME versioned manifest-CAS protocol as
    * compaction. Returns the row count of the rebuilt table.
    *
    * SEMANTICS CHANGE, deliberately loud: the physical key becomes
    * `(_z, dims…)`, so Put-upsert identity follows the dims — exactly
    * what CREATE-time z-clustering declares. Secondary indexes and
    * materialized views key on the old layout and must be dropped
    * first (the call refuses otherwise); snapshot history does not
    * carry across the rewrite (older versions describe the OLD key
    * layout, so they are pruned at the commit — VERSION AS OF across a
    * re-clustering fails with "no snapshot", never a garbage decode).
    *
    * Crash safety (no manual-repair window, unlike the pre-round-9
    * directory swap): the commit point is one manifest CAS, fenced by
    * an intent marker carrying the new segment set + new table meta.
    * The marker goes down BEFORE any replacement segment moves into
    * the table directory, so a crash at ANY later point leaves a
    * marker a reader can repair from — nothing the conversion ever
    * moves in can be stranded invisibly. A crash BEFORE the CAS
    * leaves the old table fully intact (marker + any moved-in
    * unmanifested segments are swept by the next reader once the
    * lease is stealable); a crash AFTER the CAS but before the meta
    * flip is finished by the next reader (GraftKvMeta.read →
    * ZConvert.repair — the flip is idempotent). A concurrent commit
    * (e.g. an append) between the source read and the CAS aborts the
    * conversion instead of silently dropping the concurrent writer's
    * rows. Repair's destructive branch runs only under the STOLEN
    * maintenance lease (never an mtime-age guess), the converter
    * refreshes its lease right before the marker goes down, and it
    * re-verifies marker + segments immediately after winning the CAS
    * (rolling the manifest back if a racing repair swept them) — so a
    * repair and a live converter can never both win. */
  def convertToZOrder(spark: SparkSession, path: String,
      dims: Seq[String]): Long = {
    import graft.store.SegmentFile
    val m = GraftKvMeta.read(path).getOrElse(
      throw new IllegalArgumentException(s"no graftkv table at $path"))
    dims.foreach(d => require(m.schema.fieldNames.contains(d),
      s"no column '$d' to z-order by"))
    require(KvIndex.list(path).isEmpty && KvMatView.list(path).isEmpty,
      "re-clustering changes the key layout: drop secondary indexes and " +
        "materialized views first")
    // one converter at a time: the cross-process maintenance lease
    // serializes concurrent OPTIMIZE ZORDER calls (the second refuses
    // instead of both racing the commit)
    val lease = KvMaintenance.acquire(path).getOrElse(
      throw new IllegalStateException(
        s"another maintenance operation holds the lease on $path"))
    try {
      // a legacy table's reader authority is the directory listing, and
      // the replacement segments move in below BEFORE the commit point —
      // pin the live set into a manifest first (compactMinor's pattern)
      if (SegmentFile.readManifest(path).isEmpty)
        SegmentFile.writeManifest(path,
          SidecarFs.list(path).filter(_.endsWith(".kv")).toSet)
      val oldSet = SegmentFile.readManifest(path).get
      val src = table(spark, path)
      val data = if (src.columns.contains("_z")) src.drop("_z") else src
      // hidden scratch SUBdirectory: invisible to segment listing,
      // swept by dropTable if a crash strands it
      val tmp = SidecarFs.child(path,
        s".zconvert-${java.util.UUID.randomUUID().toString.take(8)}")
      createZOrderTable(data, tmp, dims, m.encoding,
        maxSegBytes = m.props.get(GraftKvMeta.SegmentMaxBytesProp).map(_.toLong),
        compress = m.props.get(GraftKvMeta.SegmentCompressProp))
      // table properties ride through the re-cluster: rewrite the
      // scratch meta with them before it becomes the marker payload
      val sm = GraftKvMeta.read(tmp).get
      if (m.props.nonEmpty)
        GraftKvMeta.write(tmp, sm.schema, sm.keys, sm.encoding, sm.zorder,
          m.props)
      val rows = SegmentFile.listSegments(tmp).map(_.count).sum
      val newFiles = SegmentFile.listSegments(tmp).map(_.file)
      val newMeta = SidecarFs.readString(
        SidecarFs.child(tmp, "_graft_meta.json"))
      ZConvert.checkpoint(1) // built, no marker, nothing moved yet
      // the build above can outlive the lease's staleness window —
      // refresh (and re-verify) the lease BEFORE the marker goes down,
      // so the marker-down window starts with a full lease term and a
      // repairing reader cannot judge this converter dead mid-commit
      if (!KvMaintenance.refresh(lease)) {
        dropTable(tmp)
        throw new IllegalStateException(
          s"maintenance lease on $path was stolen mid-conversion; aborted")
      }
      // intent marker FIRST: from here every file this conversion
      // moves into the table directory is named by a durable marker,
      // so a crash at ANY later point is sweepable by any reader —
      // nothing moved in can be stranded invisibly
      ZConvert.writeMarker(path, newFiles.toSet, newMeta)
      ZConvert.checkpoint(2) // marker down, nothing moved yet
      var moved = 0
      newFiles.foreach { f =>
        SidecarFs.move(SidecarFs.child(tmp, f), SidecarFs.child(path, f))
        SidecarFs.move(SidecarFs.child(tmp, f.stripSuffix(".kv") + ".kvmeta"),
          SidecarFs.child(path, f.stripSuffix(".kv") + ".kvmeta"))
        moved += 1
        if (moved == 1) ZConvert.checkpoint(3) // mid-move, marker down
      }
      dropTable(tmp)
      def dropMoved(): Unit = newFiles.foreach { f =>
        SidecarFs.deleteIfExists(SidecarFs.child(path, f))
        SidecarFs.deleteIfExists(
          SidecarFs.child(path, f.stripSuffix(".kv") + ".kvmeta"))
      }
      // a stolen lease means a successor (converter or repair) may
      // already own the directory — abandon our build, never commit
      if (!KvMaintenance.stillHeld(lease)) {
        dropMoved()
        ZConvert.clearMarker(path)
        throw new IllegalStateException(
          s"maintenance lease on $path was stolen mid-conversion; aborted")
      }
      ZConvert.checkpoint(4) // moved in + marker down, CAS not attempted
      // the single commit point: the manifest CAS. The CAS requires the
      // live set to still be what the rewrite READ; any concurrent
      // commit aborts the conversion (its rows would otherwise vanish
      // from the converted table).
      val swapped = SegmentFile.commitManifest(path) { live =>
        if (live == oldSet) Some(newFiles.toSet) else None
      }
      if (swapped.isEmpty) {
        ZConvert.clearMarker(path)
        dropMoved()
        throw new IllegalStateException(
          s"concurrent commit on $path during z-order conversion; aborted")
      }
      // post-CAS verify: if a repair stole the lease in the window
      // between stillHeld above and the CAS, it may have swept the
      // marker and the replacement segments this manifest now names —
      // roll the manifest back to the old set (old segments are still
      // on disk; nothing is pruned yet) and fail loudly, rather than
      // leave a committed manifest pointing at deleted files
      val survived = SidecarFs.exists(ZConvert.markerPath(path)) &&
        newFiles.forall(f => SidecarFs.exists(SidecarFs.child(path, f)))
      if (!survived) {
        SegmentFile.commitManifest(path) { live =>
          if (live == newFiles.toSet) Some(oldSet) else None
        }
        dropMoved()
        ZConvert.clearMarker(path)
        throw new IllegalStateException(
          s"z-order conversion on $path lost its lease to a repair at " +
            "the commit point; manifest rolled back")
      }
      ZConvert.checkpoint(5) // committed; meta still the old layout
      // post-commit completion — idempotent, re-run by ZConvert.repair
      // from any reader if this process dies here
      ZConvert.writeMetaContent(path, newMeta)
      ZConvert.checkpoint(6) // meta flipped, history not pruned
      SegmentFile.pruneManifestVersions(path, Long.MaxValue)
      ZConvert.checkpoint(7) // pruned, marker still down
      ZConvert.clearMarker(path)
      KvIndex.invalidate(path)
      rows
    } finally KvMaintenance.release(lease)
  }

  /** Pruning evidence for a kv query, as a relation: one row per kv
    * scan in the plan — live segments, segments actually read (key +
    * zone pruning), statically planned partitions, runtime-filtered
    * partitions (NULL when no runtime filter re-planned the scan), and
    * the pushed-filter summary. The Spark-UI custom metrics report the
    * same numbers per query; this is the programmatic form for
    * notebooks/ops. Call it on the SAME Dataset an action already ran
    * on — runtime-filter state lives in the executed plan's scan
    * instances, and a derived Dataset (e.g. `.count()`) re-plans. */
  def pruningReport(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    def scans(p: SparkPlan): Seq[GraftKvScan] = {
      val here = p match {
        case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
        case q: QueryStageExec => scans(q.plan)
        case b: BatchScanExec =>
          b.scan match { case s: GraftKvScan => Seq(s); case _ => Seq.empty }
        case _ => Seq.empty
      }
      here ++ p.children.flatMap(scans) ++ p.subqueries.flatMap(scans)
    }
    val spark = df.sparkSession
    import spark.implicits._
    scans(df.queryExecution.executedPlan).map(_.pruningEvidence)
      .toDF("table_path", "segments_live", "segments_read",
        "partitions_static", "partitions_runtime", "pushed_filters")
  }

  /** O8: LOAD DATA INPATH — CSV with an explicit schema goes through the
    * same range-shuffle + sort + segment pipeline as any insert. */
  def bulkLoadCsv(spark: SparkSession, csvPath: String, schemaDdl: String,
      path: String, keys: Seq[String], delimiter: String = ","): Unit = {
    val df = spark.read
      .option("delimiter", delimiter)
      .schema(schemaDdl)
      .csv(csvPath)
    createTable(df, path, keys)
  }

  /** DELETE FROM t WHERE cond (Scala API; SQL DELETE routes through
    * GraftKvTable.deleteWhere): matching keys get tombstone records at
    * the next generation — a distributed scan + sorted key-only append,
    * never a table rewrite. Readers suppress tombstoned keys;
    * compaction erases them physically. */
  def delete(spark: SparkSession, path: String,
      cond: org.apache.spark.sql.Column): Unit = {
    val m = GraftKvMeta.read(path).getOrElse(
      throw new IllegalArgumentException(s"no graftkv table at $path"))
    table(spark, path).filter(cond)
      .select(m.keys.map(org.apache.spark.sql.functions.col): _*)
      .write.format("graftkv").option("tombstone", "true")
      .mode("append").save(path)
  }

  /** O2: DROP TABLE (logical+physical here — no catalog indirection). */
  def dropTable(path: String): Unit = {
    SidecarFs.list(path)
      .filter(n => n.endsWith(".kv") || n.endsWith(".kvmeta") ||
        n == "_graft_meta.json" || n == "_graft_segments" ||
        n == "_graft_vhead" || // durable head-version hint dies too
        n.startsWith("_graft_segments.v") || // snapshot manifests: a
        // recreated table must not inherit the dead table's history
        n.startsWith("_graft_stats.v") || // packed planning stats die too
        n.startsWith("_graft_ndv.v") || // NDV sketch packs die too
        n.startsWith("_graft_qs.v") || // quantile-summary packs die too
        SidecarFs.isTempArtifact(n) || // crash-stranded atomic-write temps
        n.startsWith("._graft_zconvert") || // conversion intent markers
        n.startsWith("._graft_epoch-") || // streaming markers die with the table
        // Hadoop local-FS checksum shadows of the control files above
        // (a recreated table must not trip over a dead table's crc)
        (n.startsWith("._graft") && n.endsWith(".crc")))
      .foreach(n => SidecarFs.deleteIfExists(SidecarFs.child(path, n)))
    // sweep scratch dirs stranded by a crashed minor compaction or
    // z-order conversion
    SidecarFs.list(path)
      .filter(n => (n.startsWith(".compacting-") ||
        n.startsWith(".zconvert-")) &&
        SidecarFs.isDirectory(SidecarFs.child(path, n)))
      .foreach(n => SidecarFs.deleteRecursively(SidecarFs.child(path, n)))
    // secondary indexes and materialized views die with their table
    val idx = SidecarFs.child(path, "_index")
    if (SidecarFs.isDirectory(idx)) SidecarFs.deleteRecursively(idx)
    val mv = SidecarFs.child(path, "_mv")
    if (SidecarFs.isDirectory(mv)) SidecarFs.deleteRecursively(mv)
    KvIndex.invalidate(path)
    // the dir itself goes only when nothing else (user files) remains
    SidecarFs.deleteQuiet(path)
  }

  /** O5: DESCRIBE — one row per column: (name, type, KEY order / NONKEY),
    * plus per-segment region info if requested. */
  def describe(spark: SparkSession, path: String): DataFrame = {
    val KvTableMeta(schema, keys, _, _, _) = GraftKvMeta.read(path).getOrElse(
      throw new IllegalArgumentException(s"no graftkv table at $path"))
    import scala.jdk.CollectionConverters._
    val rows = schema.fields.map { f =>
      val ki = keys.indexOf(f.name)
      Row(f.name, f.dataType.simpleString,
        if (ki >= 0) s"KEY($ki)" else "NONKEY")
    }.toSeq.asJava
    spark.createDataFrame(rows,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("col_name", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("data_type", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("role", org.apache.spark.sql.types.StringType))))
  }

  /** Region (segment) inventory: file, rows, bytes — SHOW-style metadata. */
  def segments(path: String): Seq[(String, Long, Long)] =
    SegmentFile.listSegments(path).map(m => (m.file, m.count, m.sizeBytes))

  /** Compaction: appends create key-overlapping segments (pruning still
    * correct, but a point lookup may touch several runs); rewriting the
    * table through the ordered write path restores disjoint sorted
    * segments — the major-compaction analog of an LSM/region store.
    * Safe in one step: new segments get fresh names and the overwrite
    * commit deletes the old files only after every task finished. */
  def compact(spark: SparkSession, path: String,
      maxSegBytes: Option[Long] = None): Unit = {
    val m = GraftKvMeta.read(path).getOrElse(
      throw new IllegalArgumentException(s"no graftkv table at $path"))
    // preserve the max input generation: compaction reorganizes existing
    // versions, it doesn't create new ones — streaming readers key their
    // offsets on generations and must not re-emit compacted rows
    val maxGen = SegmentFile.listSegments(path).map(_.gen).maxOption
    // the z-clustering declaration rides through the rewrite (the _z
    // column is ordinary data here — already present in the read-back)
    createTable(table(spark, path), path, m.keys, m.encoding, maxGen,
      zorder = m.zorder, maxSegBytes = maxSegBytes)
  }

  /** Read amplification of a point lookup: the largest number of live
    * segments any single key can fall into (1 = fully disjoint). Sweep
    * over segments ordered by min key with a heap of active max keys —
    * metadata only, no data read. */
  def overlapDepth(path: String): Int = {
    val m = GraftKvMeta.read(path).getOrElse(
      throw new IllegalArgumentException(s"no graftkv table at $path"))
    val cmp = graft.store.RowCodec(m.schema, m.keys, m.encoding).compareKeys _
    val segs = SegmentFile.listSegments(path)
    if (segs.isEmpty) 0
    else {
      val sorted = segs.sortWith((a, b) => cmp(a.minKey, b.minKey) < 0)
      val active = scala.collection.mutable.PriorityQueue.empty[Array[Byte]](
        Ordering.fromLessThan[Array[Byte]]((a, b) => cmp(a, b) > 0)) // min-heap
      var depth = 0
      sorted.foreach { s =>
        while (active.nonEmpty && cmp(active.head, s.minKey) < 0) active.dequeue()
        active.enqueue(s.maxKey)
        depth = math.max(depth, active.size)
      }
      depth
    }
  }

  /** Minor compaction: rewrite ONLY groups of key-overlapping segments
    * (an LSM/region store's compaction-by-region, not a full-table
    * rewrite — at 100 TB the table never rewrites whole). Each connected
    * component of the segment-overlap graph with ≥ `minGroup` members is
    * read back through a file-restricted scan, rewritten via the ordered
    * write path into fresh disjoint segments, and swapped into the
    * segment manifest atomically; disjoint segments are never touched.
    * A crash mid-compaction leaves only orphan files the manifest
    * excludes — readers never see duplicates.
    *
    * Replaced segments are NOT deleted at the swap: they stay on disk
    * (invisible — the manifest excludes them) for `retainReplacedMs`,
    * so a scan PLANNED against the pre-compaction manifest keeps
    * reading its files — the snapshot-retention window of a manifest
    * table format. The sweep at the end of each compaction deletes any
    * unmanifested segment file older than the window, which also
    * reclaims crash orphans. Returns the number of segments rewritten. */
  def compactMinor(spark: SparkSession, path: String, minGroup: Int = 2,
      retainReplacedMs: Long = 600000L): Int = {
    val m = GraftKvMeta.read(path).getOrElse(
      throw new IllegalArgumentException(s"no graftkv table at $path"))
    val cmp = graft.store.RowCodec(m.schema, m.keys, m.encoding).compareKeys _
    val sorted = SegmentFile.listSegments(path)
      .sortWith((a, b) => cmp(a.minKey, b.minKey) < 0)
    // connected components over composite-key ranges: a component's
    // union is one contiguous interval, so "group max so far" suffices
    val groups = scala.collection.mutable.ArrayBuffer.empty[Vector[SegmentFile.Meta]]
    var groupMax: Array[Byte] = null
    sorted.foreach { s =>
      if (groupMax != null && cmp(s.minKey, groupMax) <= 0) {
        groups(groups.length - 1) = groups.last :+ s
        if (cmp(s.maxKey, groupMax) > 0) groupMax = s.maxKey
      } else {
        groups += Vector(s)
        groupMax = s.maxKey
      }
    }
    val toRewrite = groups.filter(_.size >= math.max(minGroup, 2)).toSeq
    // A legacy (pre-manifest) table's reader authority is the directory
    // listing, so replacement files moved in below would surface as
    // duplicates mid-compaction. Pin the current live set into a manifest
    // FIRST — the table becomes manifest-governed, and from here on the
    // move → swap → delete sequence is atomic for readers.
    if (toRewrite.nonEmpty && SegmentFile.readManifest(path).isEmpty)
      SegmentFile.writeManifest(path,
        SidecarFs.list(path).filter(_.endsWith(".kv")).toSet)
    var rewritten = 0
    toRewrite.foreach { g =>
      val files = g.map(_.file).toSet
      val grouped = spark.read.format("graftkv")
        .option("files", files.mkString(",")).load(path)
      // replacement segments are produced in a scratch table (a hidden
      // subdirectory of the table dir — the manifest hides it from
      // readers, and dropTable sweeps it if a crash strands it) by the
      // ordered range-shuffle write, then MOVED in — they become visible
      // only at the manifest swap below
      val tmp = SidecarFs.child(path,
        s".compacting-${java.util.UUID.randomUUID().toString.take(8)}")
      // replacement segments keep the group's max generation (same
      // versions, reorganized) so gen-offset streams don't re-emit them
      // the scratch dir has no persisted meta, so the table's declared
      // codec and segment size must ride in explicitly
      createTable(grouped, tmp, m.keys, m.encoding,
        genOverride = Some(g.map(_.gen).max),
        maxSegBytes = m.props.get(GraftKvMeta.SegmentMaxBytesProp).map(_.toLong),
        compress = m.props.get(GraftKvMeta.SegmentCompressProp))
      val moved = SegmentFile.listSegments(tmp).map(_.file)
      moved.foreach { f =>
        SidecarFs.move(SidecarFs.child(tmp, f), SidecarFs.child(path, f))
        SidecarFs.move(SidecarFs.child(tmp, f.stripSuffix(".kv") + ".kvmeta"),
          SidecarFs.child(path, f.stripSuffix(".kv") + ".kvmeta"))
      }
      // commit point (CAS): merge the swap into whatever the manifest
      // says NOW — concurrent appends ride along untouched. If any of
      // this group's inputs is no longer live (a concurrent compactor
      // already replaced it), merging our rewrite would resurrect its
      // rows as duplicates — abort THIS group instead and drop its
      // replacement files; the concurrent maintainer owns that range.
      val swapped = SegmentFile.commitManifest(path) { live =>
        if (files.subsetOf(live)) Some(live -- files ++ moved) else None
      }
      if (swapped.isEmpty) {
        moved.foreach { f =>
          SidecarFs.deleteIfExists(SidecarFs.child(path, f))
          SidecarFs.deleteIfExists(
            SidecarFs.child(path, f.stripSuffix(".kv") + ".kvmeta"))
        }
      } else {
        // replaced files stay on disk for the retention window (see
        // scaladoc), invisible behind the manifest. Age them from their
        // REPLACEMENT, not their write: the sweep's cutoff is
        // mtime-based, and a segment written long ago would otherwise
        // be reclaimed the instant it is replaced, voiding the grace
        // window for in-flight scans and snapshots.
        val now = System.currentTimeMillis()
        files.foreach { f =>
          // best-effort (read-only mounts just lose the grace window)
          try {
            SidecarFs.setMtime(SidecarFs.child(path, f), now)
            SidecarFs.setMtime(
              SidecarFs.child(path, f.stripSuffix(".kv") + ".kvmeta"), now)
          } catch { case scala.util.control.NonFatal(_) => () }
        }
        rewritten += g.size
      }
      SidecarFs.list(tmp)
        .foreach(n => SidecarFs.deleteIfExists(SidecarFs.child(tmp, n)))
      SidecarFs.deleteQuiet(tmp)
    }
    if (rewritten > 0) sweepUnmanifested(path, retainReplacedMs)
    rewritten
  }

  /** Delete unmanifested segment files (replaced by compaction, or
    * stranded by a crashed writer) older than `olderThanMs`. Bounded by
    * the manifest contract: anything not listed is invisible to every
    * reader planned after the swap, and the age guard keeps files alive
    * for scans planned before it. Returns the number of segment files
    * reclaimed (the SQL VACUUM statement's report). */
  def sweepUnmanifested(path: String, olderThanMs: Long): Int =
    SegmentFile.readManifest(path).map { current =>
      val cutoff = System.currentTimeMillis() - olderThanMs
      // Expired snapshot manifests go FIRST: past the window a VERSION
      // AS OF read fails with "no snapshot" instead of "missing segment
      // files". Then everything a RETAINED snapshot still lists is live
      // — time travel within the window must never observe a swept file,
      // however old the segment's own mtime is (a segment predates every
      // snapshot that lists it, and RESTORE can relist arbitrarily old
      // ones), so liveness is manifest-driven and the mtime cutoff only
      // shields files from readers that hold NO manifest reference
      // (in-flight scans planned before a swap).
      SegmentFile.pruneManifestVersions(path, cutoff)
      val live: Set[String] = current ++
        SegmentFile.manifestVersions(path)
          .flatMap(v => SegmentFile.readManifestVersion(path, v)
            .getOrElse(Set.empty))
      val swept = SidecarFs.list(path)
        .filter(n => n.endsWith(".kv") &&
          !live.contains(n) &&
          SidecarFs.mtime(SidecarFs.child(path, n)) <= cutoff)
      swept.foreach { n =>
        SidecarFs.deleteIfExists(SidecarFs.child(path, n))
        SidecarFs.deleteIfExists(
          SidecarFs.child(path, n.stripSuffix(".kv") + ".kvmeta"))
      }
      // stale streaming-epoch markers: a crashed writeIntent strands a
      // .tmp forever, and markers of abandoned checkpoints (dead query
      // ids) accumulate — the per-commit trailing delete only covers
      // the live query. Sweep aged ones, but KEEP each query's newest
      // non-tmp marker regardless of age: an idle-then-restarted stream
      // still needs it to recognize its last epoch as committed.
      val markers = SidecarFs.list(path)
        .filter(_.startsWith("._graft_epoch-"))
      // name = ._graft_epoch-<queryId>-<epochId>.<intent|done>; queryId
      // is a UUID (contains dashes) — epochId is the LAST dash token
      def parse(n: String): Option[(String, Long)] = {
        val stem = n.stripPrefix("._graft_epoch-")
          .stripSuffix(".intent").stripSuffix(".done")
        val cut = stem.lastIndexOf('-')
        if (cut < 0) None
        else stem.drop(cut + 1).toLongOption.map(e => (stem.take(cut), e))
      }
      val keep: Set[String] = markers.filterNot(_.endsWith(".tmp"))
        .flatMap(n => parse(n).map { case (q, e) => (q, e, n) })
        .groupBy(_._1).values.flatMap(_.maxByOption(_._2).map(_._3)).toSet
      markers.filterNot(keep.contains)
        .filter(n => SidecarFs.mtime(SidecarFs.child(path, n)) <= cutoff)
        .foreach(n => SidecarFs.deleteIfExists(SidecarFs.child(path, n)))
      // temp files stranded by a crash between write and the
      // finally-delete in any SidecarFs atomic primitive (manifest CAS,
      // meta/stats/ndv/qs swaps, epoch/zconvert markers): nothing else
      // reclaims them, so they'd accumulate until DROP TABLE. One
      // shared recognizer — a hand-kept prefix list here silently
      // missed `_graft_segments.v<N>` CAS temps and the double-dotted
      // temps of already-dotted marker names. The age cutoff protects
      // in-flight temps of live concurrent writers.
      SidecarFs.list(path)
        .filter(n => SidecarFs.isTempArtifact(n) &&
          SidecarFs.mtime(SidecarFs.child(path, n)) <= cutoff)
        .foreach(n => SidecarFs.deleteIfExists(SidecarFs.child(path, n)))
      swept.length
    }.getOrElse(0)

  /** Retained snapshot versions (newest = the current table state). */
  def snapshots(path: String): Seq[Long] = SegmentFile.manifestVersions(path)

  /** Roll the table back to a retained snapshot: publish that
    * snapshot's segment set as a NEW commit (history moves forward — the
    * rolled-back-over commits stay retained and readable until the
    * sweep, so a restore is itself undoable). Segments are immutable
    * and still on disk within the retention window, so this is a
    * metadata-only operation at any table size. */
  def restoreTable(path: String, version: Long): Unit = {
    val snap = SegmentFile.readManifestVersion(path, version).getOrElse(
      throw new IllegalArgumentException(
        s"no snapshot version $version at $path " +
          s"(retained: ${SegmentFile.manifestVersions(path).mkString(", ")})"))
    val missing =
      snap.filterNot(f => SidecarFs.exists(SidecarFs.child(path, f)))
    if (missing.nonEmpty) throw new IllegalStateException(
      s"snapshot $version references swept segments: " +
        missing.toSeq.sorted.mkString(", "))
    SegmentFile.commitManifest(path)(_ => Some(snap))
    ()
  }

  /** ZERO-COPY clone: a new independent table over the same immutable
    * segment files (hard links — same inodes, separate directory
    * entries), optionally as of a retained snapshot version. Segments
    * are write-once, so the tables share bytes safely: each side's
    * compaction/vacuum touches only its own directory entries, and
    * the filesystem reclaims an inode when the LAST table's sweep
    * unlinks it. The corpus-freezing primitive for training pipelines:
    * naming a 100 TB snapshot costs metadata, not a copy. Falls back
    * to file copies when linking is impossible (cross-device). */
  def cloneTable(src: String, dst: String,
      version: Option[Long] = None): Unit = {
    val m = GraftKvMeta.read(src).getOrElse(
      throw new IllegalArgumentException(s"no graftkv table at $src"))
    if (GraftKvMeta.read(dst).isDefined)
      throw new IllegalArgumentException(s"clone target $dst already exists")
    val live: Set[String] = version match {
      case Some(v) => SegmentFile.readManifestVersion(src, v).getOrElse(
        throw new IllegalArgumentException(
          s"no snapshot version $v at $src " +
            s"(retained: ${SegmentFile.manifestVersions(src).mkString(", ")})"))
      case None => SegmentFile.readManifest(src).getOrElse(
        SidecarFs.list(src).filter(_.endsWith(".kv")).toSet)
    }
    SidecarFs.mkdirs(dst)
    def share(name: String): Unit =
      SidecarFs.shareOrCopy(SidecarFs.child(src, name),
        SidecarFs.child(dst, name))
    live.foreach { f =>
      share(f)
      share(f.stripSuffix(".kv") + ".kvmeta")
    }
    GraftKvMeta.write(dst, m.schema, m.keys, m.encoding, m.zorder, m.props)
    SegmentFile.writeManifest(dst, live)
  }

  /** Time travel via the path API: the table as of snapshot `version`
    * (the catalog equivalent is `SELECT … FROM graft.db.t VERSION AS OF n`). */
  def tableAsOf(spark: SparkSession, path: String, version: Long): DataFrame =
    spark.read.format("graftkv")
      .option("snapshot.version", version.toString).load(path)

  /** UPDATE t SET col = expr, … WHERE cond: scan the matching rows,
    * apply the assignments, and re-append — Put-upsert semantics make
    * the appended rows replace the stored versions, so an update is a
    * pruned scan plus a sorted append of ONLY the touched rows, never a
    * table rewrite (the same storage story as [[delete]]'s tombstones).
    * Key columns cannot be assigned: a key change is semantically a
    * delete + insert, which the caller must state explicitly. */
  def update(spark: SparkSession, path: String,
      cond: org.apache.spark.sql.Column,
      set: Map[String, org.apache.spark.sql.Column]): Unit = {
    val m = GraftKvMeta.read(path).getOrElse(
      throw new IllegalArgumentException(s"no graftkv table at $path"))
    val badKeys = set.keySet.intersect(m.keys.toSet)
    require(badKeys.isEmpty,
      s"cannot assign key columns ${badKeys.mkString(", ")}: " +
        "delete and re-insert to move a row")
    val unknown = set.keySet.diff(m.schema.fieldNames.toSet)
    require(unknown.isEmpty, s"unknown columns: ${unknown.mkString(", ")}")
    // ONE projection evaluates every assignment against the OLD row —
    // SQL UPDATE semantics: SET a = b, b = a swaps, independent of
    // assignment order. (The cast is exactness vs the declared type;
    // under Spark 4's default ANSI mode a lossy value errors loudly.)
    val updated = table(spark, path).filter(cond).select(
      m.schema.fieldNames.map { c =>
        set.get(c)
          .map(_.cast(m.schema(c).dataType).as(c))
          .getOrElse(org.apache.spark.sql.functions.col(c))
      }.toSeq: _*)
    updated.write.format("graftkv").mode("append").save(path)
  }

  /** Change-data diff between two retained snapshots: one row per key
    * whose visible row differs between versions `fromV` and `toV`,
    * tagged 'added' / 'removed' / 'updated' (the old_ and new_ columns
    * carry both sides' values). Both sides are ordinary pruned snapshot
    * scans; the
    * diff is ONE full-outer join on the primary key — each side
    * shuffles once on the key it is already sorted by, so the operator
    * scales with the table, never with its commit history. */
  def snapshotDiff(spark: SparkSession, path: String,
      fromV: Long, toV: Long): DataFrame = {
    import org.apache.spark.sql.functions._
    val KvTableMeta(schema, keys, _, _, _) = GraftKvMeta.read(path).getOrElse(
      throw new IllegalArgumentException(s"no graftkv table at $path"))
    val vals = schema.fieldNames.toSeq.filterNot(keys.contains)
    // internal columns are __-prefixed so a user value column named
    // e.g. "present" can't collide with the marker flags
    def side(v: Long, tag: String) = tableAsOf(spark, path, v).select(
      keys.map(col) ++ vals.map(c => col(c).as(s"${tag}_$c")) :+
        lit(true).as(s"__${tag}_present"): _*)
    val j = side(fromV, "old").join(side(toV, "new"), keys, "full_outer")
    // null-safe: a value flipping to/from NULL is still a change
    val valueChanged = vals.map(c => !(col(s"old_$c") <=> col(s"new_$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    j.withColumn("__change",
        when(col("__old_present").isNull, "added")
          .when(col("__new_present").isNull, "removed")
          .when(valueChanged, "updated")) // unchanged rows get NULL…
      .where(col("__change").isNotNull)   // …and are dropped here
      .select(keys.map(col) ++ Seq(col("__change").as("change")) ++
        vals.flatMap(c => Seq(col(s"old_$c"), col(s"new_$c"))): _*)
  }

  /** Auto-compaction policy for streamed/appended tables: compact only
    * when a point lookup could touch more than `maxDepth` overlapping
    * segments. The check is metadata-only, so calling this after every
    * append batch is cheap; the rewrite, when it fires, touches only the
    * overlapping groups. Returns true if a compaction ran. */
  def autoCompact(spark: SparkSession, path: String, maxDepth: Int = 4): Boolean =
    overlapDepth(path) > maxDepth && compactMinor(spark, path) > 0
}

/** Crash-repair protocol for `OPTIMIZE … ZORDER BY` (see
  * [[KvCommands.convertToZOrder]]): an intent marker written just
  * before the manifest CAS carries the new segment set and the new
  * table meta, so ANY later reader can tell which side of the commit
  * point a crash landed on and finish (or undo) deterministically —
  * the conversion has no manual-repair window.
  *
  * Marker format (written via tmp + atomic move, so never torn):
  * {{{
  *   <n>            — count of new segment files
  *   <file_1..n>    — the new live set, sorted
  *   <meta>         — the new _graft_meta.json content (2 lines)
  * }}} */
private[connector] object ZConvert {
  import graft.io.SidecarFs
  import graft.store.SegmentFile

  /** Test-only fault injection: `convertToZOrder` calls
    * `checkpoint(n)` between protocol steps; a spec can arm a crash at
    * a step, or an arbitrary action (e.g. a concurrent append racing
    * the CAS). Production values never fire. */
  @volatile private[connector] var testCrashPoint: Int = -1
  @volatile private[connector] var testCheckpointAction: Int => Unit = null
  private[connector] def checkpoint(step: Int): Unit = {
    val a = testCheckpointAction
    if (a != null) a(step)
    if (testCrashPoint == step)
      throw new RuntimeException(s"injected crash at zconvert step $step")
  }

  def markerPath(dir: String): String =
    SidecarFs.child(dir, "._graft_zconvert")

  def writeMarker(dir: String, newFiles: Set[String], meta: String): Unit =
    SidecarFs.writeStringAtomic(markerPath(dir),
      (Seq(newFiles.size.toString) ++ newFiles.toSeq.sorted :+ meta)
        .mkString("\n"))

  def readMarker(dir: String): Option[(Set[String], String)] =
    try {
      if (!SidecarFs.exists(markerPath(dir))) None
      else {
        val lines = SidecarFs.readString(markerPath(dir)).split("\n", -1)
        val n = lines(0).trim.toInt
        Some((lines.slice(1, 1 + n).toSet,
          lines.drop(1 + n).mkString("\n")))
      }
    } catch { case _: Exception => None }

  def clearMarker(dir: String): Unit =
    SidecarFs.deleteIfExists(markerPath(dir))

  /** Atomic meta publish from raw content (GraftKvMeta.write's rename
    * discipline, without re-deriving the serialized form). */
  def writeMetaContent(dir: String, content: String): Unit =
    SidecarFs.writeStringAtomic(
      SidecarFs.child(dir, "_graft_meta.json"), content)

  /** Read-side repair, called by GraftKvMeta.read before every meta
    * read (one Files.exists on the hot path). Cases:
    *  - manifest == marker's new set → the CAS committed: finish the
    *    meta flip (idempotent — the live converter may be doing the
    *    same), prune pre-conversion snapshots, clear the marker;
    *  - manifest ≠ new set → either a converter is mid-flight or one
    *    crashed before the commit point. The two are distinguished by
    *    ACQUIRING the maintenance lease (steal-if-stale), never by an
    *    mtime-age guess: acquisition failing means a live converter
    *    holds it — old meta governs, leave everything alone; acquiring
    *    it means any converter is dead or expired, so under the lease
    *    the old table governs — drop the stranded unmanifested
    *    replacement segments, stranded scratch dirs, and the marker.
    *    (A zombie converter that expired mid-commit is still fenced:
    *    its post-CAS verify sees the swept marker/segments and rolls
    *    its manifest back — see [[KvCommands.convertToZOrder]].) */
  def repair(dir: String): Unit = {
    if (!SidecarFs.exists(markerPath(dir))) return
    readMarker(dir).foreach { case (newSet, meta) =>
      val live = try SegmentFile.readManifest(dir)
        catch { case _: Exception => None }
      if (live.contains(newSet)) {
        writeMetaContent(dir, meta)
        SegmentFile.pruneManifestVersions(dir, Long.MaxValue)
        clearMarker(dir)
        KvIndex.invalidate(dir)
      } else KvMaintenance.acquire(dir).foreach { l =>
        try {
          // re-read under the lease: the marker may have been cleared
          // (conversion finished or aborted) between the check above
          // and the acquisition — destructive cleanup must act only on
          // the state the lease now fences
          readMarker(dir).foreach { case (newSet2, _) =>
            val live2 = try SegmentFile.readManifest(dir)
              catch { case _: Exception => None }
            if (!live2.contains(newSet2)) {
              newSet2.filterNot(f => live2.exists(_.contains(f))).foreach { f =>
                SidecarFs.deleteIfExists(SidecarFs.child(dir, f))
                SidecarFs.deleteIfExists(
                  SidecarFs.child(dir, f.stripSuffix(".kv") + ".kvmeta"))
              }
              // a crash mid-build also strands the hidden scratch
              // subdirectory; with the lease held no converter is
              // live, so any scratch here is dead
              SidecarFs.list(dir)
                .filter(n => n.startsWith(".zconvert-") &&
                  SidecarFs.isDirectory(SidecarFs.child(dir, n)))
                .foreach(n =>
                  SidecarFs.deleteRecursively(SidecarFs.child(dir, n)))
              clearMarker(dir)
            }
          }
        } finally KvMaintenance.release(l)
      }
    }
  }
}
