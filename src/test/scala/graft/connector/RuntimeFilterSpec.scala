package graft.connector

import graft.TestSpark
import java.nio.file.Files
import org.apache.spark.sql.connector.expressions.Expressions
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge
import org.apache.spark.sql.types.LongType
import org.scalatest.funsuite.AnyFunSuite

/** Runtime filtering (SupportsRuntimeV2Filtering) — the kv connector's
  * dynamic-partition-pruning analog: Spark evaluates the dim side of a
  * star join first and hands the fact scan the surviving join-key values
  * as an IN predicate; the scan re-runs its segment prune over them.
  * Mirrors the reference's point-get batching for join-key lists
  * (HBaseSQLReaderRDD.scala:268-315) at the planner level. */
class RuntimeFilterSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmpDir(tag: String): String =
    Files.createTempDirectory(s"graftkv_rf_$tag").toString

  private def v2In(col: String, values: Long*): Predicate =
    new Predicate("IN",
      (Expressions.column(col) +: values.map(v => graftbridge.v2Literal(v, LongType):
        org.apache.spark.sql.connector.expressions.Expression)).toArray)

  /** All GraftKvScan instances reachable from an executed plan, looking
    * through AQE wrappers and materialized query stages. */
  private def kvScans(p: SparkPlan): Seq[GraftKvScan] = {
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    val here = p match {
      case a: AdaptiveSparkPlanExec => kvScans(a.executedPlan)
      case q: QueryStageExec => kvScans(q.plan)
      case b: BatchScanExec =>
        b.scan match { case s: GraftKvScan => Seq(s); case _ => Seq.empty }
      case _ => Seq.empty
    }
    here ++ p.children.flatMap(kvScans) ++
      p.subqueries.flatMap(kvScans)
  }

  test("a runtime IN on the lead key re-prunes segments and ranges") {
    val path = tmpDir("unit") + "/t"
    // 20k rows bulk-loaded → range-shuffled into several lead-disjoint
    // segments (shuffle.partitions=4 in the test session)
    val df = spark.range(20000).select(col("id").as("k"), (col("id") % 97).as("v"))
    df.write.format("graftkv").option("key", "k")
      .option("segment.maxBytes", "65536") // rotate → several segments
      .mode("overwrite").save(path)
    val meta = GraftKvMeta.read(path).get
    val scan = new GraftKvScan(path, meta.schema, meta.keys, meta.schema,
      Array.empty, -1, meta.encoding)
    val before = scan.planInputPartitions().length
    assert(before >= 3, s"expected several segments, got $before")

    // two point keys in the first quarter of the domain → one segment
    scan.filter(Array(v2In("k", 5L, 17L)))
    val after = scan.planInputPartitions()
    assert(after.length < before,
      s"runtime filter did not prune: $before -> ${after.length}")
    assert(scan.runtimePartitionCount.contains(after.length))
    // the partitions that survive carry refined per-partition ranges, so
    // the reader seeks to the points instead of draining the segment
    val ranges = after.collect {
      case p: GraftKvInputPartition => p.partitionRanges
    }
    assert(ranges.forall(_.isDefined))
  }

  test("a huge runtime IN coalesces to bounded ranges and still prunes") {
    val path = tmpDir("wide") + "/t"
    spark.range(20000).select(col("id").as("k"), col("id").as("v"))
      .write.format("graftkv").option("key", "k")
      .option("segment.maxBytes", "65536")
      .mode("overwrite").save(path)
    val meta = GraftKvMeta.read(path).get
    val scan = new GraftKvScan(path, meta.schema, meta.keys, meta.schema,
      Array.empty, -1, meta.encoding)
    val before = scan.planInputPartitions().length
    assert(before >= 3)
    // 2000 values, all inside the first tenth of the key domain: over
    // the IN cap, so the filter coalesces to disjoint ranges — still
    // enough to prune every segment past the first tenth
    scan.filter(Array(v2In("k", (0L until 2000L): _*)))
    val after = scan.planInputPartitions()
    assert(after.length < before,
      s"coalesced ranges pruned nothing: $before -> ${after.length}")
  }

  test(">cap survivors spanning the key domain still prune the gaps between clusters") {
    // the round-12 scale cliff: >1024 surviving join keys used to
    // collapse to ONE [min,max] range, and survivors touching both ends
    // of the key domain pruned NOTHING — at 100 TB that silently turns
    // every realistic star join back into a full fact scan. Coalesced
    // disjoint ranges keep the inter-cluster gaps, so the middle
    // segments still drop.
    val path = tmpDir("cliff") + "/t"
    spark.range(40000).select(col("id").as("k"), (col("id") % 13).as("v"))
      .write.format("graftkv").option("key", "k")
      .option("segment.maxBytes", "65536")
      .mode("overwrite").save(path)
    val meta = GraftKvMeta.read(path).get
    val scan = new GraftKvScan(path, meta.schema, meta.keys, meta.schema,
      Array.empty, -1, meta.encoding)
    val before = scan.planInputPartitions().length
    assert(before >= 6, s"expected many segments, got $before")
    // 3000 survivors (over the 1024 cap) in two dense clusters at the
    // domain's two ENDS — min=0, max=39499, so a [min,max] collapse
    // covers every segment
    val survivors = (0L until 1500L) ++ (38000L until 39500L)
    scan.filter(Array(v2In("k", survivors: _*)))
    val after = scan.planInputPartitions()
    assert(after.length < before,
      s"end-spanning >cap survivors pruned nothing (the [min,max] cliff): " +
        s"$before -> ${after.length}")
    // the surviving partitions carry refined ranges for in-segment seeks
    val ranges = after.collect {
      case p: GraftKvInputPartition => p.partitionRanges
    }
    assert(ranges.nonEmpty && ranges.forall(_.isDefined))
    // and the scan still returns every matching row (scan-level read
    // through the runtime plan is a superset; here it is exact on the
    // pruned partitions' data)
    assert(scan.runtimePartitionCount.contains(after.length))
  }

  test("randomized: runtime-IN pruning never loses a matching row (In and range paths)") {
    // the one invariant pruning must never break: every row whose key
    // survives the dim filter is still returned by the pruned scan.
    // Survivor counts straddle the 1024 cap, so both the exact-In path
    // and the coalesced-KeyRanges path are exercised, on mixed
    // clustered + scattered key sets (fixed seed — deterministic).
    val path = tmpDir("fuzz") + "/t"
    val n = 30000L
    spark.range(n).select(col("id").as("k"), (col("id") % 17).as("v"))
      .write.format("graftkv").option("key", "k")
      .option("segment.maxBytes", "65536").mode("overwrite").save(path)
    val meta = GraftKvMeta.read(path).get
    val rnd = new scala.util.Random(20260815L)
    for (nVals <- Seq(60, 900, 1200, 3000, 9000)) {
      val base = rnd.nextInt(20000)
      val clustered = (0 until nVals / 2).map(i => (base + i).toLong)
      val scattered = (0 until nVals - nVals / 2)
        .map(_ => math.abs(rnd.nextLong()) % n)
      val vals = (clustered ++ scattered).distinct.filter(_ < n)
      val scan = new GraftKvScan(path, meta.schema, meta.keys, meta.schema,
        Array.empty, -1, meta.encoding)
      scan.filter(Array(v2In("k", vals: _*)))
      val fac = scan.createReaderFactory()
      val got = scala.collection.mutable.HashSet.empty[Long]
      scan.planInputPartitions().foreach { p =>
        val r = fac.createReader(p).asInstanceOf[GraftKvPartitionReader]
        while (r.next()) got += r.get().getLong(0)
        r.close()
      }
      val missing = vals.toSet.diff(got)
      assert(missing.isEmpty,
        s"nVals=$nVals (${vals.length} distinct) lost ${missing.size} " +
          s"matching keys, e.g. ${missing.take(5)}")
    }
  }

  test("a runtime IN on a zone-mapped VALUE column prunes segments, component-safely") {
    val path = tmpDir("valzone") + "/t"
    // v correlates with the key order (v = k / 5000): each lead-disjoint
    // segment covers a narrow v zone, so a runtime IN on v can skip
    // segments the way a clustered-attribute star join needs — and a
    // matview rescan's group semi-join rides the same path
    spark.range(20000).select(col("id").as("k"), (col("id") / 5000).as("v"))
      .write.format("graftkv").option("key", "k")
      .option("segment.maxBytes", "65536")
      .mode("overwrite").save(path)
    val meta = GraftKvMeta.read(path).get
    val scan = new GraftKvScan(path, meta.schema, meta.keys, meta.schema,
      Array.empty, -1, meta.encoding)
    val before = scan.planInputPartitions().length
    assert(before >= 3, s"expected several segments, got $before")
    scan.filter(Array(v2In("v", 0L))) // only the first quarter's zones hold 0
    val after = scan.planInputPartitions().length
    assert(after < before,
      s"value-zone runtime filter pruned nothing: $before -> $after")
    assert(scan.runtimePartitionCount.contains(after))
    // STRING value columns prune the same way (V12 zones): the same
    // correlated-layout shape with a string group label
    val spath = tmpDir("valstr") + "/t"
    spark.range(20000).select(col("id").as("k"),
      concat(lit("g"), expr("id div 5000").cast("string")).as("s"))
      .write.format("graftkv").option("key", "k")
      .option("segment.maxBytes", "65536").mode("overwrite").save(spath)
    val sm = GraftKvMeta.read(spath).get
    val sscan = new GraftKvScan(spath, sm.schema, sm.keys, sm.schema,
      Array.empty, -1, sm.encoding)
    val sBefore = sscan.planInputPartitions().length
    assert(sBefore >= 3)
    sscan.filter(Array(new Predicate("=",
      Array(Expressions.column("s"),
        graftbridge.v2Literal(org.apache.spark.unsafe.types.UTF8String
          .fromString("g0"), org.apache.spark.sql.types.StringType)))))
    assert(sscan.planInputPartitions().length < sBefore,
      "string value zones did not prune the runtime equality")

    // DECIMAL value columns prune too (V13 zones): a money column
    // correlated with the layout — the star-join-on-price shape
    val dpath = tmpDir("valdec") + "/t"
    spark.range(20000).select(col("id").as("k"),
      expr("CAST(CAST(id div 5000 AS DECIMAL(12,2)) + 0.25 AS DECIMAL(12,2))")
        .as("m"))
      .write.format("graftkv").option("key", "k")
      .option("segment.maxBytes", "65536").mode("overwrite").save(dpath)
    val dm = GraftKvMeta.read(dpath).get
    val dscan = new GraftKvScan(dpath, dm.schema, dm.keys, dm.schema,
      Array.empty, -1, dm.encoding)
    val dBefore = dscan.planInputPartitions().length
    assert(dBefore >= 3)
    dscan.filter(Array(new Predicate("=",
      Array(Expressions.column("m"),
        graftbridge.v2Literal(new java.math.BigDecimal("0.25"),
          org.apache.spark.sql.types.DecimalType(12, 2))))))
    assert(dscan.planInputPartitions().length < dBefore,
      "decimal value zones did not prune the runtime equality")

    // never semantics: the surviving partitions still return every
    // matching row (the join re-applies the predicate anyway)
    // — and an UNCORRELATED value is pruning-neutral, not row-dropping
    val flat = tmpDir("valflat") + "/t"
    KvCommands.createTable(
      spark.range(100).select(col("id").as("k"), (col("id") % 3).as("v")),
      flat, Seq("k"))
    val m2 = GraftKvMeta.read(flat).get
    val scan2 = new GraftKvScan(flat, m2.schema, m2.keys, m2.schema,
      Array.empty, -1, m2.encoding)
    val b2 = scan2.planInputPartitions().length
    scan2.filter(Array(v2In("v", 1L, 2L))) // every zone holds 1 and 2
    assert(scan2.planInputPartitions().length == b2,
      "uncorrelated value zones must not prune (nothing is provably false)")
  }

  test("runtime predicates on non-zone-mapped columns are ignored") {
    val path = tmpDir("nonzone") + "/t"
    KvCommands.createTable(
      spark.range(100).select(col("id").as("k"),
        (col("id") % 2 === 0).as("b")), path, Seq("k"))
    val meta = GraftKvMeta.read(path).get
    val scan = new GraftKvScan(path, meta.schema, meta.keys, meta.schema,
      Array.empty, -1, meta.encoding)
    val before = scan.planInputPartitions().length
    // booleans carry no zone maps: the predicate is untranslatable and
    // must be dropped (optimization, never semantics). (Strings used to
    // be the example here — V12 string zones made them prunable.)
    scan.filter(Array(new Predicate("=",
      Array(Expressions.column("b"),
        graftbridge.v2Literal(true, org.apache.spark.sql.types.BooleanType)))))
    assert(scan.planInputPartitions().length == before)
    assert(scan.runtimePartitionCount.isEmpty)
  }

  test("END-TO-END: a broadcast join on a VALUE column injects and prunes") {
    val path = tmpDir("valjoin") + "/t"
    // g correlates with key order (g = k div 4000, INTEGRAL — a double
    // join key arrives wrapped in NaN-normalization and is ignored):
    // lead-disjoint segments cover narrow g zones — the matview-rescan /
    // clustered-star shape
    spark.range(40000).select(col("id").as("k"), expr("id div 4000").as("g"),
      (col("id") % 7).as("v"))
      .write.format("graftkv").option("key", "k")
      .option("segment.maxBytes", "65536")
      .mode("overwrite").save(path)
    val dimPath = tmpDir("valdim")
    spark.range(3).select(col("id").as("dg"), (col("id") % 2).as("cat"))
      .write.mode("overwrite").parquet(dimPath)
    val kv = KvCommands.table(spark, path)
    val dim = spark.read.parquet(dimPath).filter(col("cat") === 0)
    val joined = kv.join(dim, kv("g") === dim("dg"))
    // collect() (not count()) so the inspected queryExecution is the one
    // that actually ran — count() derives a new Dataset with its own plan
    val n = joined.collect().length
    assert(n == 8000, s"join returned $n rows") // g ∈ {0, 2}
    val scans = kvScans(joined.queryExecution.executedPlan)
    assert(scans.nonEmpty, "kv scan not found in executed plan")
    val filtered = scans.flatMap(s => s.runtimePartitionCount.map((s, _)))
    assert(filtered.nonEmpty,
      "runtime filter on the value column never reached the kv scan")
    filtered.foreach { case (s, after) =>
      assert(after < s.staticPartitionCount,
        s"value-zone runtime join filter pruned nothing: " +
          s"${s.staticPartitionCount} -> $after")
    }
    // the programmatic pruning report tells the same story
    val report = KvCommands.pruningReport(joined).collect()
    assert(report.length == 1, report.toSeq)
    val r = report.head
    assert(r.getAs[Long]("segments_read") < r.getAs[Long]("segments_live"),
      s"report shows no segment pruning: $r")
    assert(!r.isNullAt(r.fieldIndex("partitions_runtime")), s"no runtime col: $r")
    assert(r.getAs[Long]("partitions_runtime") < r.getAs[Long]("partitions_static"))
  }

  test("END-TO-END: a broadcast join on a DECIMAL value column injects and prunes") {
    // the decimal twin of the integral value-column join above: a
    // money attribute correlated with key order — round 9 verified the
    // decimal zone evaluation only with a hand-built v2 predicate; this
    // drives the whole Spark path (join → runtime filter injection →
    // decimal literal translation → V13 zone pruning) and would catch a
    // NaN-normalization-style wrapper blocking decimal keys the way it
    // blocks doubles
    val path = tmpDir("valdecjoin") + "/t"
    spark.range(40000).select(col("id").as("k"),
      expr("CAST(CAST(id div 4000 AS DECIMAL(12,2)) + 0.25 AS DECIMAL(12,2))")
        .as("m"),
      (col("id") % 7).as("v"))
      .write.format("graftkv").option("key", "k")
      .option("segment.maxBytes", "65536")
      .mode("overwrite").save(path)
    val dimPath = tmpDir("valdecdim")
    spark.range(3).select(
      expr("CAST(CAST(id AS DECIMAL(12,2)) + 0.25 AS DECIMAL(12,2))").as("dm"),
      (col("id") % 2).as("cat"))
      .write.mode("overwrite").parquet(dimPath)
    val kv = KvCommands.table(spark, path)
    val dim = spark.read.parquet(dimPath).filter(col("cat") === 0)
    val joined = kv.join(dim, kv("m") === dim("dm"))
    val n = joined.collect().length
    assert(n == 8000, s"decimal join returned $n rows") // m ∈ {0.25, 2.25}
    val scans = kvScans(joined.queryExecution.executedPlan)
    assert(scans.nonEmpty, "kv scan not found in executed plan")
    val filtered = scans.flatMap(s => s.runtimePartitionCount.map((s, _)))
    assert(filtered.nonEmpty,
      "runtime filter on the decimal value column never reached the kv scan")
    filtered.foreach { case (s, after) =>
      assert(after < s.staticPartitionCount,
        s"decimal value-zone runtime join filter pruned nothing: " +
          s"${s.staticPartitionCount} -> $after")
    }
  }

  test("star join: the dim side's join keys prune the kv fact scan at runtime") {
    val path = tmpDir("join") + "/t"
    val fact = spark.range(40000).select(
      col("id").as("k"), (col("id") % 1000).as("v"))
    fact.write.format("graftkv").option("key", "k")
      .option("segment.maxBytes", "65536")
      .mode("overwrite").save(path)

    val dimPath = tmpDir("dim")
    // 100 dim rows, fks clustered at the bottom of the fact key domain
    spark.range(100).select((col("id") * 40).as("fk"), (col("id") % 5).as("cat"))
      .write.mode("overwrite").parquet(dimPath)

    val kv = KvCommands.table(spark, path)
    val dim = spark.read.parquet(dimPath).filter(col("cat") === 2)
    val joined = kv.join(dim, kv("k") === dim("fk"))
    val rows = joined.collect()
    assert(rows.length == 20) // ids 2,7,…,97

    val scans = kvScans(joined.queryExecution.executedPlan)
    assert(scans.nonEmpty, "kv scan not found in executed plan")
    val filtered = scans.flatMap(s => s.runtimePartitionCount.map((s, _)))
    assert(filtered.nonEmpty, "runtime filter never reached the kv scan")
    filtered.foreach { case (s, n) =>
      assert(n < s.staticPartitionCount,
        s"runtime filter pruned nothing: ${s.staticPartitionCount} -> $n")
    }
  }
}
