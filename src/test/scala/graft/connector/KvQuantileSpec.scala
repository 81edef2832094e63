package graft.connector

import graft.TestSpark
import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Metadata percentiles (KvPercentileRule + V11 quantile summaries):
  * whole-table approx_percentile answered from merged per-segment
  * Greenwald-Khanna summaries must honor the SAME ε-rank contract the
  * scan-side aggregate promises (the value's rank within ε·N of p·N —
  * the answered value itself may legitimately differ from the scan's,
  * both being valid ε-approximations whose identity depends on merge
  * order), and every unsound shape must refuse and stay correct. */
class KvQuantileSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val Eps = graft.store.SegmentFile.QsRelativeError

  private def tmpDir(tag: String): String =
    Files.createTempDirectory(s"graftkv_qs_$tag").toString + "/t"

  private def answersFromMetadata(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.collectFirst {
      case _: LocalRelation => ()
    }.isDefined

  /** The GK contract: rank(v) must lie within ε·N (+1 slack for the
    * floor in the rank formula) of the target rank p·N, counted over
    * the LIVE non-null rows of the column. */
  private def assertInBand(path: String, colName: String, p: Double,
      v: Double): Unit = {
    val t = KvCommands.table(spark, path).filter(col(colName).isNotNull)
    val n = t.count().toDouble
    val lt = t.filter(col(colName) < v).count().toDouble
    val le = t.filter(col(colName) <= v).count().toDouble
    val slack = Eps * n + 1
    assert(lt <= p * n + slack,
      s"$colName p=$p: value $v ranks too high (lt=$lt of $n)")
    assert(le >= p * n - slack,
      s"$colName p=$p: value $v ranks too low (le=$le of $n)")
  }

  private def mkBase(path: String): Unit = {
    // several segments (small maxBytes), nulls in x, doubles, a date-ish
    // long; values deliberately non-uniform (quadratic) so a wrong rank
    // is visible
    val df = spark.range(20000).select(col("id").as("k"),
      when(col("id") % 50 === 3, lit(null))
        .otherwise((col("id") * col("id")) % 9973).as("x"),
      (col("id") % 211).cast("double").as("d"))
    df.write.format("graftkv").option("key", "k")
      .option("segment.maxBytes", "65536")
      .mode("overwrite").save(path)
  }

  test("whole-table percentile_approx answers from metadata within the rank band") {
    val path = tmpDir("basic")
    mkBase(path)
    def q = KvCommands.table(spark, path)
      .agg(percentile_approx(col("x"), lit(0.5),
          lit(10000)).as("p50_x"),
        percentile_approx(col("d"), lit(0.25), lit(10000)).as("p25_d"),
        percentile_approx(col("k"), lit(0.9), lit(10000)).as("p90_k"),
        count(lit(1)).as("cnt"))
    assert(answersFromMetadata(q), "rule did not fire")
    val r = q.first()
    assertInBand(path, "x", 0.5, r.getLong(0).toDouble)
    assertInBand(path, "d", 0.25, r.getDouble(1))
    assertInBand(path, "k", 0.9, r.getLong(2).toDouble)
    assert(r.getLong(3) == 20000L)
    // the scan-side answer (rule off) honors the same band — the two
    // values may differ, the contract may not
    spark.conf.set("spark.graft.percentile.metadata", "false")
    try {
      val s = q.first()
      assert(!answersFromMetadata(q))
      assertInBand(path, "x", 0.5, s.getLong(0).toDouble)
    } finally spark.conf.set("spark.graft.percentile.metadata", "true")
    // the lazily-built pack exists after the first answer
    assert(graft.store.SegmentFile.manifestVersions(path).lastOption.exists(
      v => Files.exists(java.nio.file.Paths.get(path, s"_graft_qs.v$v"))))
  }

  test("array percentages and looser accuracy answer; tighter refuses") {
    val path = tmpDir("acc")
    mkBase(path)
    val arr = KvCommands.table(spark, path)
      .agg(percentile_approx(col("x"), array(lit(0.1), lit(0.5), lit(0.99)),
        lit(10000)).as("ps"))
    assert(answersFromMetadata(arr))
    val ps = arr.first().getSeq[Long](0)
    assert(ps.length == 3 && ps(0) <= ps(1) && ps(1) <= ps(2))
    assertInBand(path, "x", 0.1, ps(0).toDouble)
    assertInBand(path, "x", 0.99, ps(2).toDouble)

    // looser-than-stored accuracy: the stored ε implies the requested ε
    val loose = KvCommands.table(spark, path)
      .agg(percentile_approx(col("x"), lit(0.5), lit(100)).as("p"))
    assert(answersFromMetadata(loose))
    assertInBand(path, "x", 0.5, loose.first().getLong(0).toDouble)

    // tighter-than-stored accuracy: the metadata never recorded that
    // bound — refuse to the scan
    val tight = KvCommands.table(spark, path)
      .agg(percentile_approx(col("x"), lit(0.5), lit(100000)).as("p"))
    assert(!answersFromMetadata(tight))
    assertInBand(path, "x", 0.5, tight.first().getLong(0).toDouble)
  }

  test("winners-only: upsert duplicates within a write rank only kept rows") {
    val path = tmpDir("upsert")
    // k collides heavily within ONE write; x of the loser rows is wildly
    // different (1e6 offset), so ranking any superseded row would throw
    // the median far outside the band over the 1500 live rows
    val df = spark.range(6000).select((col("id") % 1500).as("k"),
      when(col("id") < 4500, col("id") + 1000000L)
        .otherwise(col("id") % 97).as("x"))
    df.write.format("graftkv").option("key", "k").mode("overwrite").save(path)
    def q = KvCommands.table(spark, path)
      .agg(percentile_approx(col("x"), lit(0.5), lit(10000)).as("p"),
        count(lit(1)).as("cnt"))
    assert(answersFromMetadata(q))
    val r = q.first()
    assert(r.getLong(1) == 1500L)
    assert(r.getLong(0) < 97L + 1,
      s"median ${r.getLong(0)} ranked superseded rows")
    assertInBand(path, "x", 0.5, r.getLong(0).toDouble)
  }

  test("filters, grouping, overlap, tombstones, and snapshots refuse") {
    val path = tmpDir("refuse")
    mkBase(path)
    val t = KvCommands.table(spark, path)

    assert(!answersFromMetadata(t.filter(col("k") > 100)
      .agg(percentile_approx(col("x"), lit(0.5), lit(10000)).as("p"))))
    assert(!answersFromMetadata(t.groupBy(col("k") % 2)
      .agg(percentile_approx(col("x"), lit(0.5), lit(10000)).as("p"))))

    val v = graft.store.SegmentFile.currentVersion(path).get
    assert(!answersFromMetadata(KvCommands.tableAsOf(spark, path, v)
      .agg(percentile_approx(col("x"), lit(0.5), lit(10000)).as("p"))),
      "snapshot reads must not rewrite")

    KvCommands.append(spark.range(50).select(col("id").as("k"),
      col("id").as("x"), lit(1.0).as("d")), path)
    def q = t.agg(percentile_approx(col("x"), lit(0.5), lit(10000)).as("p"))
    assert(!answersFromMetadata(q),
      "overlapping generations must refuse (summaries rank superseded rows)")
    KvCommands.compact(spark, path)
    assert(answersFromMetadata(q), "compaction must restore the metadata path")
    assertInBand(path, "x", 0.5, q.first().getLong(0).toDouble)

    KvCommands.delete(spark, path, col("k") === 7)
    assert(!answersFromMetadata(q),
      "tombstoned tables must refuse (summaries rank deleted rows)")
    assertInBand(path, "x", 0.5, q.first().getLong(0).toDouble)
  }

  test("an all-null column answers null from metadata, like the scan") {
    val path = tmpDir("allnull")
    spark.range(500).select(col("id").as("k"),
      lit(null).cast("long").as("x"))
      .write.format("graftkv").option("key", "k").mode("overwrite").save(path)
    def q = KvCommands.table(spark, path)
      .agg(percentile_approx(col("x"), lit(0.5), lit(10000)).as("p"))
    assert(answersFromMetadata(q))
    assert(q.first().isNullAt(0))
    spark.conf.set("spark.graft.percentile.metadata", "false")
    try assert(q.first().isNullAt(0))
    finally spark.conf.set("spark.graft.percentile.metadata", "true")
  }

  test("fuzz: metadata percentiles stay in-band through random histories") {
    val rnd = new scala.util.Random(91)
    val path = tmpDir("fuzz")
    def mkBatch(base: Long, n: Int) =
      spark.range(n).select((col("id") + base).as("k"),
        ((col("id") * 37 + base) % 1000).as("x"))
    mkBatch(0, 3000).write.format("graftkv").option("key", "k")
      .option("segment.maxBytes", "16384").mode("overwrite").save(path)
    var hi = 3000L
    var fired = 0
    for (step <- 1 to 12) {
      rnd.nextInt(3) match {
        case 0 => // disjoint append (fresh key range)
          KvCommands.append(mkBatch(hi, 500 + rnd.nextInt(500)), path)
          hi += 1000
        case 1 => // overlapping append (rewrites live keys' x)
          KvCommands.append(mkBatch(rnd.nextLong(math.max(hi - 500, 1)), 300), path)
        case 2 => // delete a key slice (tombstones until compaction)
          val lo = rnd.nextLong(hi)
          KvCommands.delete(spark, path,
            col("k") >= lo && col("k") < lo + 200)
      }
      if (rnd.nextBoolean()) KvCommands.compact(spark, path)
      val p = math.rint(rnd.nextDouble() * 100) / 100.0
      val q = KvCommands.table(spark, path)
        .agg(percentile_approx(col("x"), lit(p), lit(10000)).as("v"))
      if (answersFromMetadata(q)) fired += 1
      val r = q.first()
      // whichever path answered, the ε-rank contract must hold over
      // the LIVE rows (metadata ranking a superseded or deleted row
      // would land far outside the band — x is remapped on overlap)
      if (!r.isNullAt(0))
        assertInBand(path, "x", p, r.getLong(0).toDouble)
      else assert(KvCommands.table(spark, path)
        .filter(col("x").isNotNull).isEmpty, s"step $step: null on data")
    }
    assert(fired >= 3, s"metadata path fired only $fired/12 — fuzz too weak")
  }

  test("a corrupt or truncated _graft_qs pack degrades to sidecars, never wrong") {
    val path = tmpDir("torn")
    mkBase(path)
    def q = KvCommands.table(spark, path)
      .agg(percentile_approx(col("x"), lit(0.5), lit(10000)).as("p"))
    assert(answersFromMetadata(q))
    val v = graft.store.SegmentFile.currentVersion(path).get
    val pack = java.nio.file.Paths.get(path, s"_graft_qs.v$v")
    assert(Files.exists(pack), "first answer must have built the pack")
    // torn write from a crashed builder: garbage bytes at the pack path
    Files.write(pack, Array.fill[Byte](37)(0x5a))
    graft.store.SegmentFile.clearPlanningCache()
    val r = q.first()
    assert(answersFromMetadata(q),
      "sidecar fallback must still answer from metadata")
    assertInBand(path, "x", 0.5, r.getLong(0).toDouble)
    // ... and the fallback REBUILDS a valid pack over the garbage
    graft.store.SegmentFile.clearPlanningCache()
    assert(answersFromMetadata(q))
  }

  test("summaries survive the append-compact maintenance cycle; index intact") {
    val path = tmpDir("cycle")
    mkBase(path)
    KvCommands.append(spark.range(300).select((col("id") + 50000).as("k"),
      (col("id") % 7).as("x"), lit(2.5).as("d")), path)
    KvCommands.compact(spark, path)
    def q = KvCommands.table(spark, path)
      .agg(percentile_approx(col("x"), lit(0.5), lit(10000)).as("p"),
        count(lit(1)).as("cnt"))
    assert(answersFromMetadata(q))
    val r = q.first()
    assert(r.getLong(1) == 20300L)
    assertInBand(path, "x", 0.5, r.getLong(0).toDouble)
    // the V11 section did not disturb the sparse index behind it: a
    // point lookup still seeks (readMeta withIndex=true steps over the
    // NDV and quantile sections to reach it)
    val seg = graft.store.SegmentFile.listSegments(path).head
    val full = graft.store.SegmentFile.readMeta(path,
      seg.file.stripSuffix(".kv"), withIndex = true)
    assert(full.index.nonEmpty, "sparse index lost behind the V11 section")
  }
}
