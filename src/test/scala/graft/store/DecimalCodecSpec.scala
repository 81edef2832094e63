package graft.store

import graft.TestSpark
import graft.codec.OrderedCodec
import graft.connector.KvCommands
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** DECIMAL in the kv codec: order-preservation properties for both
  * widths (p ≤ 18 → 8-byte sign-flipped unscaled long; wider → 16-byte
  * sign-extended two's complement), composite-prefix safety, and the
  * end-to-end storage paths (decimal values, decimal keys, row +
  * columnar readers). Metadata claims follow the V13 narrow/wide
  * split: narrow decimals (p ≤ 18) carry full zone/exact-SUM/NDV/
  * null-count claims over the unscaled long (exact in the value
  * domain); wide decimals (p > 18) carry min/max zone claims only —
  * SUM stays claim-or-nothing there because a 128-bit overflow would
  * silently wrap. Both halves are pinned below. */
class DecimalCodecSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val N = 1000

  private def keyBytes(dt: DecimalType, d: Decimal): Array[Byte] = {
    val schema = StructType(Seq(StructField("d", dt, nullable = false)))
    val codec = RowCodec(schema, Seq("d"))
    codec.encodeKey(
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](d)))
  }

  private def roundTrip(dt: DecimalType, d: Decimal): Decimal = {
    val schema = StructType(Seq(StructField("d", dt, nullable = false)))
    val codec = RowCodec(schema, Seq("d"))
    codec.decodeKey(keyBytes(dt, d))(0).asInstanceOf[Decimal]
  }

  test("narrow decimal (p<=18): round-trip and unsigned byte order") {
    val dt = DecimalType(12, 2)
    val r = new Random(9)
    def rnd(): Decimal =
      Decimal.createUnsafe(r.nextLong() % 1000000000000L, 12, 2)
    val interesting = Seq(0L, 1L, -1L, 999999999999L, -999999999999L)
      .map(Decimal.createUnsafe(_, 12, 2))
    for (d <- interesting) assert(roundTrip(dt, d) == d)
    for (_ <- 1 to N) {
      val (a, b) = (rnd(), rnd())
      assert(roundTrip(dt, a) == a)
      assert(Integer.signum(
        OrderedCodec.compare(keyBytes(dt, a), keyBytes(dt, b))) ==
        Integer.signum(a.compare(b)), s"$a vs $b")
    }
  }

  test("wide decimal (p>18): round-trip and unsigned byte order") {
    val dt = DecimalType(38, 4)
    val r = new Random(10)
    def rnd(): Decimal = {
      val digits = r.nextInt(38) + 1
      val sb = new StringBuilder
      if (r.nextBoolean()) sb.append('-')
      sb.append(('1' + r.nextInt(9)).toChar)
      (1 until digits).foreach(_ => sb.append(('0' + r.nextInt(10)).toChar))
      Decimal(new java.math.BigDecimal(
        new java.math.BigInteger(sb.toString), 4), 38, 4)
    }
    val zero = Decimal(new java.math.BigDecimal(java.math.BigInteger.ZERO, 4), 38, 4)
    assert(roundTrip(dt, zero) == zero)
    for (_ <- 1 to N) {
      val (a, b) = (rnd(), rnd())
      assert(roundTrip(dt, a) == a, s"round-trip $a")
      assert(Integer.signum(
        OrderedCodec.compare(keyBytes(dt, a), keyBytes(dt, b))) ==
        Integer.signum(a.compare(b)), s"$a vs $b")
    }
  }

  test("composite keys with a decimal dimension stay prefix-safe") {
    // fixed-width decimal encodings: (dec, long) composite byte order
    // must equal lexicographic value order
    val schema = StructType(Seq(
      StructField("d", DecimalType(12, 2), nullable = false),
      StructField("k", LongType, nullable = false)))
    val codec = RowCodec(schema, Seq("d", "k"))
    val r = new Random(11)
    def row(unscaled: Long, k: Long) =
      codec.encodeKey(
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](Decimal.createUnsafe(unscaled, 12, 2), k)))
    for (_ <- 1 to N) {
      val (u1, k1) = (r.nextLong() % 100000L, r.nextLong() % 1000L)
      val (u2, k2) = (r.nextLong() % 100000L, r.nextLong() % 1000L)
      val want = if (u1 != u2) java.lang.Long.compare(u1, u2)
        else java.lang.Long.compare(k1, k2)
      assert(Integer.signum(OrderedCodec.compare(row(u1, k1), row(u2, k2))) ==
        Integer.signum(want), s"($u1,$k1) vs ($u2,$k2)")
    }
  }

  test("decimal keys: point lookup, range scan, and key-aggregation") {
    val path = java.nio.file.Files
      .createTempDirectory("graftkv_dec_key").toString + "/t"
    val df = spark.range(1000).select(
      expr("CAST(CAST(id AS DECIMAL(12,2)) / 4 AS DECIMAL(12,2))").as("price"),
      col("id").as("v"))
    KvCommands.createTable(df, path, Seq("price"))
    val t = KvCommands.table(spark, path)
    assert(t.count() == 1000)
    // point lookup through the pushed filter (exact decimal equality)
    val one = t.filter(col("price") === expr("CAST(2.50 AS DECIMAL(12,2))"))
      .collect()
    assert(one.length == 1 && one.head.getLong(1) == 10L)
    // range over the decimal lead: byte order == value order
    assert(t.filter(col("price") >= 100 && col("price") < 150).count() == 200)
    // MIN/MAX of the decimal lead key (metadata or scan — must be exact)
    val mm = t.agg(min(col("price")), max(col("price"))).head()
    assert(mm.getDecimal(0).compareTo(new java.math.BigDecimal("0.00")) == 0)
    assert(mm.getDecimal(1).compareTo(new java.math.BigDecimal("249.75")) == 0)
    KvCommands.dropTable(path)
  }

  test("decimal values: nulls, upsert, wide precision, columnar ≡ row") {
    val path = java.nio.file.Files
      .createTempDirectory("graftkv_dec_val").toString + "/t"
    val df = spark.range(500).select(col("id").as("k"),
      when(col("id") % 7 === 0, lit(null))
        .otherwise(expr("CAST(CAST(id AS DECIMAL(20,3)) * " +
          "CAST(10000000000 AS DECIMAL(20,0)) AS DECIMAL(38,3))"))
        .as("big"),
      expr("CAST(CAST(id AS DECIMAL(10,2)) / 2 AS DECIMAL(10,2))").as("small"))
    KvCommands.createTable(df, path, Seq("k"))
    val t = KvCommands.table(spark, path)
    assert(t.filter(col("big").isNull).count() == math.ceil(500.0 / 7).toLong)
    val r10 = t.filter(col("k") === 10).head()
    assert(r10.getDecimal(2).compareTo(new java.math.BigDecimal("5.00")) == 0)
    assert(r10.getDecimal(1).compareTo(
      new java.math.BigDecimal("100000000000.000")) == 0)
    // upsert replaces the decimal cell (Put semantics)
    KvCommands.append(spark.range(10, 11).select(col("id").as("k"),
      expr("CAST(42.125 AS DECIMAL(38,3))").as("big"),
      expr("CAST(1.25 AS DECIMAL(10,2))").as("small")), path)
    val upd = KvCommands.table(spark, path).filter(col("k") === 10).head()
    assert(upd.getDecimal(1).compareTo(new java.math.BigDecimal("42.125")) == 0)
    assert(upd.getDecimal(2).compareTo(new java.math.BigDecimal("1.25")) == 0)
    // narrow decimals carry V13 zone claims — after compaction restores
    // the gate, MIN answers from metadata; WIDE decimals (p > 18) have
    // no zone form and refuse to the scan (claim-or-nothing)
    KvCommands.compact(spark, path) // restore disjointness first
    val qNarrow = KvCommands.table(spark, path).agg(min(col("small")).as("mn"))
    assert(qNarrow.queryExecution.executedPlan.toString.contains("GraftKvAggScan"),
      "narrow-decimal MIN must answer from V13 zone metadata")
    assert(qNarrow.head().getDecimal(0)
      .compareTo(new java.math.BigDecimal("0.00")) == 0) // id 0 → 0.00
    val qWide = KvCommands.table(spark, path).agg(min(col("big")).as("mn"))
    assert(!qWide.queryExecution.executedPlan.toString.contains("GraftKvAggScan"),
      "wide-decimal MIN must refuse the metadata path (no zone form)")
    qWide.collect()
    KvCommands.dropTable(path)
  }

  test("decimal metadata claims: exact SUM/MIN/MAX/COUNT + NDV, zero data bytes") {
    val path = java.nio.file.Files
      .createTempDirectory("graftkv_dec_meta").toString + "/t"
    // money = k/4 at scale 2, NULL every 10th row; 500 rows bulk-loaded
    // (disjoint, tombstone-free: every claim gate holds)
    val df = spark.range(500).select(col("id").as("k"),
      when(col("id") % 10 === 0, lit(null))
        .otherwise(expr("CAST(CAST(id AS DECIMAL(12,2)) / 4 AS DECIMAL(12,2))"))
        .as("money"))
    KvCommands.createTable(df, path, Seq("k"),
      maxSegBytes = Some(4096L)) // several segments → a real merge
    val t = KvCommands.table(spark, path)
    // a null suppresses its segment's zone entry (a zone is a TOTAL
    // claim), so SUM/MIN/MAX fall back to the scan here and must still
    // be exact — the null-free corpus below asserts the metadata path
    val q = t.agg(sum(col("money")).as("s"), min(col("money")).as("mn"),
      max(col("money")).as("mx"), count(col("money")).as("c"))
    val vals = q.head()
    val expSum = (0 until 500).filter(_ % 10 != 0)
      .map(i => java.math.BigDecimal.valueOf(i * 25L, 2))
      .foldLeft(java.math.BigDecimal.ZERO)(_ add _)
    assert(vals.getDecimal(0).compareTo(expSum) == 0)
    assert(vals.getLong(3) == 450L)
    KvCommands.dropTable(path)

    // null-free corpus: every claim publishes and the whole mixed
    // aggregate answers from metadata — zero data bytes
    val path2 = java.nio.file.Files
      .createTempDirectory("graftkv_dec_meta2").toString + "/t"
    val df2 = spark.range(500).select(col("id").as("k"),
      expr("CAST(CAST(id AS DECIMAL(12,2)) / 4 AS DECIMAL(12,2))").as("money"))
    KvCommands.createTable(df2, path2, Seq("k"), maxSegBytes = Some(4096L))
    assert(graft.store.SegmentFile.listSegments(path2).length > 1,
      "need a multi-segment table for a real claim merge")
    val t2 = KvCommands.table(spark, path2)
    val q2 = t2.agg(sum(col("money")).as("s"), min(col("money")).as("mn"),
      max(col("money")).as("mx"), count(col("money")).as("c"),
      count(lit(1)).as("all"))
    assert(q2.queryExecution.executedPlan.toString.contains("GraftKvAggScan"),
      "null-free decimal SUM/MIN/MAX/COUNT must answer from metadata:\n" +
        q2.queryExecution.executedPlan.toString.take(1500))
    val r2 = q2.head()
    val expSum2 = (0 until 500).map(i => java.math.BigDecimal.valueOf(i * 25L, 2))
      .foldLeft(java.math.BigDecimal.ZERO)(_ add _)
    assert(r2.getDecimal(0).compareTo(expSum2) == 0, s"sum ${r2.getDecimal(0)}")
    assert(r2.getDecimal(1).compareTo(new java.math.BigDecimal("0.00")) == 0)
    assert(r2.getDecimal(2).compareTo(new java.math.BigDecimal("124.75")) == 0)
    assert(r2.getLong(3) == 500L && r2.getLong(4) == 500L)
    // NDV from merged V13 sketches (approx_count_distinct rewrite):
    // 500 distinct money values, 5% rsd band
    val ndv = t2.agg(approx_count_distinct(col("money")).as("n")).head().getLong(0)
    assert(math.abs(ndv - 500L) <= 500 * 0.15, s"decimal ndv: $ndv")
    // value-zone pruning: money correlates with the key, so a pushed
    // decimal range should skip most segments
    val narrow = t2.filter(col("money") > 100 && col("money") <= 110)
    assert(narrow.count() == 40L)
    narrow.collect()
    val rep = KvCommands.pruningReport(narrow).head()
    assert(rep.getAs[Long]("segments_read") < rep.getAs[Long]("segments_live"),
      s"decimal zones pruned nothing: $rep")
    KvCommands.dropTable(path2)
  }

  test("wide decimal (p>18) zones: pruning + metadata MIN/MAX, SUM refused") {
    // a DECIMAL(38,6) revenue column gets V14 16-byte min/max zone
    // entries: pushed ranges prune segments, whole-table MIN/MAX
    // answers from metadata — but SUM never pushes (no exact-Long
    // claim exists at this width; claim-or-nothing)
    val path = java.nio.file.Files
      .createTempDirectory("graftkv_dec_wide").toString + "/t"
    val df = spark.range(2000).select(col("id").as("k"),
      expr("CAST(concat(cast(id * 1000 as string), '.000001') " +
        "AS DECIMAL(38,6))").as("rev"))
    KvCommands.createTable(df, path, Seq("k"), maxSegBytes = Some(8192L))
    assert(SegmentFile.listSegments(path).length > 1)
    val t = KvCommands.table(spark, path)
    // min/max from metadata (zero data bytes)
    val q = t.agg(min(col("rev")).as("mn"), max(col("rev")).as("mx"),
      count(lit(1)).as("c"))
    assert(q.queryExecution.executedPlan.toString.contains("GraftKvAggScan"),
      "wide-decimal MIN/MAX must answer from V14 zones:\n" +
        q.queryExecution.executedPlan.toString.take(1200))
    val r = q.head()
    assert(r.getDecimal(0).compareTo(new java.math.BigDecimal("0.000001")) == 0)
    assert(r.getDecimal(1).compareTo(new java.math.BigDecimal("1999000.000001")) == 0)
    assert(r.getLong(2) == 2000L)
    // SUM must NOT push: the same aggregate with a SUM degrades to the
    // scan — and is still exact
    val qs = t.agg(sum(col("rev")).as("s"), min(col("rev")).as("mn"))
    assert(!qs.queryExecution.executedPlan.toString.contains("GraftKvAggScan"),
      "wide-decimal SUM must never answer from claims")
    val expSum = (0 until 2000)
      .map(i => new java.math.BigDecimal(s"${i * 1000}.000001"))
      .foldLeft(java.math.BigDecimal.ZERO)(_ add _)
    assert(qs.head().getDecimal(0).compareTo(expSum) == 0)
    // zone pruning on a pushed wide-decimal range (rev tracks the key)
    val narrow = t.filter(col("rev") > 1000000 && col("rev") <= 1100000)
    assert(narrow.count() == 100L)
    narrow.collect()
    val rep = KvCommands.pruningReport(narrow).head()
    assert(rep.getAs[Long]("segments_read") < rep.getAs[Long]("segments_live"),
      s"wide-decimal zones pruned nothing: $rep")
    KvCommands.dropTable(path)
  }

  test("decimal metadata percentiles: unscaled GK summaries + exactness guard") {
    // narrow-decimal money column: whole-table percentile_approx
    // answers from merged per-segment summaries (plan is a
    // LocalTableScan — zero data bytes) and the answer is an exact
    // cents value satisfying the ε-rank contract
    val path = java.nio.file.Files
      .createTempDirectory("graftkv_dec_qs").toString + "/t"
    val df = spark.range(2000).select(col("id").as("k"),
      expr("CAST(CAST(id AS DECIMAL(12,2)) / 4 AS DECIMAL(12,2))").as("money"))
    KvCommands.createTable(df, path, Seq("k"), maxSegBytes = Some(8192L))
    assert(SegmentFile.listSegments(path).length > 1)
    val t = KvCommands.table(spark, path)
    val q = t.agg(
      percentile_approx(col("money"), lit(0.5), lit(10000)).as("p50"),
      count(lit(1)).as("c"))
    assert(q.queryExecution.executedPlan.toString.contains("LocalTableScan"),
      "decimal percentile must answer from metadata:\n" +
        q.queryExecution.executedPlan.toString.take(1200))
    val row = q.head()
    assert(row.getLong(1) == 2000L)
    val p50 = row.getDecimal(0)
    // exact value domain: every column value is a multiple of 0.25
    assert(p50.unscaledValue().longValueExact() % 25 == 0,
      s"metadata percentile $p50 is not a value the column contains")
    // ε-rank contract vs the known truth money=k/4: rank(answer) within
    // ε·N (+1) of 0.5·N
    val rank = (0 until 2000).count(i =>
      java.math.BigDecimal.valueOf(i * 25L, 2).compareTo(p50) <= 0)
    val eps = SegmentFile.QsRelativeError
    assert(math.abs(rank - 1000) <= 2000 * eps + 1, s"rank $rank for $p50")
    // a TIGHTER-than-stored accuracy refuses the metadata and scans
    val tight = t.agg(
      percentile_approx(col("money"), lit(0.5), lit(100000)).as("p"))
    assert(!tight.queryExecution.executedPlan.toString.contains("LocalTableScan"),
      "tighter-than-stored accuracy must refuse the metadata answer")
    KvCommands.dropTable(path)

    // exactness guard: unscaled values beyond 2^53 poison the segment's
    // claim (the long→double round-trip is lossy there), so the
    // metadata path refuses and the query scans
    val path2 = java.nio.file.Files
      .createTempDirectory("graftkv_dec_qs2").toString + "/t"
    val df2 = spark.range(500).select(col("id").as("k"),
      // odd values just above 2^53 = 9007199254740992: none
      // representable in a double
      expr("CAST(9007199254740993 + id * 2 AS DECIMAL(18,0))").as("big"))
    KvCommands.createTable(df2, path2, Seq("k"), maxSegBytes = Some(8192L))
    val t2 = KvCommands.table(spark, path2)
    val q2 = t2.agg(
      percentile_approx(col("big"), lit(0.5), lit(10000)).as("p"))
    assert(!q2.queryExecution.executedPlan.toString.contains("LocalTableScan"),
      "poisoned decimal summaries must degrade the percentile to a scan")
    KvCommands.dropTable(path2)
  }
}
