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
}
