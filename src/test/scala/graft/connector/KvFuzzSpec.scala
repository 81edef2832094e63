package graft.connector

import graft.TestSpark
import java.nio.file.Files
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Differential fuzzing of the kv read path: a fixed-seed stream of
  * random predicates runs against the SAME data stored as graftkv (both
  * codecs) and as parquet; result sets must be identical. This sweeps
  * the whole pruning/seek/decode surface — critical-point ranges,
  * IN-list re-seeks, dimension descent, bloom pruning, residual
  * re-evaluation, columnar batch decode — with predicate shapes no
  * hand-written case covers. */
class KvFuzzSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private lazy val parquet: DataFrame =
    graft.Tables.table(spark, sf, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")

  private lazy val kvPaths: Map[String, String] = {
    // (l_orderkey, l_linenumber) is not unique in the synthetic corpus;
    // under Put semantics the twins would collapse, so the key gets a
    // deterministic uniquifying rank dimension (multiset-in-KV pattern)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("l_orderkey", "l_linenumber")
      .orderBy("l_quantity", "l_returnflag")
    val keyed = parquet.withColumn("l_uid", row_number().over(w))
    Seq(graft.store.RowCodec.Binary, graft.store.RowCodec.StringFormat).map { enc =>
      val p = Files.createTempDirectory(s"graftkv_fuzz_$enc").toString + "/t"
      KvCommands.createTable(keyed, p,
        Seq("l_orderkey", "l_linenumber", "l_uid"), enc)
      enc -> p
    }.toMap
  }

  /** Random predicate over the composite key + a residual column. The
    * generator leans on the shapes the pruning algebra claims to handle
    * exactly: points, ranges, IN-lists, disjunctions, negations, and
    * conjunctions that pin the lead dim (dimension descent). */
  private def randomPredicate(rnd: scala.util.Random, maxKey: Long): Column = {
    def lead = col("l_orderkey")
    def second = col("l_linenumber")
    def qty = col("l_quantity")
    def k(): Long = rnd.nextLong(maxKey + 100) // sometimes out of domain
    rnd.nextInt(10) match {
      case 0 => lead === k()
      case 1 => lead.between(k(), k())
      case 2 => lead.isin(Seq.fill(rnd.nextInt(6) + 1)(k()): _*)
      case 3 => lead > k() && lead <= k()
      case 4 => !lead.between(k(), k())
      case 5 => lead < k() || lead > k()
      case 6 => second === (rnd.nextInt(9) + 1) // beyond domain sometimes
      case 7 => lead === k() && second > rnd.nextInt(5)
      case 8 => lead.between(k(), k()) && qty < rnd.nextInt(60)
      case 9 => (lead === k() || lead === k()) && second =!= rnd.nextInt(7)
    }
  }

  test("random predicates over a 3-part key with a string middle dimension") {
    // (user_id, event_type, event_id): exercises string-dim blooms,
    // dimension descent through a string middle, and mixed residuals
    val ev = graft.Tables.table(spark, sf, "events")
      .select("user_id", "event_type", "event_id", "value", "props")
    val path = Files.createTempDirectory("graftkv_fuzz_ev").toString + "/t"
    KvCommands.createTable(ev, path, Seq("user_id", "event_type", "event_id"))
    val kv = KvCommands.table(spark, path)
    val types = Seq("click", "view", "purchase", "scroll", "login", "absent")
    val maxUser = ev.agg(max("user_id")).head().getLong(0)
    val rnd = new scala.util.Random(7)
    def u(): Long = rnd.nextLong(maxUser + 10)
    val preds: Seq[Column] = Seq.fill(40)(rnd.nextInt(9) match {
      case 0 => col("user_id") === u()
      case 1 => col("user_id") === u() && col("event_type") === types(rnd.nextInt(6))
      case 2 => col("event_type").isin(Seq.fill(rnd.nextInt(3) + 1)(
        types(rnd.nextInt(6))): _*)
      case 3 => col("user_id").between(u(), u())
      case 4 => col("user_id") === u() && col("event_type") === types(rnd.nextInt(6)) &&
        col("event_id") > rnd.nextLong(10000)
      case 5 => !(col("event_type") === types(rnd.nextInt(6)))
      case 6 => col("user_id") < u() && col("value") >= rnd.nextDouble() * 100
      // VALUE-string residuals: exercise the V12 string zone bounds
      // differentially (equality, range, and a negated range)
      case 7 => col("props") === s"""{"k": ${rnd.nextInt(120)}}"""
      case 8 =>
        val cut = s"""{"k": ${rnd.nextInt(120)}"""
        if (rnd.nextBoolean()) col("props") > cut else !(col("props") <= cut)
    })
    preds.zipWithIndex.foreach { case (p, i) =>
      val exp = ev.filter(p).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3),
          r.getString(4))).toSet
      val got = kv.filter(p).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3),
          r.getString(4))).toSet
      assert(got == exp, s"predicate #$i [$p]: kv=${got.size}, parquet=${exp.size}")
    }
  }

  for (enc <- Seq(graft.store.RowCodec.Binary, graft.store.RowCodec.StringFormat))
  test(s"random upsert/delete/compaction sequences match a reference model ($enc)") {
    // the generation machinery (Put-upsert merge, tombstones, minor
    // compaction) under a random op stream, checked after every op
    // against a driver-side Map — the simplest possible truth. Run for
    // both codecs: the merge resolves key equality through the table's
    // comparator, which is typed (not byte-wise) under stringformat.
    import spark.implicits._
    val path = Files.createTempDirectory(s"graftkv_fuzz_ud_$enc").toString + "/t"
    val rnd = new scala.util.Random(1234)
    val model = scala.collection.mutable.Map.empty[Long, String]
    def randomBatch(): Seq[(Long, String)] =
      Seq.fill(rnd.nextInt(40) + 10)(
        (rnd.nextLong(100), s"v${rnd.nextInt(100000)}"))
    // within one batch, the LAST occurrence of a key is the winner both
    // in the engine (sorted-adjacent, later row wins only if the sort is
    // stable — it is not) and the model; avoid ambiguity by keeping one
    // row per key per batch
    def distinctBatch(): Seq[(Long, String)] =
      randomBatch().groupBy(_._1).map(_._2.head).toSeq
    val initial = distinctBatch()
    initial.foreach { case (k, v) => model(k) = v }
    KvCommands.createTable(initial.toDF("k", "v"), path, Seq("k"), enc)
    for (step <- 0 until 12) {
      rnd.nextInt(4) match {
        case 0 | 1 => // upsert append
          val b = distinctBatch()
          b.foreach { case (k, v) => model(k) = v }
          KvCommands.append(b.toDF("k", "v"), path)
        case 2 => // range delete
          val lo = rnd.nextLong(100)
          val hi = lo + rnd.nextLong(30)
          model.keys.filter(k => k >= lo && k <= hi).toSeq.foreach(model.remove)
          KvCommands.delete(spark, path, col("k").between(lo, hi))
        case 3 =>
          KvCommands.compactMinor(spark, path, retainReplacedMs = 0L)
      }
      val got = KvCommands.table(spark, path).collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(got == model.toMap, s"divergence after step $step")
    }
    // final compaction must preserve the state exactly
    KvCommands.compactMinor(spark, path, retainReplacedMs = 0L)
    val fin = KvCommands.table(spark, path).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fin == model.toMap)
    assert(KvCommands.overlapDepth(path) == 1)
  }

  test("random topN queries match parquet on disjoint AND overlapping layouts") {
    // many-segment disjoint fixture + an overlapping-append variant (the
    // selection must apply on the first and fall back on the second,
    // with identical results either way)
    val base = spark.range(20000).coalesce(1)
      .select(col("id").as("k1"), (col("id") % 7).cast("int").as("k2"),
        (col("id") % 997).as("v"))
    val disjoint = Files.createTempDirectory("kv_topn_fz_d").toString + "/t"
    KvCommands.createTable(base, disjoint, Seq("k1", "k2"),
      maxSegBytes = Some(16384L))
    // stringformat variant: selection boundaries compare through the
    // TYPED key comparators, not byte order
    val strFmt = Files.createTempDirectory("kv_topn_fz_s").toString + "/t"
    KvCommands.createTable(base, strFmt, Seq("k1", "k2"),
      encoding = graft.store.RowCodec.StringFormat,
      maxSegBytes = Some(16384L))
    val overlapping = Files.createTempDirectory("kv_topn_fz_o").toString + "/t"
    KvCommands.createTable(base, overlapping, Seq("k1", "k2"),
      maxSegBytes = Some(16384L))
    // overlapping generations: rewrite two key stripes (last-write-wins)
    spark.range(300).coalesce(1)
      .select((col("id") * 61).as("k1"), (col("id") % 7).cast("int").as("k2"),
        lit(-1L).as("v"))
      .write.format("graftkv").option("key", "k1,k2").mode("append")
      .save(overlapping)
    val overRef = base.alias("b")
      .join(spark.range(300).select((col("id") * 61).as("k1"),
        (col("id") % 7).cast("int").as("k2")).alias("o"),
        Seq("k1", "k2"), "left_anti")
      .union(spark.range(300).select((col("id") * 61).as("k1"),
        (col("id") % 7).cast("int").as("k2"), lit(-1L).as("v"))
        .filter(col("k1") < 20000))
    val rnd = new scala.util.Random(11)
    for (round <- 0 until 25) {
      val k = rnd.nextInt(60) + 1
      val desc = rnd.nextBoolean()
      val depth = rnd.nextInt(2) + 1 // prefix length 1 or 2
      val filt: Option[Column] = rnd.nextInt(3) match {
        case 0 => None
        case 1 => Some(col("k1") >= rnd.nextLong(22000))
        case 2 => Some(col("k1").between(rnd.nextLong(22000), rnd.nextLong(22000)))
      }
      val order = Seq("k1", "k2").take(depth)
        .map(c => if (desc) col(c).desc else col(c).asc)
      def run(df: DataFrame): Seq[Seq[Any]] = {
        val f = filt.map(df.filter).getOrElse(df)
        // compare the sorted prefix-value lists: deterministic under
        // boundary ties, which full-row top-k is not
        f.orderBy(order: _*).limit(k)
          .select(Seq("k1", "k2").take(depth).map(col): _*)
          .collect().toSeq.map(_.toSeq)
      }
      assert(run(KvCommands.table(spark, disjoint)) == run(base),
        s"round $round (k=$k desc=$desc depth=$depth filt=$filt) disjoint")
      assert(run(KvCommands.table(spark, strFmt)) == run(base),
        s"round $round (k=$k desc=$desc depth=$depth filt=$filt) stringformat")
      assert(run(KvCommands.table(spark, overlapping)) == run(overRef),
        s"round $round (k=$k desc=$desc depth=$depth filt=$filt) overlapping")
    }
  }

  test("random predicates: kv scans equal parquet under both codecs") {
    val maxKey = parquet.agg(max("l_orderkey")).head().getLong(0)
    val rnd = new scala.util.Random(42)
    val preds = Seq.fill(40)(randomPredicate(rnd, maxKey))
    val expected = preds.map(p =>
      parquet.filter(p).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getString(3)))
        .toSet)
    for ((enc, path) <- kvPaths) {
      val kv = KvCommands.table(spark, path)
      preds.zip(expected).zipWithIndex.foreach { case ((p, exp), i) =>
        val got = kv.filter(p).collect()
          .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getString(3)))
          .toSet
        assert(got == exp,
          s"predicate #$i [$p] on $enc: kv=${got.size} rows, parquet=${exp.size}")
      }
    }
  }

  test("random DECIMAL predicates: lead decimal key + wide decimal value") {
    // sweeps the decimal families end-to-end: the order-preserving
    // narrow-decimal KEY codec (seek bounds, sparse index, critical
    // points), V13 narrow + V14 wide VALUE zones, and the
    // no-silent-rounding filter guard (finer-scale literals must
    // change nothing but the amount of pruning). Binary codec only —
    // stringformat does not store decimals.
    val base = spark.range(8000).select(
      expr("CAST(CAST((id * 37) % 10000 AS DECIMAL(12,2)) / 100 " +
        "AS DECIMAL(12,2))").as("d"), // 0.00 … 99.99, exact cents
      col("id").as("k"),
      expr("CAST(concat(cast(id % 500 as string), '.000123') " +
        "AS DECIMAL(38,6))").as("w"))
    val pqPath = Files.createTempDirectory("graftkv_decfuzz_pq").toString
    base.write.mode("overwrite").parquet(pqPath)
    val pq = spark.read.parquet(pqPath)
    val kvPath = Files.createTempDirectory("graftkv_decfuzz").toString + "/t"
    KvCommands.createTable(pq, kvPath, Seq("d", "k"),
      maxSegBytes = Some(32768L))
    val kv = KvCommands.table(spark, kvPath)

    val rnd = new scala.util.Random(77)
    def cents(): Column = // on- and off-grid, sometimes out of domain
      lit(java.math.BigDecimal.valueOf(rnd.nextLong(10500), 2))
    def fine(): Column = // finer scale than the column — must not round
      lit(java.math.BigDecimal.valueOf(rnd.nextLong(105000), 3))
    def wide(): Column =
      lit(new java.math.BigDecimal(s"${rnd.nextInt(520)}.000123"))
    def p(): Column = rnd.nextInt(10) match {
      case 0 => col("d") === cents()
      case 1 => col("d").between(cents(), cents())
      case 2 => col("d") > cents() && col("d") <= cents()
      case 3 => col("d").isin(Seq.fill(rnd.nextInt(5) + 1)(
        java.math.BigDecimal.valueOf(rnd.nextLong(10500), 2)): _*)
      case 4 => !col("d").between(cents(), cents())
      case 5 => col("d") > fine() // exclusive bound at finer scale
      case 6 => col("d") <= fine() || col("d") === cents()
      case 7 => col("w") < wide()
      case 8 => col("w").between(wide(), wide())
      case 9 => col("d").between(cents(), cents()) && col("w") >= wide()
    }
    val preds = Seq.fill(60)(p())
    preds.zipWithIndex.foreach { case (pred, i) =>
      def shape(r: org.apache.spark.sql.Row) =
        (r.getAs[java.math.BigDecimal]("d"), r.getAs[Long]("k"),
          r.getAs[java.math.BigDecimal]("w"))
      val exp = pq.filter(pred).collect().map(shape).toSet
      val got = kv.filter(pred).collect().map(shape).toSet
      assert(got == exp,
        s"decimal predicate #$i [$pred]: kv=${got.size}, parquet=${exp.size}")
    }
    KvCommands.dropTable(kvPath)
  }
}
