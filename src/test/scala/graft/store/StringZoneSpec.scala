package graft.store

import graft.TestSpark
import graft.connector.KvCommands
import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** V12 string zone maps: per-segment [min,max] string bounds in UTF-8
  * byte order — value-string segment pruning (residual + runtime),
  * metadata MIN/MAX answers for exact claims, truncation claims for
  * pathological strings (sound for pruning, refused for answers). */
class StringZoneSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmpDir(tag: String): String =
    Files.createTempDirectory(s"graftkv_szone_$tag").toString + "/t"

  private def aggPlan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  // ── truncation claim properties ────────────────────────────────────────

  private def byteLt(a: String, b: String): Boolean =
    graft.codec.OrderedCodec.compareUtf8(a, b) < 0

  test("truncation claims bound every value in UTF-8 byte order") {
    val rnd = new scala.util.Random(17)
    // VALID UTF-16 only (what UTF8String delivers): single chars plus a
    // complete surrogate pair appended atomically
    val singles = "abz09é中"
    def randStr(n: Int): String = {
      val sb = new StringBuilder
      var cps = 0
      while (cps < n) {
        if (rnd.nextInt(8) == 0) sb.append("😀")
        else sb.append(singles.charAt(rnd.nextInt(singles.length)))
        cps += 1
      }
      sb.toString
    }
    for (_ <- 1 to 300) {
      val s = randStr(rnd.nextInt(200) + 1)
      val (lo, loEx) = SegmentFile.StringZone.lowerBound(s)
      assert(!byteLt(s, lo), s"lower bound above value: '$lo' vs '$s'")
      assert(loEx == (s.codePointCount(0, s.length) <= 64))
      SegmentFile.StringZone.upperBound(s).foreach { case (hi, hiEx) =>
        assert(!byteLt(hi, s), s"upper bound below value: '$hi' vs '$s'")
        assert(hiEx == (s.codePointCount(0, s.length) <= 64))
      }
    }
    // the all-U+10FFFF prefix has no representable upper bound
    val maxed = new String(Character.toChars(0x10FFFF)) * 70
    assert(SegmentFile.StringZone.upperBound(maxed).isEmpty)
    // increment skips the surrogate range: U+D7FF bumps to U+E000
    val edge = "x" * 63 + "퟿" + "tail-making-it-long-enough-to-truncate"
    val (hi, _) = SegmentFile.StringZone.upperBound(edge).get
    assert(hi.codePointAt(hi.offsetByCodePoints(0,
      hi.codePointCount(0, hi.length) - 1)) == 0xE000)
  }

  // ── pruning ────────────────────────────────────────────────────────────

  test("a pushed string-value filter prunes segments via zone bounds") {
    val path = tmpDir("prune")
    // s correlates with key order: each lead-disjoint segment covers a
    // narrow zone of s values
    spark.range(20000).select(col("id").as("k"),
      concat(lit("grp-"), lpad(expr("id div 5000").cast("string"), 3, "0"))
        .as("s"))
      .write.format("graftkv").option("key", "k")
      .option("segment.maxBytes", "65536").mode("overwrite").save(path)
    val t = KvCommands.table(spark, path)
    val whole = t.filter(col("k") >= 0)
    whole.collect()
    val wholeSegs = KvCommands.pruningReport(whole).head()
      .getAs[Long]("segments_read")
    assert(wholeSegs >= 3, s"need several segments, got $wholeSegs")
    val narrow = t.filter(col("s") === "grp-000")
    assert(narrow.count() == 5000L)
    narrow.collect()
    val narrowSegs = KvCommands.pruningReport(narrow).head()
      .getAs[Long]("segments_read")
    assert(narrowSegs < wholeSegs,
      s"string zones pruned nothing: $wholeSegs -> $narrowSegs")
    // range form prunes too, and stays exact
    assert(t.filter(col("s") > "grp-002").count() == 5000L)
  }

  // ── metadata MIN/MAX ───────────────────────────────────────────────────

  test("MIN/MAX of a short string column answers from metadata, exactly") {
    val path = tmpDir("minmax")
    spark.range(10000).select(col("id").as("k"),
      concat(lit("v"), lpad((col("id") % 977).cast("string"), 4, "0")).as("s"))
      .write.format("graftkv").option("key", "k")
      .option("segment.maxBytes", "65536").mode("overwrite").save(path)
    val q = KvCommands.table(spark, path)
      .agg(min(col("s")).as("mn"), max(col("s")).as("mx"),
        count(lit(1)).as("cnt"))
    assert(aggPlan(q).contains("GraftKvAggScan"),
      "string MIN/MAX did not take the metadata path")
    val r = q.first()
    assert(r.getString(0) == "v0000" && r.getString(1) == "v0976")
    assert(r.getLong(2) == 10000L)
  }

  test("truncated claims refuse the MIN/MAX answer but keep pruning sound") {
    val path = tmpDir("long")
    // >64-codepoint strings: claims truncate → inexact
    spark.range(8000).select(col("id").as("k"),
      concat(lit("p" * 70), lpad(expr("id div 2000").cast("string"), 2, "0"))
        .as("s"))
      .write.format("graftkv").option("key", "k")
      .option("segment.maxBytes", "65536").mode("overwrite").save(path)
    val t = KvCommands.table(spark, path)
    val q = t.agg(min(col("s")).as("mn"), max(col("s")).as("mx"))
    assert(!aggPlan(q).contains("GraftKvAggScan"),
      "truncated string claims must refuse the metadata MIN/MAX")
    // the scan fallback stays exact
    val r = q.first()
    assert(r.getString(0).endsWith("00") && r.getString(1).endsWith("03"))
    // and the truncated interval still covers every value: no row lost
    // under a pushed equality (claims are bounds, truncation only
    // loosens them — all values share the 64-cp prefix, so nothing
    // can be pruned, only never wrongly dropped)
    assert(t.filter(col("s") === "p" * 70 + "02").count() == 2000L)
  }

  test("stringzone.maxchars table property deepens the truncation cap") {
    val path = tmpDir("cap")
    val prefix = "https://example.com/very/long/shared/path/prefix/" +
      "0123456789/0123456789/" // 72 codepoints — past the 64 default
    spark.range(8000).select(col("id").as("k"),
      concat(lit(prefix), lpad(expr("id div 2000").cast("string"), 2, "0"))
        .as("s"))
      .write.format("graftkv").option("key", "k")
      .option("stringzone.maxchars", "100")
      .option("segment.maxBytes", "65536").mode("overwrite").save(path)
    // the property persists into the table meta (appends honor it
    // without restating)
    assert(graft.connector.GraftKvMeta.read(path).get
      .props(graft.connector.GraftKvMeta.StringZoneMaxCharsProp) == "100")
    // at the deeper cap the bounds are EXACT values, so metadata MIN/MAX
    // answers (at the 64 default this corpus collapses to one shared
    // truncated claim — useless bounds, see the test above)
    val t = KvCommands.table(spark, path)
    assert(SegmentFile.listSegments(path).forall(_.zoneStats.exists(z =>
      z.name == "s" && z.exact)), "configured cap must make claims exact")
    val q = t.agg(min(col("s")).as("mn"), max(col("s")).as("mx"))
    assert(aggPlan(q).contains("GraftKvAggScan"),
      "exact deep-cap bounds must take the metadata MIN/MAX path")
    val r = q.first()
    assert(r.getString(0) == prefix + "00" && r.getString(1) == prefix + "03")
    // and the deeper bounds prune a shared-prefix point predicate the
    // default cap could not tell apart
    val narrow = t.filter(col("s") === (prefix + "00"))
    assert(narrow.count() == 2000L)
    narrow.collect()
    val report = KvCommands.pruningReport(narrow).head()
    assert(report.getAs[Long]("segments_read") <
      report.getAs[Long]("segments_live"),
      s"deep-cap zones pruned nothing: $report")
  }

  test("truncated claims degrade t.columns and ANALYZE min/max to NULL") {
    // the zone CLAIM for a >64-codepoint string is a truncated prefix /
    // incremented prefix — a value the table may not contain. The stats
    // surfaces report VALUES, so both must answer NULL, exactly like
    // the agg-pushdown refusal above ("never a wrong number").
    val root = Files.createTempDirectory("graftkv_szone_cat").toString
    val cat = s"gsz${math.abs(root.hashCode() % 100000)}"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.connector.GraftKvCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    spark.sql(s"CREATE TABLE $cat.db.t (k BIGINT, s STRING) " +
      "TBLPROPERTIES('key'='k')")
    spark.sql(s"INSERT INTO $cat.db.t " +
      s"SELECT id, concat('${"p" * 70}', cast(id as string)) FROM range(100)")
    val colRow = spark.sql(
      s"SELECT min, max FROM $cat.db.t.columns WHERE column_name = 's'").first()
    assert(colRow.isNullAt(0) && colRow.isNullAt(1),
      s"t.columns served a truncated claim as a value: $colRow")
    val an = spark.sql(
      s"ANALYZE TABLE $cat.db.t COMPUTE STATISTICS FOR COLUMNS s").collect()
      .find(_.getString(0) == "s").get
    assert(an.isNullAt(4) && an.isNullAt(5),
      s"ANALYZE served a truncated claim as a value: $an")
    // short strings still answer exactly through the same surfaces
    spark.sql(s"CREATE TABLE $cat.db.u (k BIGINT, s STRING) " +
      "TBLPROPERTIES('key'='k')")
    spark.sql(s"INSERT INTO $cat.db.u " +
      "SELECT id, concat('v', lpad(cast(id as string), 3, '0')) FROM range(100)")
    val uRow = spark.sql(
      s"SELECT min, max FROM $cat.db.u.columns WHERE column_name = 's'").first()
    assert(uRow.getString(0) == "v000" && uRow.getString(1) == "v099")
    spark.sql(s"DROP TABLE $cat.db.t")
    spark.sql(s"DROP TABLE $cat.db.u")
  }

  test("a null in the string column suppresses the zone entry and the answer") {
    val path = tmpDir("nulls")
    spark.range(1000).select(col("id").as("k"),
      when(col("id") === 500, lit(null)).otherwise(lit("x")).as("s"))
      .write.format("graftkv").option("key", "k").mode("overwrite").save(path)
    val q = KvCommands.table(spark, path)
      .agg(min(col("s")).as("mn"))
    assert(!aggPlan(q).contains("GraftKvAggScan"))
    assert(q.first().getString(0) == "x") // scan fallback: MIN ignores nulls
  }

  test("string bounds round-trip the packed planning stats exactly") {
    val path = tmpDir("pack")
    spark.range(500).select(col("id").as("k"),
      concat(lit("s"), col("id").cast("string")).as("s"))
      .write.format("graftkv").option("key", "k").mode("overwrite").save(path)
    val fromSidecars = SegmentFile.listSegments(path).map(_.file).sorted.map(f =>
      SegmentFile.readMeta(path, f.stripSuffix(".kv"), withIndex = false))
    SegmentFile.clearPlanningCache()
    val fromPack = SegmentFile.listSegments(path)
      .sortBy(_.file)
    fromPack.zip(fromSidecars).foreach { case (p, s) =>
      assert(p.zoneStats == s.zoneStats,
        s"pack zone drift: ${p.zoneStats} vs ${s.zoneStats}")
      assert(p.zoneStats.exists(z =>
        z.name == "s" && z.exact && z.min.isInstanceOf[String]))
    }
  }
}
