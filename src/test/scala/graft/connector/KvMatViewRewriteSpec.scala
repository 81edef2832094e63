package graft.connector

import graft.TestSpark
import java.nio.file.Files
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Transparent aggregate rewrite over materialized views
  * (KvMatViewRule): every rewritten query must be bit-identical to the
  * direct plan, the rewrite must be version-gated, and NULL group
  * values must gate it unless provably absent or filtered away. */
class KvMatViewRewriteSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def tmpDir(tag: String): String =
    Files.createTempDirectory(s"graftkv_mvr_$tag").toString + "/t"

  private def usesView(df: DataFrame): Boolean =
    graft.PlanTestUtils.kvScans(df)
      .exists(_.description().contains("/_mv/"))

  private def touchesBase(df: DataFrame): Boolean =
    graft.PlanTestUtils.kvScans(df)
      .exists(!_.description().contains("/_mv/"))

  /** Collect sorted; compare against the same query with the rewrite
    * disabled (always the direct base plan). */
  private def checkEqual(mk: => DataFrame): Unit = {
    val viaView = mk.collect().toSeq.map(_.toSeq).sortBy(_.mkString("|"))
    spark.conf.set("spark.graft.matview.rewrite", "false")
    val direct = try mk.collect().toSeq.map(_.toSeq).sortBy(_.mkString("|"))
    finally spark.conf.set("spark.graft.matview.rewrite", "true")
    assert(viaView == direct)
  }

  /** 12k rows; `g` has NULLs (every 97th), `h` never does, `x` has
    * NULLs (every 50th). */
  private def mkBase(path: String): Unit = {
    val df = spark.range(12000).select(col("id").as("k"),
      when(col("id") % 97 === 5, lit(null)).otherwise(col("id") % 8).as("g"),
      (col("id") % 3).as("h"),
      when(col("id") % 50 === 3, lit(null)).otherwise(col("id")).as("x"))
    df.write.format("graftkv").option("key", "k")
      .option("segment.maxBytes", "65536")
      .mode("overwrite").save(path)
  }

  test("aggregates a view can answer read the view, bit-identical") {
    val path = tmpDir("basic")
    mkBase(path)
    KvMatView.create(spark, path, "mv", Seq("g", "h"), Seq("x"))
    val t = KvCommands.table(spark, path)

    // g is nullable and the base HAS null-g rows: un-filtered GROUP BY g
    // must NOT rewrite (the view omits those rows)
    val unfiltered = t.groupBy("g", "h").agg(count(lit(1)).as("c"))
    assert(!usesView(unfiltered), "NULL-group rows present; rewrite unsound")
    // per-column counters: g has nulls, h never does (despite being
    // schema-nullable, as every kv value column is)
    val counts = KvMatView.get(path, "mv").get.nullRowsByGroup
    assert(counts.length == 2 && counts.head > 0 && counts(1) == 0L)

    // a null-rejecting filter on every nullable group column restores it
    def q = KvCommands.table(spark, path)
      .filter(col("g").isNotNull)
      .groupBy("g", "h")
      .agg(count(lit(1)).as("c"), sum("x").as("s"), count(col("x")).as("nn"),
        min("h").as("mh"), (sum("x") + count(lit(1))).as("mix"))
    assert(usesView(q), "rewrite did not fire")
    assert(!touchesBase(q), "rewritten plan still scans the base table")
    checkEqual(q)
  }

  test("subset-group re-aggregation and group-column filters rewrite") {
    val path = tmpDir("subset")
    mkBase(path)
    // delete the null-g rows so the un-filtered rewrite is provably
    // sound; the maintained counter must reflect that after refresh
    KvCommands.delete(spark, path, col("g").isNull)
    KvMatView.create(spark, path, "mv", Seq("g", "h"), Seq("x"))
    assert(KvMatView.get(path, "mv").get.nullRowsByGroup == Seq(0L, 0L))

    def bySubset = KvCommands.table(spark, path)
      .groupBy("g").agg(count(lit(1)).as("c"), sum("x").as("s"))
    assert(usesView(bySubset), "subset grouping did not rewrite")
    checkEqual(bySubset)

    def filtered = KvCommands.table(spark, path)
      .filter(col("h") === 1 && col("g") > 2)
      .groupBy("g").agg(sum("x").as("s"), max("g").as("mg"))
    assert(usesView(filtered), "group-column filter did not rewrite")
    checkEqual(filtered)

    def global = KvCommands.table(spark, path)
      .agg(count(lit(1)).as("c"), sum("x").as("s"))
    assert(usesView(global), "global aggregate did not rewrite")
    checkEqual(global)
  }

  test("decimal SUM views: exact maintenance + rewrite (money dashboards)") {
    val path = tmpDir("decimal")
    def money(ids: org.apache.spark.sql.DataFrame) = ids.select(
      col("id").as("k"), (col("id") % 8).as("g"),
      expr("CAST(CAST(id AS DECIMAL(12,2)) / 4 AS DECIMAL(12,2))").as("m"))
    money(spark.range(6000).toDF("id"))
      .write.format("graftkv").option("key", "k")
      .option("segment.maxBytes", "65536").mode("overwrite").save(path)
    KvMatView.create(spark, path, "mv", Seq("g"), Seq("m"))
    def q = KvCommands.table(spark, path)
      .groupBy("g").agg(sum("m").as("s"), count(col("m")).as("nn"),
        count(lit(1)).as("c"))
    assert(usesView(q), "decimal SUM did not rewrite")
    assert(!touchesBase(q), "rewritten plan still scans the base")
    checkEqual(q)
    // the stored sum column is the widened decimal — stored natively
    val mvT = KvCommands.table(spark, KvMatView.mvPath(path, "mv"))
    assert(mvT.schema("__sum_m").dataType ==
      org.apache.spark.sql.types.DecimalType(22, 2), mvT.schema.treeString)

    // incremental refresh stays EXACT through append + delete + upsert
    KvCommands.append(money(spark.range(6000, 6100).toDF("id")), path)
    KvCommands.delete(spark, path, col("k") < 10)
    KvCommands.append(spark.range(20, 25).select(col("id").as("k"),
      (col("id") % 8).as("g"),
      expr("CAST(999.99 AS DECIMAL(12,2))").as("m")), path) // upsert
    KvMatView.refresh(spark, path, "mv")
    assert(usesView(q), "refreshed decimal view did not rewrite")
    checkEqual(q)
    // global aggregate (sum-of-sums re-aggregation, cast back exact)
    def global = KvCommands.table(spark, path)
      .agg(sum("m").as("s"), count(lit(1)).as("c"))
    assert(usesView(global))
    checkEqual(global)

    // wide decimals stay refused — no exact Long-headroom claim
    val wPath = tmpDir("decimal_wide")
    spark.range(10).select(col("id").as("k"), (col("id") % 2).as("g"),
      expr("CAST(id AS DECIMAL(38,2))").as("w"))
      .write.format("graftkv").option("key", "k").mode("overwrite").save(wPath)
    val err = intercept[IllegalArgumentException](
      KvMatView.create(spark, wPath, "mvw", Seq("g"), Seq("w")))
    assert(err.getMessage.contains("decimal"), err.getMessage)
  }

  test("the counter tracks deletes and upserts of NULL-group rows") {
    val path = tmpDir("counter")
    mkBase(path)
    KvMatView.create(spark, path, "mv", Seq("g"), Seq("x"))
    val before = KvMatView.get(path, "mv").get.nullRowsByGroup.head
    assert(before > 0)

    // upsert two more null-g rows, delete one pre-existing (k=5)
    KvCommands.append(spark.range(2).select((col("id") + 50000).as("k"),
      lit(null).cast("long").as("g"), lit(1L).as("x")), path)
    KvCommands.delete(spark, path, col("k") === 5)
    KvMatView.refresh(spark, path, "mv")
    assert(KvMatView.get(path, "mv").get.nullRowsByGroup == Seq(before + 1))

    // remove every null-g row: the un-filtered rewrite becomes sound
    KvCommands.delete(spark, path, col("g").isNull)
    KvMatView.refresh(spark, path, "mv")
    assert(KvMatView.get(path, "mv").get.nullRowsByGroup == Seq(0L))
    def q = KvCommands.table(spark, path)
      .groupBy("g").agg(count(lit(1)).as("c"))
    assert(usesView(q))
    checkEqual(q)
  }

  test("staleness gates the rewrite until refresh") {
    val path = tmpDir("stale")
    mkBase(path)
    KvCommands.delete(spark, path, col("g").isNull)
    KvMatView.create(spark, path, "mv", Seq("g"), Seq("x"))
    def q = KvCommands.table(spark, path)
      .groupBy("g").agg(sum("x").as("s"))
    assert(usesView(q))

    KvCommands.append(spark.range(10).select((col("id") + 90000).as("k"),
      (col("id") % 8).as("g"), col("id").as("x")), path)
    assert(!usesView(q), "stale view must not answer")
    checkEqual(q) // direct plan both ways, still correct

    KvMatView.refresh(spark, path, "mv")
    assert(usesView(q), "refreshed view must answer again")
    checkEqual(q)
  }

  test("MIN/MAX of declared minmax value columns rewrite, bit-identical") {
    val path = tmpDir("minmax")
    mkBase(path)
    KvCommands.delete(spark, path, col("g").isNull)
    KvMatView.create(spark, path, "mv", Seq("g", "h"), Seq("x"), Seq("x"))
    val t = KvCommands.table(spark, path)

    def full = t.groupBy("g", "h")
      .agg(min("x").as("mn"), max("x").as("mx"), sum("x").as("s"))
    assert(usesView(full), "declared minmax did not rewrite")
    assert(!touchesBase(full))
    checkEqual(full)

    // subset grouping re-aggregates stored extremes (min of mins)
    def subset = t.groupBy("g")
      .agg(min("x").as("mn"), max("x").as("mx"), count(lit(1)).as("c"))
    assert(usesView(subset))
    checkEqual(subset)

    // global extremes + group-column filter
    def filtered = t.filter(col("h") === 2)
      .agg(min("x").as("mn"), max("x").as("mx"))
    assert(usesView(filtered))
    checkEqual(filtered)

    // staying correct THROUGH maintenance: remove a stored maximum
    // (rescan path), refresh, rewrite fires again on exact extremes
    KvCommands.delete(spark, path, col("x") >= 11900)
    assert(!usesView(full), "stale view must not answer")
    KvMatView.refresh(spark, path, "mv")
    assert(usesView(full))
    checkEqual(full)
  }

  test("shapes the view cannot answer refuse and stay correct") {
    val path = tmpDir("refuse")
    mkBase(path)
    KvCommands.delete(spark, path, col("g").isNull)
    KvMatView.create(spark, path, "mv", Seq("g"), Seq("x"))
    val t = KvCommands.table(spark, path)

    val refusals = Seq(
      // avg is not translated (double vs exact-Long accumulation)
      t.groupBy("g").agg(avg("x").as("a")),
      // sum of an undeclared column
      t.groupBy("g").agg(sum("k").as("s")),
      // min/max of a value column NOT declared MINMAX at create
      t.groupBy("g").agg(max("x").as("m")),
      // distinct aggregate
      t.groupBy("g").agg(countDistinct("x").as("cd")),
      // filter referencing a non-group column
      t.filter(col("x") > 100).groupBy("g").agg(count(lit(1)).as("c")),
      // grouping by a non-view column
      t.groupBy("h").agg(count(lit(1)).as("c")),
      // grouping by an expression
      t.groupBy((col("g") + 1).as("g1")).agg(count(lit(1)).as("c")))
    refusals.foreach { q =>
      assert(!usesView(q), s"must not rewrite: ${q.queryExecution.logical}")
      assert(q.collect().nonEmpty)
    }

    // snapshot reads never rewrite (historical by definition)
    val v = graft.store.SegmentFile.currentVersion(path).get
    val snap = KvCommands.tableAsOf(spark, path, v)
      .groupBy("g").agg(count(lit(1)).as("c"))
    assert(!usesView(snap), "snapshot read must not rewrite")
  }

  test("fuzz: random aggregate shapes are bit-identical with and without the rewrite") {
    val rnd = new scala.util.Random(4242)
    val path = tmpDir("fuzz")
    // two group columns (one with NULLs), two summable columns (one
    // with NULLs), through a few commits so the view is CDC-refreshed
    // state rather than a fresh fold
    val df = spark.range(8000).select(col("id").as("k"),
      when(col("id") % 53 === 9, lit(null)).otherwise(col("id") % 6).as("g"),
      (col("id") % 4).as("h"),
      when(col("id") % 31 === 2, lit(null)).otherwise(col("id") % 1000).as("x"),
      (col("id") % 7).as("y"))
    df.write.format("graftkv").option("key", "k")
      .option("segment.maxBytes", "65536").mode("overwrite").save(path)
    KvMatView.create(spark, path, "mv", Seq("g", "h"), Seq("x", "y"))
    KvCommands.append(spark.range(500).select((col("id") * 11).as("k"),
      (col("id") % 6).as("g"), (col("id") % 4).as("h"),
      lit(null).cast("long").as("x"), (col("id") % 7).as("y")), path)
    KvCommands.delete(spark, path, col("k") % 17 === 3)
    KvMatView.refresh(spark, path, "mv")

    val aggPool: Seq[() => Column] = Seq(
      () => count(lit(1)).as(s"c${rnd.nextInt(100)}"),
      () => sum("x").as("sx"), () => sum("y").as("sy"),
      () => count(col("x")).as("nx"), () => count(col("y")).as("ny"),
      () => min("g").as("mg"), () => max("h").as("xh"),
      () => (sum("x") + count(lit(1))).as("mix"),
      () => (max("g") * lit(2)).as("g2"))
    val filterPool: Seq[() => Column] = Seq(
      () => col("g").isNotNull, () => col("g") > rnd.nextInt(4),
      () => col("h") === rnd.nextInt(4), () => col("h").isin(0, 1, 2),
      () => col("g").isNotNull && col("h") < 3)
    var fired = 0
    for (round <- 1 to 25) {
      val groups = rnd.nextInt(3) match {
        case 0 => Seq("g", "h")
        case 1 => Seq(Seq("g", "h")(rnd.nextInt(2)))
        case 2 => Seq.empty // global
      }
      val aggs = rnd.shuffle(aggPool).take(1 + rnd.nextInt(3)).map(_.apply())
      val withFilter = rnd.nextBoolean()
      val filter = filterPool(rnd.nextInt(filterPool.length))()
      def q = {
        val base = KvCommands.table(spark, path)
        val f = if (withFilter) base.filter(filter) else base
        if (groups.isEmpty) f.agg(aggs.head, aggs.tail: _*)
        else f.groupBy(groups.map(col): _*).agg(aggs.head, aggs.tail: _*)
      }
      if (usesView(q)) fired += 1
      val viaView = q.collect().toSeq.map(_.toSeq).sortBy(_.mkString("|"))
      spark.conf.set("spark.graft.matview.rewrite", "false")
      val direct = try q.collect().toSeq.map(_.toSeq).sortBy(_.mkString("|"))
      finally spark.conf.set("spark.graft.matview.rewrite", "true")
      assert(viaView == direct,
        s"round $round groups=$groups filter=$withFilter aggs=$aggs")
    }
    // the fuzz must actually exercise the rewrite, not just refusals
    // (g nullable with NULL rows present: fires only under a
    // null-rejecting filter; h fires via its zero counter)
    assert(fired >= 5, s"rewrite fired only $fired/25 times")
  }

  test("SQL through the catalog rewrites") {
    val root = Files.createTempDirectory("graftkv_mvr_cat").toString
    val cat = s"gmvr${math.abs(root.hashCode() % 100000)}"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftKvCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    spark.sql(s"CREATE TABLE $cat.db.t (k BIGINT, g BIGINT, x BIGINT) " +
      "TBLPROPERTIES('key'='k')")
    spark.sql(s"INSERT INTO $cat.db.t SELECT id, id % 5, id FROM range(4000)")
    spark.sql(s"CREATE MATERIALIZED VIEW mv ON TABLE $cat.db.t GROUP BY g SUM (x)")

    def q = spark.sql(
      s"SELECT g, count(*) AS c, sum(x) AS s FROM $cat.db.t GROUP BY g")
    assert(usesView(q), "SQL aggregate did not rewrite")
    checkEqual(q)
    spark.sql(s"DROP TABLE $cat.db.t")
  }
}
