package graft.connector

import graft.TestSpark
import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Metadata NDV (KvNdvRule + V9 sketches): whole-table
  * approx_count_distinct answered from merged per-segment HLL++
  * registers must be BIT-IDENTICAL to the scan-side estimate (same
  * helper, same rsd, register merge is per-register max — order
  * insensitive), and every unsound shape must refuse and stay correct. */
class KvNdvSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def tmpDir(tag: String): String =
    Files.createTempDirectory(s"graftkv_ndv_$tag").toString + "/t"

  private def answersFromMetadata(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.collectFirst {
      case _: LocalRelation => ()
    }.isDefined

  /** Collect with the rule on, compare bit-exactly against the rule
    * off (always the scan plan). */
  private def checkEqual(mk: => DataFrame): Unit = {
    val viaMeta = mk.collect().toSeq.map(_.toSeq)
    spark.conf.set("spark.graft.ndv.metadata", "false")
    val direct = try mk.collect().toSeq.map(_.toSeq)
    finally spark.conf.set("spark.graft.ndv.metadata", "true")
    assert(viaMeta == direct, "metadata estimate must equal the scan estimate")
  }

  private def mkBase(path: String): Unit = {
    // several segments (small maxBytes), nulls in x, strings, doubles
    val df = spark.range(20000).select(col("id").as("k"),
      when(col("id") % 50 === 3, lit(null)).otherwise(col("id") % 977).as("x"),
      concat(lit("u"), (col("id") % 431).cast("string")).as("s"),
      (col("id") % 211).cast("double").as("d"))
    df.write.format("graftkv").option("key", "k")
      .option("segment.maxBytes", "65536")
      .mode("overwrite").save(path)
  }

  test("whole-table approx_count_distinct answers from metadata, bit-identical") {
    val path = tmpDir("basic")
    mkBase(path)
    def q = KvCommands.table(spark, path)
      .agg(approx_count_distinct("x").as("ndv_x"),
        approx_count_distinct("s").as("ndv_s"),
        approx_count_distinct("d").as("ndv_d"),
        approx_count_distinct("k").as("ndv_k"),
        count(lit(1)).as("cnt"))
    assert(answersFromMetadata(q), "rule did not fire")
    checkEqual(q)
    // sanity: the estimate is actually close to the truth
    val r = q.first()
    assert(math.abs(r.getLong(0) - 977) <= 977 * 0.15)
    assert(r.getLong(4) == 20000L)
    // the lazily-built pack exists after the first answer
    assert(graft.store.SegmentFile.manifestVersions(path).lastOption.exists(
      v => Files.exists(java.nio.file.Paths.get(path, s"_graft_ndv.v$v"))))
  }

  test("winners-only: upsert duplicates within a write sketch only the kept row") {
    val path = tmpDir("upsert")
    // k collides heavily within ONE write: the writer collapses dup
    // groups and must sketch only each group's winner (the physical row)
    val df = spark.range(6000).select((col("id") % 1500).as("k"),
      (col("id") % 97).as("x"))
    df.write.format("graftkv").option("key", "k")
      .mode("overwrite").save(path)
    def q = KvCommands.table(spark, path)
      .agg(approx_count_distinct("x").as("ndv"), count(lit(1)).as("cnt"))
    assert(answersFromMetadata(q))
    checkEqual(q)
    assert(q.first().getLong(1) == 1500L)
  }

  test("COUNT(DISTINCT full key) is exact from metadata; subsets refuse") {
    val path = tmpDir("cntdk")
    mkBase(path)
    def q = KvCommands.table(spark, path)
      .agg(countDistinct(col("k")).as("dk"), count(lit(1)).as("cnt"))
    assert(answersFromMetadata(q), "full-key distinct must answer from metadata")
    val r = q.first()
    assert(r.getLong(0) == 20000L && r.getLong(1) == 20000L)
    checkEqual(q)
    // a value-column distinct is not key-unique — refuse to the scan
    val dv = KvCommands.table(spark, path)
      .agg(countDistinct(col("x")).as("dx"))
    assert(!answersFromMetadata(dv))
    checkEqual(dv)
    // composite key: the FULL set answers (any order), a prefix refuses
    val path2 = tmpDir("cntdk2")
    spark.range(5000).select((col("id") / 100).as("a"), (col("id") % 100).as("b"),
      col("id").as("v"))
      .write.format("graftkv").option("key", "a,b").mode("overwrite").save(path2)
    def q2 = KvCommands.table(spark, path2)
      .agg(countDistinct(col("b"), col("a")).as("dab"))
    assert(answersFromMetadata(q2))
    assert(q2.first().getLong(0) == 5000L)
    checkEqual(q2)
    val prefix = KvCommands.table(spark, path2)
      .agg(countDistinct(col("a")).as("da"))
    assert(!answersFromMetadata(prefix), "key-prefix distinct must scan")
    checkEqual(prefix)
  }

  test("overlap refuses until compaction restores the path") {
    val path = tmpDir("overlap")
    mkBase(path)
    KvCommands.append(spark.range(50).select(col("id").as("k"),
      col("id").as("x"), lit("z").as("s"), lit(1.0).as("d")), path)
    def q = KvCommands.table(spark, path)
      .agg(approx_count_distinct("x").as("ndv"))
    assert(!answersFromMetadata(q),
      "overlapping generations must refuse (sketch union counts superseded rows)")
    checkEqual(q) // scan both ways, still equal
    KvCommands.compact(spark, path)
    assert(answersFromMetadata(q), "compaction must restore the metadata path")
    checkEqual(q)
  }

  test("tombstones, filters, grouping, non-default rsd, and snapshots refuse") {
    val path = tmpDir("refuse")
    mkBase(path)
    val t = KvCommands.table(spark, path)

    val filtered = t.filter(col("k") > 100)
      .agg(approx_count_distinct("x").as("ndv"))
    assert(!answersFromMetadata(filtered))
    checkEqual(filtered)

    val grouped = t.groupBy(col("k") % 2)
      .agg(approx_count_distinct("x").as("ndv"))
    assert(!answersFromMetadata(grouped))

    val oddRsd = t.agg(approx_count_distinct(col("x"), 0.1).as("ndv"))
    assert(!answersFromMetadata(oddRsd),
      "writer sketches exist only at the default rsd")
    checkEqual(oddRsd)

    val v = graft.store.SegmentFile.currentVersion(path).get
    val snap = KvCommands.tableAsOf(spark, path, v)
      .agg(approx_count_distinct("x").as("ndv"))
    assert(!answersFromMetadata(snap), "snapshot reads must not rewrite")

    KvCommands.delete(spark, path, col("k") === 7)
    val afterDelete = t.agg(approx_count_distinct("x").as("ndv"))
    assert(!answersFromMetadata(afterDelete),
      "tombstoned tables must refuse (sketches count deleted rows)")
    checkEqual(afterDelete)
  }

  test("COUNT(col) answers from metadata null counts (V10)") {
    val path = tmpDir("countcol")
    mkBase(path) // x NULL every 50th row; s,d never null
    val t = KvCommands.table(spark, path)

    def aggPlan(df: DataFrame): String =
      df.queryExecution.executedPlan.toString
    // whole table: count(*) + count(x) + count(s) from pure metadata
    val q = t.agg(count(lit(1)).as("all"), count(col("x")).as("nx"),
      count(col("s")).as("ns"), count(col("k")).as("nk"))
    assert(aggPlan(q).contains("GraftKvAggScan"), "did not push")
    val r = q.first()
    assert(r.getLong(0) == 20000L)
    assert(r.getLong(1) == 20000L - 400L) // every 50th x is NULL
    assert(r.getLong(2) == 20000L)
    assert(r.getLong(3) == 20000L) // key column: COUNT(key) = COUNT(*)

    // lead-range filter: covered segments answer from metadata,
    // boundary segments count their own non-null values
    val f = t.filter(col("k") >= 3000 && col("k") < 17000)
      .agg(count(lit(1)).as("all"), count(col("x")).as("nx"))
    assert(aggPlan(f).contains("GraftKvAggScan"))
    val fr = f.first()
    assert(fr.getLong(0) == 14000L)
    assert(fr.getLong(1) ==
      (3000L until 17000L).count(i => i % 50 != 3))

    // tombstones suppress the claim; the scan fallback stays correct
    KvCommands.delete(spark, path, col("k") === 104)
    val after = t.agg(count(col("x")).as("nx"))
    assert(!aggPlan(after).contains("GraftKvAggScan"))
    assert(after.first().getLong(0) == 20000L - 400L - 1L) // k=104: x non-null
  }

  test("SQL: ANALYZE TABLE reports rows, NDV estimates, and bounds") {
    val root = Files.createTempDirectory("graftkv_ndv_cat").toString
    val cat = s"gndv${math.abs(root.hashCode() % 100000)}"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftKvCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    spark.sql(s"CREATE TABLE $cat.db.t (k BIGINT, x BIGINT) " +
      "TBLPROPERTIES('key'='k')")
    spark.sql(s"INSERT INTO $cat.db.t SELECT id, id % 37 + 5 FROM range(4000)")

    val all = spark.sql(s"ANALYZE TABLE $cat.db.t COMPUTE STATISTICS").collect()
    val tRow = all.find(_.getString(0) == "(table)").get
    assert(tRow.getLong(1) == 4000L)
    val xRow = all.find(_.getString(0) == "x").get
    assert(math.abs(xRow.getLong(3) - 37L) <= 3, s"ndv: $xRow")
    assert(xRow.getString(4) == "5" && xRow.getString(5) == "41")
    assert(xRow.getLong(6) == 0L, "x holds no NULLs")

    val one = spark.sql(
      s"ANALYZE TABLE $cat.db.t COMPUTE STATISTICS FOR COLUMNS x").collect()
    assert(one.map(_.getString(0)).toSeq == Seq("(table)", "x"))

    // the same statistics as a queryable METADATA TABLE (t.columns)
    val cols = spark.sql(s"SELECT * FROM $cat.db.t.columns ORDER BY column_name")
      .collect().map(r => r.getString(0) ->
        (r.getString(2), if (r.isNullAt(3)) -1L else r.getLong(3),
          if (r.isNullAt(4)) -1L else r.getLong(4))).toMap
    assert(cols("k")._1 == "key" && cols("x")._1 == "value")
    assert(math.abs(cols("x")._2 - 37L) <= 3)
    assert(cols("x")._3 == 0L && cols("k")._3 == 0L)
    // it composes like any relation (join with the base table's agg)
    val joined = spark.sql(
      s"""SELECT c.column_name FROM $cat.db.t.columns c
         |WHERE c.null_count = 0 ORDER BY 1""".stripMargin).collect()
    assert(joined.map(_.getString(0)).toSeq == Seq("k", "x"))
    // V11 quartiles: x = id % 37 + 5 is uniform on [5, 41] → p50 ≈ 23,
    // ordered p25 ≤ p50 ≤ p75
    val q = spark.sql(
      s"SELECT p25, p50, p75 FROM $cat.db.t.columns WHERE column_name = 'x'")
      .first()
    assert(q.getDouble(1) >= 20 && q.getDouble(1) <= 26, s"p50: $q")
    assert(q.getDouble(0) <= q.getDouble(1) && q.getDouble(1) <= q.getDouble(2))

    // tombstones null the NDV claim (never a wrong number)
    spark.sql(s"DELETE FROM $cat.db.t WHERE k = 17")
    val after = spark.sql(
      s"ANALYZE TABLE $cat.db.t COMPUTE STATISTICS FOR COLUMNS x").collect()
    assert(after.find(_.getString(0) == "x").get.isNullAt(3))
    // ... and the (table) rows figure degrades under the SAME gate: on a
    // tombstoned (uncompacted) table count − 2·tombstones is a heuristic,
    // so ANALYZE reports NULL rather than an overcount
    assert(after.find(_.getString(0) == "(table)").get.isNullAt(1))
    // and the metadata table degrades the same way (quartiles included)
    val colsAfter = spark.sql(
      s"SELECT distinct_count, p50 FROM $cat.db.t.columns WHERE column_name = 'x'")
      .collect()
    assert(colsAfter.head.isNullAt(0))
    assert(colsAfter.head.isNullAt(1))
    // compaction clears the tombstone and restores the exact rows claim
    KvCommands.compact(spark, root + "/db/t")
    val compacted = spark.sql(
      s"ANALYZE TABLE $cat.db.t COMPUTE STATISTICS FOR COLUMNS x").collect()
    assert(compacted.find(_.getString(0) == "(table)").get.getLong(1) == 3999L)
    spark.sql(s"DROP TABLE $cat.db.t")
  }

  test("sketches survive the full maintenance cycle (append, delete, compact)") {
    val path = tmpDir("cycle")
    mkBase(path)
    KvCommands.append(spark.range(300).select((col("id") + 50000).as("k"),
      col("id").as("x"), lit("n").as("s"), lit(2.5).as("d")), path)
    KvCommands.delete(spark, path, col("k") % 13 === 1)
    KvCommands.compact(spark, path) // physical rows = live rows again
    def q = KvCommands.table(spark, path)
      .agg(approx_count_distinct("x").as("ndv"),
        approx_count_distinct("s").as("ndv_s"), count(lit(1)).as("cnt"))
    assert(answersFromMetadata(q))
    checkEqual(q)
    assert(q.first().getLong(2) ==
      KvCommands.table(spark, path).count())
  }
}
