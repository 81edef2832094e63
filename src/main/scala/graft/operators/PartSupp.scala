package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic `partsupp` synthesis — the one TPC-H table the driver
  * corpus does not ship (TESTDATA.md). Seeded purely from part ×
  * supplier with integer modular arithmetic, so DuckDB can re-derive
  * the identical table from the same parquet inputs (`oracleCte`) and
  * every query over it stays hash-checkable.
  *
  * Shape follows the TPC-H spec's partsupp (4 suppliers per part,
  * spread across the supplier domain; the reference's TPC-mini suite
  * ethos, /root/reference/src/test/scala/org/apache/spark/sql/hbase/
  * HBaseTpcMiniTestSuite.scala): for j ∈ 0..3 the j-th supplier of
  * part p is the supplier with rank (p*4 + j*13) mod S by s_suppkey.
  * All derived values are integer-lattice: ps_availqty ∈ [1, 9999],
  * ps_supplycost ∈ [1.00, 992.00] with exactly 2 decimal digits (an
  * integer divided by 100.0 — the same IEEE double in both engines).
  *
  * The table is MATERIALIZED as parquet once per corpus (idempotent,
  * same fixture-root convention as the kv fixtures) and the TPC-H
  * queries read that file — a real scan with pushdown/stats, not an
  * inlined subplan; `ps1_partsupp_gen` pins the file's full contents
  * against the oracle derivation. At 100 TB the generation is one
  * broadcast join over part (suppliers are dim-scale), embarrassingly
  * parallel. */
object PartSupp {

  /** DuckDB-side derivation, prepended to every partsupp oracle. Must
    * stay formula-identical with [[generate]]. */
  val oracleCte: String =
    """WITH sup AS (
      |  SELECT s_suppkey,
      |         CAST(row_number() OVER (ORDER BY s_suppkey) AS BIGINT) - 1 AS sidx,
      |         CAST(count(*) OVER () AS BIGINT) AS scnt
      |  FROM supplier),
      |partsupp AS (
      |  SELECT p_partkey AS ps_partkey, s_suppkey AS ps_suppkey,
      |         CAST((p_partkey * 37 + sidx * 26 + j * 7) % 9999 + 1 AS INTEGER) AS ps_availqty,
      |         CAST((p_partkey * 53 + sidx * 71 + j * 29) % 99001 + 100 AS DOUBLE) / 100.0 AS ps_supplycost
      |  FROM part, (VALUES (0), (1), (2), (3)) js(j), sup
      |  WHERE sidx = (p_partkey * 4 + j * 13) % scnt)
      |""".stripMargin

  private def root(sfDir: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_kv/${sfDir.replaceAll("[^a-zA-Z0-9.]", "_")}/partsupp.parquet"

  private val lock = new Object

  /** The Spark-side derivation (not yet materialized). Rank-by-suppkey
    * is computed scale-safely: suppliers land in 64 monotone key-range
    * buckets, per-bucket counts (≤ 64 rows, bounded driver state)
    * become cumulative offsets, and the global 0-based rank is the
    * bucket offset plus a PARTITIONED window's row_number — no
    * single-partition exchange at any supplier count (the old
    * `Window.orderBy` form was the verify log's lone "No Partition
    * Defined for Window" WARN). part (the big side) streams map-only
    * through a broadcast join against the 4×S expanded supplier list. */
  def generate(spark: SparkSession, sfDir: String): DataFrame = {
    val sup = Tables.table(spark, sfDir, "supplier").select("s_suppkey")
    val stats = sup.agg(count(lit(1)).as("c"),
      min(col("s_suppkey").cast("long")).as("lo"),
      max(col("s_suppkey").cast("long")).as("hi")).head()
    val scnt = stats.getLong(0)
    require(scnt > 0, s"no suppliers under $sfDir")
    val lo = stats.getLong(1)
    val span = stats.getLong(2) - lo + 1
    val per = math.max(1L, (span + 63) / 64) // bucket width; b is monotone in key
    val withB = sup.withColumn("b",
      expr(s"(CAST(s_suppkey AS BIGINT) - $lo) div $per"))
    // cumulative counts of the buckets BELOW each bucket = its offset
    val counts = withB.groupBy("b").count().collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val offsets = counts.scanLeft((-1L, 0L)) { case ((_, acc), (b, c)) =>
      (b, acc + c)
    }.sliding(2).map { case Array((_, off), (b, _)) => (b, off) }.toSeq
    val offDf = spark.createDataFrame(offsets).toDF("b", "off")
    val ranked = withB.join(broadcast(offDf), "b")
      .select(col("s_suppkey"),
        (row_number().over(Window.partitionBy("b").orderBy("s_suppkey"))
          - 1 + col("off")).cast("long").as("sidx"))
    val js = spark.range(4).select(col("id").as("j"))
    Tables.table(spark, sfDir, "part").select("p_partkey")
      .crossJoin(broadcast(js))
      .withColumn("sidx", (col("p_partkey") * 4 + col("j") * 13) % scnt)
      .join(broadcast(ranked), "sidx")
      .select(
        col("p_partkey").as("ps_partkey"),
        col("s_suppkey").as("ps_suppkey"),
        ((col("p_partkey") * 37 + col("sidx") * 26 + col("j") * 7) % 9999 + 1)
          .cast("int").as("ps_availqty"),
        (((col("p_partkey") * 53 + col("sidx") * 71 + col("j") * 29) % 99001 + 100)
          .cast("double") / 100.0).as("ps_supplycost"))
  }

  /** Idempotently materialize partsupp for a corpus; returns the
    * parquet path. */
  def ensure(spark: SparkSession, sfDir: String): String = lock.synchronized {
    val path = root(sfDir)
    if (!new java.io.File(path, "_SUCCESS").exists())
      generate(spark, sfDir).write.mode("overwrite").parquet(path)
    path
  }

  /** The materialized partsupp table (generating it on first use). */
  def table(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(ensure(spark, sfDir))
}
