package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One query-visible operator of the engine: a Spark-first DataFrame
  * program plus (when SQL-expressible) an equivalent ANSI SQL oracle the
  * driver runs in DuckDB over the same parquet tables.
  *
  * Oracle-authoring rules (so that value/schema hashing matches DuckDB):
  *  - every computed column is aliased identically on both sides;
  *  - every query is totally ordered (driver may hash rows in sequence);
  *  - double aggregations go through DECIMAL(38,6) so the result is
  *    order-independent and bit-identical across engines;
  *  - integer-typed results are cast so DuckDB's widening (HUGEINT sums,
  *    BIGINT row_number/length/year) matches Spark's types.
  */
final case class QuerySpec(
    name: String,
    oracle: Option[String],
    build: (SparkSession, String) => DataFrame)

object QuerySpec {
  /** Operator with a DuckDB-checkable oracle. */
  def checked(name: String, oracle: String)(
      build: (SparkSession, String) => DataFrame): QuerySpec =
    QuerySpec(name, Some(oracle.stripMargin.trim), build)

  /** Order-independent, engine-exact double sum: route through
    * DECIMAL(38,6) so the result is bit-identical across engines and
    * partitionings. Single definition — the precision is a correctness
    * contract with the oracle SQL, never restate it inline. */
  def dsum(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.sum(
      c.cast(org.apache.spark.sql.types.DecimalType(38, 6))).cast("double")

  def davg(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    dsum(c) / org.apache.spark.sql.functions.count(c)

  /** Operator whose semantics are not ANSI-SQL-expressible (driver records
    * a rows-only check; a ScalaTest spec pins the semantics instead). */
  def rowsOnly(name: String)(
      build: (SparkSession, String) => DataFrame): QuerySpec =
    QuerySpec(name, None, build)
}

/** Parquet test-table loader (driver corpus, see TESTDATA.md). */
object Tables {
  val all: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS), which Spark 4 rejects
      // outright; read the raw int64 nanos and truncate to micros
      // (integer `div`, not `/`, to stay exact above 2^53). A corpus
      // written with µs timestamps (the sf1 replication) reads as a
      // timestamp column directly — convert only when nanos-as-long.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          raw.withColumn("ts",
            org.apache.spark.sql.functions.timestamp_micros(
              org.apache.spark.sql.functions.expr("ts div 1000")))
        case org.apache.spark.sql.types.TimestampNTZType =>
          // µs parquet written without a timezone (DuckDB) — identity
          // under the UTC session, but typed NTZ, which unix_micros &
          // co. reject; normalize to the session-TZ timestamp type
          raw.withColumn("ts", org.apache.spark.sql.functions.col("ts")
            .cast(org.apache.spark.sql.types.TimestampType))
        case _ => raw
      }
    } else spark.read.parquet(s"$dir/$name.parquet")

  /** Register every corpus table as a temp view (for spark.sql entry). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => table(spark, dir, n).createOrReplaceTempView(n))

  /** Tmp-cache hygiene for fingerprint-keyed fixture dirs (staged
    * corpus copies, retrieval indexes): when a NEW fingerprint is about
    * to be built, stale siblings `<prefix><otherFp>` under the same
    * parent are dead — the corpus they were derived from is gone — and
    * would otherwise accumulate across driver rounds unboundedly.
    * Best-effort: a failed delete must never fail the build. */
  def sweepStaleSiblings(parent: java.io.File, prefix: String,
      keep: String): Unit =
    try Option(parent.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith(prefix) &&
        f.getName != keep)
      .foreach(deleteRecursively)
    catch { case scala.util.control.NonFatal(_) => () }

  private def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
    f.delete()
  }
}
