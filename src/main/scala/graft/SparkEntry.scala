package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every operator family's QuerySpecs into the `queries` /
  * `oracleSql` maps the driver's correctness gate consumes.
  */
object SparkEntry {

  /** All implemented operators, one QuerySpec each (SURVEY.md §2). */
  def specs: Seq[QuerySpec] =
    operators.Relational.specs ++ operators.TpcH.specs ++
      operators.TemporalJoins.specs ++
      operators.PipelineOps.specs ++ operators.KvOps.specs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("a8_tpch_q1")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    specs.map(q => q.name -> q.build).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    specs.collect { case QuerySpec(n, Some(sql), _) => n -> sql }.toMap
}
