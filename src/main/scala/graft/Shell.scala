package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Interactive SQL shell — the reference's `bin/hbase-sql` REPL analog
  * (/root/reference src/main/scala/.../HBaseSQLCliDriver.scala:30-184),
  * restated over a stock SparkSession wired with the engine: corpus
  * tables registered as views, the graftkv catalog mounted at `graft.*`,
  * and the native SQL functions registered.
  *
  * Usage: `runMain graft.Shell [sfDir] [kvRoot]`, then type SQL; `exit`
  * quits. Statements may end with `;`.
  */
object Shell {

  /** Build the fully-wired session (also used by tests). */
  def session(sfDir: String, kvRoot: String): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .appName("graft-shell")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.catalog.graft", classOf[connector.GraftKvCatalog].getName)
      .config("spark.sql.catalog.graft.root", kvRoot)
      // honor the kv scan's KeyGroupedPartitioning (shuffle-free GROUP BY)
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      // partition-value padding would align differently-bounded kv tables
      // by their range-minimum partition values (silent join row loss);
      // with it off, mismatched tables fall back to shuffle
      .config("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "false")
      // native functions + LOAD DATA statement
      .config("spark.sql.extensions", "graft.sql.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    sql.GraftExtensions.quietDegenerateDppWarns()
    Tables.registerAll(spark, sfDir)
    sql.GraftExtensions.register(spark)
    spark
  }

  /** One statement → DataFrame (strips a trailing `;`). */
  def execute(spark: SparkSession, statement: String): DataFrame =
    spark.sql(statement.trim.stripSuffix(";"))

  /** Keyword completion for the partial statement `buffer`: candidates
    * for its last (possibly empty-prefix) word, case-insensitive, from
    * the engine's SQL keyword inventory (the reference CLI's
    * reflection-based completer, HBaseSQLCliDriver). The interactive
    * loop exposes it as TAB-free `\complete <prefix>` (a plain stdin
    * reader has no key events); an embedding REPL calls it per
    * keystroke. */
  def complete(buffer: String): Seq[String] = {
    val prefix = buffer.reverse.takeWhile(c => c.isLetterOrDigit || c == '_')
      .reverse.toUpperCase
    if (prefix.isEmpty) sql.GraftSqlParser.keywords
    else sql.GraftSqlParser.keywords.filter(_.startsWith(prefix))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val kvRoot = args.lift(1).getOrElse(
      s"${System.getProperty("java.io.tmpdir")}/graft_shell_catalog")
    val spark = session(sfDir, kvRoot)
    println(s"graft shell — corpus views from $sfDir, kv catalog 'graft' at $kvRoot")
    val in = new java.io.BufferedReader(new java.io.InputStreamReader(System.in))
    var line: String = null
    while ({ print("graft> "); Console.flush(); line = in.readLine(); line != null } &&
      line.trim != "exit") {
      val stmt = line.trim
      if (stmt.startsWith("\\complete")) {
        println(complete(stmt.stripPrefix("\\complete").trim).mkString(" "))
      } else if (stmt.nonEmpty) {
        try execute(spark, stmt).show(50, truncate = false)
        catch { case e: Exception => println(s"error: ${e.getMessage}") }
      }
    }
    spark.stop()
  }
}
