package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-15 optimization evidence: dump `.explain("formatted")` (and the
  * AQE-final executed plan after one run) for named SparkEntry queries
  * into a directory of `<name>_<tag>.txt` files. Usage:
  *   ExplainDump <sfDir> <outDir> <tag> [name ...]
  * With no names, dumps the whole bench headline set. The session confs
  * mirror Bench exactly so the captured plans are the benched plans. */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val outDir = args(1); val tag = args(2)
    val names = if (args.length > 3) args.drop(3).toSeq else graft.Bench.headline
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .config("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "false")
      .config("spark.sql.extensions", "graft.sql.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val queries = graft.SparkEntry.queries
    names.foreach { name =>
      try {
        val df = queries(name)(spark, sfDir)
        val formatted = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        df.collect() // materialize so the AQE-final plan is available
        val finalPlan = df.queryExecution.executedPlan.toString
        val text = s"== explain(formatted), initial plan ==\n$formatted\n" +
          s"\n== AQE-final executed plan (after one run) ==\n${finalPlan.take(30000)}\n"
        java.nio.file.Files.write(
          java.nio.file.Paths.get(outDir, s"${name}_$tag.txt"),
          text.getBytes("UTF-8"))
        System.err.println(s"[explain] wrote $name")
      } catch {
        case e: Throwable =>
          System.err.println(s"[explain] $name failed: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
