package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch diagnostic: run a named SparkEntry query and print the
  * AQE-final plan's per-node SQL metrics (scan time, shuffle bytes,
  * codegen durations) — attribution evidence for optimization work.
  * Usage: MetricsProbe <sfDir> <name> [reps]. */
object MetricsProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .config("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "false")
      .config("spark.sql.extensions", "graft.sql.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args(0); val name = args(1)
    val reps = if (args.length > 2) args(2).toInt else 3
    var df = graft.SparkEntry.queries(name)(spark, dir)
    (1 to reps).foreach { i =>
      df = graft.SparkEntry.queries(name)(spark, dir)
      val t0 = System.nanoTime()
      df.collect()
      println(f"rep $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    def walk(p: org.apache.spark.sql.execution.SparkPlan, depth: Int): Unit = {
      val ms = p.metrics.collect {
        case (k, m) if m.value > 0 &&
          (k.contains("Time") || k.contains("time") || k == "numOutputRows" ||
            k.contains("dataSize") || k.contains("bytes")) =>
          s"$k=${m.value}"
      }.mkString(" ")
      println("  " * depth + p.nodeName + (if (ms.nonEmpty) s"  [$ms]" else ""))
      p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          walk(a.executedPlan, depth + 1)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          walk(q.plan, depth + 1)
        case r: org.apache.spark.sql.execution.ReusedSubqueryExec =>
          walk(r.child, depth + 1)
        case b: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => ()
        case _ => p.children.foreach(walk(_, depth + 1))
      }
    }
    walk(df.queryExecution.executedPlan, 0)
    spark.stop()
  }
}
