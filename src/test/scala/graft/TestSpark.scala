package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (JVM-wide, lazy). */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
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
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf: String = "/root/testdata/sf0.001"
}
