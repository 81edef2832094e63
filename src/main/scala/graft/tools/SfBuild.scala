package graft.tools

import org.apache.spark.sql.SparkSession

/** Rebuild the tmp/sf1 scale fixture (the Spark-side mirror of
  * tools/make_sf1.py). Usage: SfBuild [src] [dst] [factor]. */
object SfBuild {
  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val dst = if (args.length > 1) args(1) else "tmp/sf1"
    val factor = if (args.length > 2) args(2).toInt else 10
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Bench.buildSf1(spark, src, dst, factor)
    spark.stop()
  }
}
