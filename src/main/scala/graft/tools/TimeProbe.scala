package graft.tools
import org.apache.spark.sql.SparkSession

/** Scratch diagnostic: time a named SparkEntry query rep-by-rep in a
  * fresh session — first-rep vs steady-state attribution. Usage:
  * TimeProbe <sfDir> <name> <reps> [conf=k:v ...]. */
object TimeProbe {
  def main(args: Array[String]): Unit = {
    val b = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .config("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "false")
      .config("spark.sql.extensions", "graft.sql.GraftExtensions")
      .config("spark.ui.enabled", "false")
    args.drop(3).filter(_.startsWith("conf=")).foreach { c =>
      val Array(k, v) = c.stripPrefix("conf=").split(':')
      b.config(k, v)
    }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args(0); val name = args(1); val reps = args(2).toInt
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(name)(spark, dir).count()
      println(f"rep $i: ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
    }
    spark.stop()
  }
}
