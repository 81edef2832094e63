package graft.tools
import org.apache.spark.sql.SparkSession
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions","8")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.sql.extensions","graft.sql.GraftExtensions")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val name = args(0); val dir = args(1)
    val df = graft.SparkEntry.queries(name)(spark, dir)
    val t0 = System.nanoTime
    df.collect()
    println(f"exec ${(System.nanoTime-t0)/1e9}%.3f s")
    val p = df.queryExecution.executedPlan.toString
    // "Exchange hashpartitioning/SinglePartition/range..." is a real
    // shuffle node; a bare "Exchange " substring would also match inside
    // BroadcastExchange/ReusedExchange and overcount. Count by the
    // partitioning kind so Exchange nodes carried under ':' tree
    // continuation prefixes (non-last join children) aren't missed.
    println("reusedExchange=" + "ReusedExchange".r.findAllIn(p).size +
      " shuffle=" + "\\bExchange (hash|range)partitioning|\\bExchange SinglePartition"
        .r.findAllIn(p).size +
      " broadcastExchange=" + "BroadcastExchange".r.findAllIn(p).size +
      " fileScan=" + "FileScan".r.findAllIn(p).size +
      " expand=" + "Expand".r.findAllIn(p).size)
    if (args.length > 2) println(p.take(12000))
    spark.stop()
  }
}
