package graft.tools
import org.apache.spark.sql.SparkSession

/** Scratch diagnostic: run named SparkEntry queries with WARN logging
  * and stderr markers, to attribute stray planner warnings (e.g. the
  * DataSourceV2Strategy "Can't translate true" spam) to the operation
  * that plans them. Usage: WarnProbe <sfDir> <query...>. */
object WarnProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.sql.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args(0)
    args.drop(1).foreach { name =>
      System.err.println(s"=== BEGIN $name")
      try graft.SparkEntry.queries(name)(spark, dir).collect()
      catch { case e: Exception =>
        System.err.println(s"=== ERROR $name: ${e.getMessage}") }
      System.err.println(s"=== END $name")
    }
    spark.stop()
  }
}
