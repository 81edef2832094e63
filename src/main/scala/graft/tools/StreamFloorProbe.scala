package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch diagnostic (r16): the fixed cost of ONE AvailableNow
  * micro-batch over the documents corpus, with no stateful operator —
  * the floor under dd8's wall. Usage: StreamFloorProbe <sfDir> <reps>. */
object StreamFloorProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.sql.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args(0); val reps = args(1).toInt
    val path = s"$dir/documents.parquet"
    val schema = spark.read.parquet(path).schema
    val srcDir = java.nio.file.Files
      .createTempDirectory("streamfloor").toString
    java.nio.file.Files.createSymbolicLink(
      java.nio.file.Paths.get(srcDir, "documents.parquet"),
      java.nio.file.Paths.get(path))
    (0 until reps).foreach { i =>
      val t0 = System.nanoTime()
      val q = spark.readStream.schema(schema).parquet(srcDir)
        .select(col("doc_id"))
        .writeStream.format("memory").queryName(s"floor_$i")
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val n = spark.table(s"floor_$i").count()
      println(f"stateless rep $i: ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
    }
    // and with ONE stateful op (dropDuplicates) to price the state layer
    (0 until reps).foreach { i =>
      val t0 = System.nanoTime()
      val q = spark.readStream.schema(schema).parquet(srcDir)
        .select(col("doc_id")).dropDuplicates("doc_id")
        .writeStream.format("memory").queryName(s"state_$i")
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val n = spark.table(s"state_$i").count()
      println(f"stateful  rep $i: ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
    }
    spark.stop()
  }
}
