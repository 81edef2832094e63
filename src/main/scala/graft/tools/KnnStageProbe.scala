package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch diagnostic (r16): decompose the knnJoin self-join wall into
  * stages — pair-space join only, + exact sim, + the per-query top-k
  * window — each timed with the noop sink (guide §1.4) so the compute
  * is measured, not the action's column pruning.
  * Usage: KnnStageProbe <indexDir> <k> <nProbe> <reps>. */
object KnnStageProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val idxDir = args(0); val k = args(1).toInt; val np = args(2).toInt
    val reps = args(3).toInt
    val cents = graft.pipeline.AnnIndex.loadCentroids(idxDir)
    val centLit = array(cents.map(c => array(c.map(x => lit(x)): _*)): _*)
    val idx = spark.read.parquet(idxDir)
      .filter(col("cell") >= 0)
      .select(col("vec_id").as("neighbor_id"),
        col("embedding").as("__ce"), col("vnorm"), col("cell"))
    val qRaw = spark.read.parquet(idxDir).filter(col("cell") >= 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("__qe"))
      .withColumn("__qn", sqrt(graft.pipeline.Similarity.dot(
        col("__qe"), col("__qe"))))
    val probeCells = transform(
      slice(array_sort(zip_with(
        transform(centLit, c => graft.pipeline.Similarity.cosine(
          col("__qe"), c)),
        sequence(lit(0), lit(cents.length - 1)),
        (s, i) => struct((-s).as("ns"), i.as("idx")))), 1, np),
      st => st.getField("idx"))
    val q = qRaw.withColumn("cell", explode(probeCells))
    val sim = when(col("vnorm") === 0.0 || col("__qn") === 0.0, lit(0.0))
      .otherwise(graft.pipeline.Similarity.dot(col("__qe"), col("__ce"))
        / (col("vnorm") * col("__qn")))
    import org.apache.spark.sql.expressions.Window
    val win = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("neighbor_id"))
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    println(s"idx scan partitions: ${idx.rdd.getNumPartitions}, " +
      s"q partitions: ${q.rdd.getNumPartitions}")
    val joined = idx.join(q, Seq("cell"))
    println(s"join output partitions: ${joined.rdd.getNumPartitions}")
    locally { val d = joined.select(col("query_id"), col("neighbor_id"))
      d.write.format("noop").mode("overwrite").save()
      println("pairs=" + d.count())
      println(d.queryExecution.executedPlan.toString.split("\n")
        .filter(l => l.contains("Join") || l.contains("Exchange"))
        .mkString("\n")) }
    val stages: Seq[(String, () => Unit)] = Seq(
      "join only (ids)" -> (() =>
        noop(joined.select(col("query_id"), col("neighbor_id")))),
      "join + exact sim" -> (() =>
        noop(joined.select(col("query_id"), col("neighbor_id"),
          sim.as("sim")))),
      "join + sim + window topk" -> (() =>
        noop(joined.select(col("query_id"), col("neighbor_id"),
          sim.as("sim"))
          .withColumn("rk", row_number().over(win))
          .filter(col("rk") <= k)))
    )
    stages.foreach { case (name, f) => f(); () } // warm
    (1 to reps).foreach { i =>
      stages.foreach { case (name, f) =>
        val t0 = System.nanoTime()
        f()
        println(f"rep $i  $name%-26s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      }
    }
    spark.stop()
  }
}
