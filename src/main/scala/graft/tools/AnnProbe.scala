package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Scratch diagnostic for the batch k-NN join: build the IVF index over
  * a corpus and time knnJoin at |Q| = corpus (the hard-negative-mining
  * shape the bench's ann lifecycle times). Usage: AnnProbe <dir> <reps>. */
object AnnProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        sys.env.getOrElse("ANNPROBE_OHA_THRESHOLD", "128"))
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.sql.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args(0); val reps = args(1).toInt
    val idx = "/tmp/annprobe_idx"
    def rmTree(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(rmTree)
      f.delete(): Unit
    }
    rmTree(new java.io.File(idx))
    val emb = graft.Tables.table(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding")).persist()
    val n = emb.count()
    val dim = emb.select("embedding").head().getSeq[Float](0).length
    graft.pipeline.AnnIndex.build(emb, idx, dim = dim,
      nPlanes = 16, nCentroids = 64)
    println(s"n=$n dim=$dim")
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val c = graft.pipeline.AnnIndex.knnJoin(spark, idx, emb,
        k = 5, nProbe = 2).count()
      println(f"self rep $i: ${(System.nanoTime() - t0) / 1e9}%.3f s ($c rows)")
    }
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val c = graft.pipeline.AnnIndex.knnJoin(spark, idx,
        emb.where(col("vec_id") < 32), k = 10, nProbe = 8).count()
      println(f"probe32 rep $i: ${(System.nanoTime() - t0) / 1e9}%.3f s ($c rows)")
    }
    spark.stop()
  }
}
