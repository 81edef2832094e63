package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch diagnostic (r16): measure how much a centroid-residual
  * Cauchy–Schwarz upper bound could prune the knnJoin pair space on a
  * REAL index — the distribution of per-query k-th-best exact sims (τ)
  * vs the per-pair bounds. Usage: KnnBoundStats <indexDir> <k> <nProbe>.
  */
object KnnBoundStats {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val idxDir = args(0); val k = args(1).toInt; val np = args(2).toInt
    val cents = graft.pipeline.AnnIndex.loadCentroids(idxDir)
    val centLit = array(cents.map(c => array(c.map(x => lit(x)): _*)): _*)
    val idx = spark.read.parquet(idxDir)
      .filter(col("cell") >= 0)
      .select(col("vec_id"), col("embedding"), col("vnorm"), col("cell"))
      .withColumn("__mu", element_at(centLit, col("cell") + 1))
      .withColumn("__d", zip_with(col("embedding"), col("__mu"),
        (x, m) => x.cast("double") - m))
      .withColumn("__r",
        sqrt(graft.pipeline.Similarity.dot(col("__d"), col("__d"))))
      .drop("__d", "__mu")
    // residual-to-norm ratio: ≈1 means isotropic (bound useless)
    idx.select((col("__r") / col("vnorm")).as("rr"))
      .summary("min", "25%", "50%", "75%", "max").show()
    // self-join pair space, exact sims + bounds (query side = corpus)
    val q = idx.select(col("vec_id").as("query_id"),
      col("embedding").as("__qe"), col("vnorm").as("__qn"),
      col("cell").as("qcell"))
    // probe only the own cell (np=1 proxy — enough for distribution)
    val pairs = idx.join(q, col("cell") === col("qcell"))
      .select(col("query_id"),
        (graft.pipeline.Similarity.dot(col("__qe"), col("embedding"))
          / (col("vnorm") * col("__qn"))).as("sim"),
        ((graft.pipeline.Similarity.dot(col("__qe"),
            element_at(centLit, col("cell") + 1)) / col("__qn")
          + col("__r")) / col("vnorm")).as("bound"))
    pairs.select((col("bound") - col("sim")).as("slack"))
      .summary("min", "25%", "50%", "75%", "max").show()
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc)
    val tau = pairs.withColumn("rk", row_number().over(w))
      .filter(col("rk") === k)
      .select(col("query_id"), col("sim").as("tau"))
    tau.select(col("tau")).summary("min", "25%", "50%", "75%", "max").show()
    val surv = pairs.join(tau, Seq("query_id"))
      .agg(count(lit(1)).as("pairs"),
        sum(when(col("bound") >= col("tau"), 1).otherwise(0)).as("kept"))
      .head()
    println(s"pairs=${surv.getLong(0)} kept=${surv.getLong(1)} " +
      f"fraction=${surv.getLong(1).toDouble / surv.getLong(0)}%.3f")
    spark.stop()
  }
}
