package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off scale probe for the near-dup chain (round-6 verdict item):
  * times dd3 + reports docs/distinct/candidates/verified at an
  * arbitrary corpus dir (e.g. a 100× replicate, where duplicate
  * cliques grow 100× in SIZE — the worst case for candidate growth).
  * Not part of the driver bench; run with
  * `runMain graft.tools.DedupScaleProbe <dir-with-documents.parquet>`. */
object DedupScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf10docs")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions.{col, md5}
    val docs = graft.Tables.table(spark, dir, "documents")
    val nDocs = docs.count()
    val nDistinct = docs.select(md5(col("text"))).distinct().count()
    val reps = graft.pipeline.Dedup.dropExactDuplicates(docs)
    val cands = graft.pipeline.Dedup.lshCandidatePairs(
      graft.pipeline.Dedup.minhashSignatures(reps)).count()
    // warm once (codegen), then time steady-state
    graft.pipeline.Dedup.minhashNearDuplicates(docs).count()
    val t0 = System.nanoTime()
    val verified = graft.pipeline.Dedup.minhashNearDuplicates(docs).count()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"""{"dir":"$dir","docs":$nDocs,"distinct_texts":$nDistinct,"rep_candidates":$cands,"verified_pairs":$verified,"dd3_sec":$sec%.3f}""")
    spark.stop()
  }
}
