package graft.pipeline

import org.apache.spark.sql.SparkSession

/** Child-process INGESTER for the cross-process index-maintenance fuzz
  * (IndexCrossProcessSpec): appends `nBatches` disjoint batches to a
  * MinHash dedup index AND an IVF ANN index from its own JVM + Spark
  * session, so the lease arbitration with the parent JVM's compactor
  * is genuinely cross-process. Ids start at `base` and are disjoint
  * from anything the parent wrote. Exits non-zero on any failure
  * (including a lease-acquire timeout — the parent treats that as a
  * lost batch, which is the bug the lease exists to prevent). */
object IndexMaintFuzzMain {
  def main(args: Array[String]): Unit = {
    val Array(mhDir, annDir, baseS, nBatchesS, rowsS) = args
    val (base, nBatches, rows) = (baseS.toLong, nBatchesS.toInt, rowsS.toInt)
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("index-maint-fuzz-child")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      import spark.implicits._
      (0 until nBatches).foreach { b =>
        val lo = base + b.toLong * rows
        val docs = (lo until lo + rows).map { i =>
          (i, s"child document $i with tokens ${i * 7} ${i * 13} " +
            s"${i * 29} trailing words for shingling")
        }.toDF("doc_id", "text")
        Dedup.appendToMinhashIndex(docs, mhDir)
        val vecs = (lo until lo + rows).map { i =>
          // the d==0 perturbation makes directions injective in i (the
          // base pattern alone repeats every 17 ids — ties at cosine 1)
          (i, Array.tabulate(8)(d => ((i * 31 + d * 7) % 17 - 8).toFloat +
            (if (d == 0) (i % 997) / 1000.0f else 0f)))
        }.toDF("vec_id", "embedding")
        AnnIndex.append(vecs, annDir)
      }
    } finally spark.stop()
  }
}
