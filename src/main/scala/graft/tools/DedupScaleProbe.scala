package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale probes for the dedup chain's known superlinear hazards, shared
  * by the driver bench (dedup section of tmp/bench_detail.json) and the
  * standalone CLI below:
  *
  *  - dd3 candidate growth: duplicate cliques grow with corpus
  *    replication; pairs must stay flat after rep-collapse.
  *  - substring-dedup rebuild: a book-length, mostly-duplicated doc is
  *    the O(len × kills) hot spot the round-10 verdict flagged; the
  *    round-11 `array_except` rebuild is O(len + kills) and this probe
  *    pins its seconds on a ~1M-token 90%-duplicated document.
  *  - fuzzy rep-collapse: a 100×-duplicated corpus once materialized
  *    (dup-class size × deletion keys) structs per bucket row; after
  *    the collapse the blocking runs on distinct strings and only the
  *    OUTPUT (true pairs) stays quadratic in class size.
  *
  * Not part of correctness gates; numbers land in bench detail so the
  * next-decade regressions (quadratic rebuilds, clique blowups) are
  * visible round-over-round. Run standalone with
  * `runMain graft.tools.DedupScaleProbe [dd3 <dir> | substring | fuzzy <dir>]`.
  */
object DedupScaleProbe {

  /** ~1M-token single document, 90% duplicated windows: a 100-token
    * block repeated 9,000× (900k tokens — every window after the first
    * block occurrence is a duplicate) followed by 100k unique tokens.
    * Deterministic (no RNG): comparable across rounds. */
  private[tools] def bigDupDoc(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val sb = new StringBuilder(8 << 20)
    var i = 0
    while (i < 900000) { sb.append("w").append(i % 100).append(' '); i += 1 }
    var j = 0
    while (j < 100000) { sb.append("u").append(j).append(' '); j += 1 }
    Seq((1L, sb.toString), (2L, "w0 w1 w2 small control doc"))
      .toDF("doc_id", "text")
  }

  /** Steady-state seconds for the substring-dedup rebuild on the
    * ~1M-token doc (one warm run first), plus the tokens removed —
    * the 90% duplication means ~900k removals, so the rebuild walks
    * len + kills once. Returns (sec, tokens_removed). */
  def substringStress(spark: SparkSession): (Double, Long) = {
    val docs = bigDupDoc(spark)
    def run(): Long = graft.pipeline.Dedup.dedupSubstrings(docs, 8)
      .agg(sum(length(col("clean_text"))), sum(col("n_removed")))
      .head().getLong(1)
    run() // warm (JIT of the window/rebuild pipeline)
    val t0 = System.nanoTime()
    val removed = run()
    ((System.nanoTime() - t0) / 1e9, removed)
  }

  /** Steady-state seconds for fuzzy ED<=1 pairs on a 100×-duplicated
    * customer table (every name in a duplicate class of 100): blocking
    * must stay on distinct strings; the output is quadratic in class
    * size BY DEFINITION (every intra-class pair is a true dist-0 pair).
    * Fixed input (sf0.01 customer) so rounds compare. Returns
    * (sec, pairs). */
  def fuzzyStress(spark: SparkSession,
      srcDir: String = "/root/testdata/sf0.01"): (Double, Long) = {
    val cust = graft.Tables.table(spark, srcDir, "customer")
      .select(col("c_custkey").cast("long").as("c_custkey"), col("c_name"))
    val n = cust.agg(max(col("c_custkey"))).head().getLong(0) + 1
    val reps = spark.range(100).select(col("id").as("rep"))
    val replicated = cust.crossJoin(reps)
      .select((col("c_custkey") + col("rep") * n).as("c_custkey"),
        col("c_name"))
    def run(): Long = graft.pipeline.FuzzyMatch
      .pairsWithinDistance1(replicated, "c_custkey", "c_name").count()
    run() // warm
    val t0 = System.nanoTime()
    val pairs = run()
    ((System.nanoTime() - t0) / 1e9, pairs)
  }

  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("dd3")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    mode match {
      case "substring" =>
        val (sec, removed) = substringStress(spark)
        println(f"""{"probe":"substring_1m","sec":$sec%.3f,"tokens_removed":$removed}""")
      case "fuzzy" =>
        val (sec, pairs) = fuzzyStress(spark,
          args.lift(1).getOrElse("/root/testdata/sf0.01"))
        println(f"""{"probe":"fuzzy_100x","sec":$sec%.3f,"pairs":$pairs}""")
      case _ =>
        val dir = args.lift(1).orElse(args.headOption.filter(_ != "dd3"))
          .getOrElse("/tmp/sf10docs")
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
    }
    spark.stop()
  }
}
