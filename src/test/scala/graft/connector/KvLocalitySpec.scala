package graft.connector

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scan locality (reference: HBasePartition.scala:26-38 region servers,
  * consumed at HBaseSQLReaderRDD.scala:107-111): planned partitions
  * surface `preferredLocations` through the standard DSv2 hook. The
  * default resolver reports none (local files / object storage — and
  * zero cost on the 10k-segment planning path); a co-located DFS
  * deployment installs one and every partition starts carrying hosts. */
class KvLocalitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def findScan(p: SparkPlan): Option[BatchScanExec] = p match {
    case b: BatchScanExec => Some(b)
    case a: AdaptiveSparkPlanExec => findScan(a.executedPlan)
    case q: QueryStageExec => findScan(q.plan)
    case other => other.children.view.flatMap(findScan).headOption
  }

  private def partitionsOf(df: DataFrame) = {
    df.collect()
    findScan(df.queryExecution.executedPlan)
      .getOrElse(fail("no BatchScanExec in plan"))
      .scan.asInstanceOf[GraftKvScan].toBatch.planInputPartitions()
  }

  // multi-segment disjoint table + an appended overlapping generation
  private lazy val path: String = {
    val p = java.nio.file.Files.createTempDirectory("kv_loc").toString + "/t"
    spark.range(20000).coalesce(1)
      .select(col("id").as("k"), (col("id") % 97).as("v"))
      .write.format("graftkv").option("key", "k")
      .option("segment.maxBytes", "65536").mode("overwrite").save(p)
    spark.range(0, 20000, 2).coalesce(1)
      .select(col("id").as("k"), lit(-1L).as("v"))
      .write.format("graftkv").mode("append").save(p)
    p
  }

  test("default resolver: no preferred locations, partitions still plan") {
    val parts = partitionsOf(KvCommands.table(spark, path))
    assert(parts.nonEmpty)
    assert(parts.forall(_.preferredLocations().isEmpty))
  }

  test("installed resolver: every partition carries its segment's hosts," +
      " merge components majority-vote") {
    val saved = SegmentLocality.resolver
    try {
      // second host unique per path so the merge majority is h1 alone
      SegmentLocality.resolver = p => Seq("h1", "h-" + p.hashCode)
      val parts = partitionsOf(KvCommands.table(spark, path))
      assert(parts.nonEmpty)
      // every partition reports hosts, and the common host is everywhere
      assert(parts.forall(_.preferredLocations().nonEmpty))
      assert(parts.forall(_.preferredLocations().contains("h1")))
      // merge partitions exist on this overlapping table and carry the
      // majority host first
      val merges = parts.collect { case m: GraftKvMergePartition => m }
      assert(merges.nonEmpty)
      assert(merges.forall(_.preferredLocations().head == "h1"))
    } finally SegmentLocality.resolver = saved
  }

  test("ofMany orders hosts by coverage and caps at 3") {
    val saved = SegmentLocality.resolver
    try {
      SegmentLocality.resolver = {
        case "d/a" => Seq("h1", "h2")
        case "d/b" => Seq("h2", "h3")
        case "d/c" => Seq("h2", "h4", "h5")
        case _ => Nil
      }
      val hs = SegmentLocality.ofMany("d", Seq("a", "b", "c"))
      assert(hs.length == 3)
      assert(hs.head == "h2") // on all three members
      assert(SegmentLocality.ofMany("d", Seq("zzz")).isEmpty)
    } finally SegmentLocality.resolver = saved
  }
}
