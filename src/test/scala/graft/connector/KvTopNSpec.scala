package graft.connector

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Pushed-TopN segment selection: ORDER BY a key prefix + LIMIT plans
  * only the boundary-covered head/tail of the sorted segment chain on a
  * disjoint table — "first/latest k by key" must not scan the table. */
class KvTopNSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def findScan(p: SparkPlan): Option[BatchScanExec] = p match {
    case b: BatchScanExec => Some(b)
    case a: AdaptiveSparkPlanExec => findScan(a.executedPlan)
    case q: QueryStageExec => findScan(q.plan)
    case other => other.children.view.flatMap(findScan).headOption
  }

  private def scanOf(df: DataFrame): GraftKvScan = {
    df.collect()
    findScan(df.queryExecution.executedPlan)
      .getOrElse(fail("no BatchScanExec in plan"))
      .scan.asInstanceOf[GraftKvScan]
  }

  // bulk-loaded (disjoint, tombstone-free) multi-segment table
  private lazy val path: String = {
    val p = java.nio.file.Files.createTempDirectory("kv_topn").toString + "/t"
    spark.range(50000).coalesce(1)
      .select(col("id").as("k"), (col("id") % 997).as("v"))
      .write.format("graftkv").option("key", "k")
      .option("segment.maxBytes", "65536").mode("overwrite").save(p)
    p
  }
  private def table: DataFrame = spark.read.format("graftkv").load(path)
  private lazy val total: Int = scanOf(table).staticPartitionCount

  test("ORDER BY key LIMIT k scans only the head segments, exact rows") {
    assert(total > 10, s"fixture built only $total segments")
    val df = table.orderBy("k").limit(5)
    val got = df.as[(Long, Long)].collect()
    assert(got.sameElements((0L until 5L).map(i => (i, i % 997))))
    val planned = scanOf(df).staticPartitionCount
    assert(planned >= 1 && planned < total / 2,
      s"topN planned $planned of $total partitions")
  }

  test("ORDER BY key DESC LIMIT k scans only the tail segments, exact rows") {
    val df = table.orderBy(col("k").desc).limit(5)
    val got = df.as[(Long, Long)].collect()
    assert(got.sameElements((49999L to 49995L by -1L).map(i => (i, i % 997))))
    val planned = scanOf(df).staticPartitionCount
    assert(planned >= 1 && planned < total / 2,
      s"topN planned $planned of $total partitions")
  }

  test("lead filter + ORDER BY + LIMIT stays exact (partial coverage counts zero)") {
    val df = table.filter(col("k") >= 30000L).orderBy("k").limit(3)
    val got = df.as[(Long, Long)].collect()
    assert(got.sameElements((30000L until 30003L).map(i => (i, i % 997))))
    val planned = scanOf(df).staticPartitionCount
    assert(planned < total / 2, s"filtered topN planned $planned of $total")
  }

  test("non-key ordering is not accepted; results stay exact") {
    val df = table.orderBy(col("v"), col("k")).limit(3)
    val got = df.as[(Long, Long)].collect()
    assert(got.sameElements(Seq((0L, 0L), (997L, 0L), (1994L, 0L))))
    assert(scanOf(df).staticPartitionCount == total)
  }

  test("overlapping appends disable selection until compacted; rows exact") {
    val p2 = java.nio.file.Files.createTempDirectory("kv_topn_ov").toString + "/t"
    spark.range(1000).coalesce(1).select(col("id").as("k"), col("id").as("v"))
      .write.format("graftkv").option("key", "k")
      .option("segment.maxBytes", "8192").mode("overwrite").save(p2)
    // overlapping upsert: rewrites keys 0..99 with v+1 in a NEW generation
    spark.range(100).coalesce(1)
      .select(col("id").as("k"), (col("id") + 1).as("v"))
      .write.format("graftkv").option("key", "k").mode("append").save(p2)
    val df = spark.read.format("graftkv").load(p2).orderBy("k").limit(5)
    val got = df.as[(Long, Long)].collect()
    // last-write-wins: v = k + 1 for the rewritten head keys
    assert(got.sameElements((0L until 5L).map(i => (i, i + 1))))
  }
}
