package graft

import graft.connector.GraftKvScan
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan

/** Shared plan-introspection helpers for the specs: collect the graftkv
  * scans of an executed plan, recursing through AQE's wrapper nodes
  * (QueryStageExec holds its plan as a field, not a child) and into
  * subqueries. */
object PlanTestUtils {

  def kvScans(p: SparkPlan): Seq[GraftKvScan] = {
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    val here = p match {
      case a: AdaptiveSparkPlanExec => kvScans(a.executedPlan)
      case q: QueryStageExec => kvScans(q.plan)
      case b: BatchScanExec =>
        b.scan match { case s: GraftKvScan => Seq(s); case _ => Seq.empty }
      case _ => Seq.empty
    }
    here ++ p.children.flatMap(kvScans) ++ p.subqueries.flatMap(kvScans)
  }

  def kvScans(df: DataFrame): Seq[GraftKvScan] =
    kvScans(df.queryExecution.executedPlan)

  /** The BatchScanExec NODES over graftkv scans (runtimeFilters and
    * other exec-level state live on the node, not the Scan). */
  def kvBatchScans(p: SparkPlan)
      : Seq[org.apache.spark.sql.execution.datasources.v2.BatchScanExec] = {
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    val here = p match {
      case a: AdaptiveSparkPlanExec => kvBatchScans(a.executedPlan)
      case q: QueryStageExec => kvBatchScans(q.plan)
      case b: BatchScanExec if b.scan.isInstanceOf[GraftKvScan] => Seq(b)
      case _ => Seq.empty
    }
    here ++ p.children.flatMap(kvBatchScans) ++ p.subqueries.flatMap(kvBatchScans)
  }
}
