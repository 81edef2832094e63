package graft.sql

import graft.connector.GraftKvTable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

/** Shared plumbing of the derived-structure rewrites (KvIndexRule,
  * KvMatViewRule): both rewrite ONLY whole-table reads onto structures
  * whose watermark equals the base's current manifest version, and both
  * must degrade — never fail — when a derived table vanishes under
  * them. */
private[sql] object KvRewrites {

  /** Whole-table read semantics only: a snapshot (VERSION AS OF) read
    * predates any in-sync structure's watermark by definition, and
    * file-restricted (compaction-group) or paced streaming reads are
    * partial by design — none of them may be answered from a derived
    * structure. */
  def wholeTableRead(r: DataSourceV2Relation): Boolean = {
    val tbl = r.table.asInstanceOf[GraftKvTable]
    !tbl.isSnapshotView &&
      !r.options.containsKey("snapshot.version") &&
      !r.options.containsKey("files") &&
      !r.options.containsKey("maxFilesPerTrigger")
  }

  /** Resolve a derived table's relation, or None — running `onFail`
    * (typically a listing-cache invalidation) — when it cannot be
    * opened: a cross-process DROP leaves this process's cache pointing
    * at a dead path until the next base commit, and staleness must
    * stay an optimization gap, never a query failure. */
  def resolveRelation(spark: SparkSession, path: String,
      runtimeFiltering: Boolean = true)(
      onFail: => Unit): Option[LogicalPlan] =
    try Some(spark.read.format("graftkv").option("path", path)
      .option(graft.connector.GraftKvTable.RuntimeFilteringOption,
        runtimeFiltering.toString)
      .load().queryExecution.analyzed)
    catch {
      case scala.util.control.NonFatal(_) =>
        onFail
        None
    }
}
