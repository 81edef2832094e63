package graft.sql

import graft.connector.GraftKvTable
import graft.store.SegmentFile
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.planning.PhysicalOperation
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

/** Whole-table `approx_count_distinct` from NDV sketch metadata:
  *
  * {{{
  * Aggregate([], [approx_count_distinct(c), count(*)], kv)
  *   ==>  LocalRelation(one row from merged V9 sketches)
  * }}}
  *
  * Every V9 segment sidecar carries per-column HLL++ register words
  * built with Spark's own [[HyperLogLogPlusPlusHelper]] at the default
  * rsd. Register merge is a per-register max — associative and
  * commutative — so the union of per-segment sketches over a
  * key-disjoint table produces EXACTLY the register state a single
  * scan-side pass would, and the answered estimate is bit-identical to
  * the plan this rule replaces (KvNdvSpec pins it). NULL inputs are
  * skipped on both sides; winners-only folding in the writer keeps each
  * segment's sketch exact over its physical rows.
  *
  * Soundness gate (the metadata-aggregate gate, GraftKvScanBuilder
  * .pushAggregation): whole-table read, fully key-disjoint segments
  * (overlaps hold superseded generations the merge-on-read path
  * suppresses but a sketch union would count), zero tombstones, and a
  * V9 sketch present for every requested column in EVERY live segment
  * (pre-V9 segments refuse the whole rewrite). Sketches are served from
  * the lazily-built `_graft_ndv.vN` pack — O(1) file reads per (table,
  * version) after the first build — so at 100 TB the query reads
  * kilobytes of registers instead of the fact table. Count(*) / a
  * non-distinct COUNT(lit) may ride along (exact from segment counts
  * under the same gate). Disable with `spark.graft.ndv.metadata=false`.
  */
case class KvNdvRule(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (spark.conf.get("spark.graft.ndv.metadata", "true") != "true")
      return plan
    plan.transformDown {
      case a: Aggregate if a.groupingExpressions.isEmpty =>
        tryRewrite(a).getOrElse(a)
    }
  }

  private def tryRewrite(a: Aggregate): Option[LogicalPlan] = a.child match {
    case PhysicalOperation(projects, Nil, r: DataSourceV2Relation)
        if r.table.isInstanceOf[GraftKvTable] &&
          KvRewrites.wholeTableRead(r) &&
          projects.forall(_.isInstanceOf[AttributeReference]) =>
      val tbl = r.table.asInstanceOf[GraftKvTable]
      // which columns need sketches (refuse any untranslatable shape)
      val needed = scala.collection.mutable.LinkedHashSet.empty[String]
      val shapes: Seq[Option[Either[String, Unit]]] =
        a.aggregateExpressions.map {
          case Alias(AggregateExpression(
              hll: HyperLogLogPlusPlus, Complete, false, None, _), _) =>
            hll.child match {
              case att: AttributeReference
                  if hll.relativeSD == SegmentFile.NdvRsd =>
                needed += att.name
                Some(scala.Left(att.name))
              case _ => None
            }
          case Alias(AggregateExpression(
              Count(Seq(Literal(v, _))), Complete, false, None, _), _)
              if v != null =>
            Some(scala.Right(()))
          // COUNT(DISTINCT <the full key set>) is EXACT from metadata:
          // the writer collapses duplicate keys within a segment and the
          // gate guarantees key-disjoint segments, so every live
          // physical row carries a unique composite key (and keys are
          // never null by the codec contract) — the distinct count IS
          // the row count. A key-subset or value-column distinct has no
          // such identity and refuses to the scan.
          case Alias(AggregateExpression(
              Count(cs), Complete, true, None, _), _)
              if cs.nonEmpty &&
                cs.forall(_.isInstanceOf[AttributeReference]) &&
                cs.map(_.asInstanceOf[AttributeReference].name).toSet ==
                  tbl.kvKeys.toSet =>
            Some(scala.Right(()))
          case _ => None
        }
      if (shapes.isEmpty || shapes.exists(_.isEmpty)) return None
      answer(tbl, needed.toSeq).map { case (rows, estimates) =>
        val values: Seq[Any] = shapes.map {
          case Some(scala.Left(col)) => estimates(col)
          case Some(scala.Right(())) => rows
          case None => return None
        }
        LocalRelation(a.output, Seq(InternalRow.fromSeq(values)))
      }
    case _ => None
  }

  /** (total rows, column → estimate) from metadata, or None when the
    * gate refuses. Every failure mode — overlap, tombstones, missing or
    * mis-sized sketches, unreadable metadata — degrades to the scan. */
  private def answer(tbl: GraftKvTable,
      cols: Seq[String]): Option[(Long, Map[String, Long])] = try {
    val path = tbl.kvPath
    val cmp = graft.store.RowCodec(tbl.schema(), tbl.kvKeys,
      tbl.kvEncoding).compareKeys _
    val segs = SegmentFile.listSegments(path)
    if (!SegmentFile.disjointTombstoneFree(segs, cmp)) return None
    // a COUNT-only aggregate (no HLL) needs no sketches — don't make a
    // plain global count(*) build the NDV pack
    val sketches =
      if (cols.isEmpty) Map.empty[String, Seq[SegmentFile.NdvSketch]]
      else SegmentFile.ndvSketches(path)
    // every live segment must carry a correctly-sized sketch per column
    val estimates = cols.map { c =>
      c -> (SegmentFile.mergedNdvEstimate(segs, sketches, c)
        .getOrElse(return None))
    }.toMap
    Some((segs.map(_.count).sum, estimates))
  } catch { case scala.util.control.NonFatal(_) => None }
}
