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
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.types._

/** Whole-table `approx_percentile` from V11 quantile-summary metadata:
  *
  * {{{
  * Aggregate([], [percentile_approx(c, p[, acc]), count(*)], kv)
  *   ==>  LocalRelation(one row from merged per-segment GK summaries)
  * }}}
  *
  * Every V11 segment sidecar carries per-column compressed
  * Greenwald-Khanna summaries built with Spark's own
  * [[org.apache.spark.sql.catalyst.util.QuantileSummaries]] at
  * approx_percentile's DEFAULT accuracy. GK summaries merge within the
  * same ε-rank bound, so the merged answer satisfies exactly the
  * contract the scan-side aggregate promises: a value whose rank is
  * within ε·N of p·N. Unlike the NDV rewrite (register-identical), the
  * answered VALUE may differ from the scan's — both are valid
  * ε-approximations whose identity depends on merge order, scan-side
  * partitioning included; what is invariant is the rank bound, and
  * that is what the gates pin. At 100 TB the query reads kilobytes of
  * summaries instead of the fact table.
  *
  * Soundness gate (the shared metadata-aggregate gate): whole-table
  * read, fully key-disjoint segments, zero tombstones, and a V11
  * summary at the writer's relative error for every requested column
  * in EVERY live segment — any failure degrades to the scan. A query
  * requesting accuracy TIGHTER than the stored summaries also refuses
  * (the metadata cannot honor a bound it never recorded); a looser
  * request is answered (the stored bound implies it). Count(*) /
  * non-distinct COUNT(lit) ride along exactly. Disable with
  * `spark.graft.percentile.metadata=false`.
  */
case class KvPercentileRule(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (spark.conf.get("spark.graft.percentile.metadata", "true") != "true")
      return plan
    plan.transformDown {
      case a: Aggregate if a.groupingExpressions.isEmpty =>
        tryRewrite(a).getOrElse(a)
    }
  }

  /** One requested percentile shape: column, percentages, array-ness. */
  private case class PctShape(col: String, dataType: DataType,
      percentages: Seq[Double], asArray: Boolean)

  private def tryRewrite(a: Aggregate): Option[LogicalPlan] = a.child match {
    case PhysicalOperation(projects, Nil, r: DataSourceV2Relation)
        if r.table.isInstanceOf[GraftKvTable] &&
          KvRewrites.wholeTableRead(r) &&
          projects.forall(_.isInstanceOf[AttributeReference]) =>
      val tbl = r.table.asInstanceOf[GraftKvTable]
      val needed = scala.collection.mutable.LinkedHashSet.empty[String]
      val shapes: Seq[Option[Either[PctShape, Unit]]] =
        a.aggregateExpressions.map {
          case Alias(AggregateExpression(
              ap: ApproximatePercentile, Complete, false, None, _), _) =>
            pctShape(ap).map { s => needed += s.col; scala.Left(s) }
          case Alias(AggregateExpression(
              Count(Seq(Literal(v, _))), Complete, false, None, _), _)
              if v != null =>
            Some(scala.Right(()))
          case _ => None
        }
      if (shapes.isEmpty || shapes.exists(_.isEmpty) ||
        !shapes.exists(_.exists(_.isLeft))) return None
      answer(tbl, needed.toSeq).map { case (rows, summaries) =>
        val values: Seq[Any] = shapes.map {
          case Some(scala.Left(s)) => percentileValue(s, summaries(s.col))
          case Some(scala.Right(())) => rows
          case None => return None
        }
        LocalRelation(a.output, Seq(InternalRow.fromSeq(values)))
      }
    case _ => None
  }

  /** Translate one ApproximatePercentile call — None for any shape the
    * metadata cannot honor (non-attribute child, unsupported type,
    * non-literal or tighter-than-stored accuracy, non-literal
    * percentage). Out-of-range percentages also refuse: the scan-side
    * aggregate owns raising its own error. */
  private def pctShape(ap: ApproximatePercentile): Option[PctShape] = {
    val col = ap.child match {
      case att: AttributeReference if supported(att.dataType) => att
      case _ => return None
    }
    val acc: Long = ap.accuracyExpression match {
      case Literal(v: Int, IntegerType) => v.toLong
      case Literal(v: Long, LongType) => v
      case _ => return None
    }
    // stored bound ε=1/DEFAULT honors any requested ε'=1/acc ≥ ε
    if (acc <= 0 ||
      acc > ApproximatePercentile.DEFAULT_PERCENTILE_ACCURACY) return None
    val (ps, asArray) = ap.percentageExpression match {
      case Literal(p: Double, DoubleType) => (Seq(p), false)
      case Literal(arr: ArrayData, ArrayType(DoubleType, _)) =>
        (arr.toDoubleArray().toSeq, true)
      case _ => return None
    }
    if (ps.exists(p => p < 0.0 || p > 1.0)) return None
    Some(PctShape(col.name, col.dataType, ps, asArray))
  }

  /** The sketchable ordered types the V11 writer summarizes. */
  private def supported(dt: DataType): Boolean = SegmentFile.quantileSketchable(dt)

  /** Query the merged summary and convert back to the column's type the
    * way ApproximatePercentile does (the summary ingested the same
    * double conversion). Empty summary (zero non-null rows) → null,
    * matching the scan aggregate. */
  private def percentileValue(s: PctShape,
      merged: org.apache.spark.sql.catalyst.util.QuantileSummaries): Any = {
    if (merged.count == 0) return null
    val doubles = s.percentages.map(p => merged.query(p).getOrElse(return null))
    val conv: Double => Any = s.dataType match {
      case DoubleType => identity
      case FloatType => d => d.toFloat
      case LongType | TimestampType | TimestampNTZType => d => d.toLong
      case IntegerType | DateType => d => d.toInt
      case ShortType => d => d.toShort
      case ByteType => d => d.toByte
      // narrow decimals sketch the UNSCALED long (exact — the writer
      // poisons any segment holding a value beyond 2^53), so the
      // stored double IS an unscaled integer: rescale it back
      case dec: DecimalType => d => Decimal(
        java.math.BigDecimal.valueOf(d.toLong, dec.scale),
        dec.precision, dec.scale)
      case other => throw new IllegalStateException(s"unreachable: $other")
    }
    val out = doubles.map(conv)
    if (s.asArray) new GenericArrayData(out.toArray) else out.head
  }

  /** (total rows, column → merged summary) from metadata, or None when
    * the gate refuses. Every failure mode degrades to the scan. */
  private def answer(tbl: GraftKvTable, cols: Seq[String])
      : Option[(Long, Map[String,
        org.apache.spark.sql.catalyst.util.QuantileSummaries])] = try {
    val path = tbl.kvPath
    val cmp = graft.store.RowCodec(tbl.schema(), tbl.kvKeys,
      tbl.kvEncoding).compareKeys _
    val segs = SegmentFile.listSegments(path)
    if (segs.isEmpty || !SegmentFile.disjointTombstoneFree(segs, cmp))
      return None
    val sketches = SegmentFile.qsSketches(path)
    val merged = cols.map { c =>
      c -> SegmentFile.mergedQuantileSummaries(segs, sketches, c)
        .getOrElse(return None)
    }.toMap
    Some((segs.map(_.count).sum, merged))
  } catch { case scala.util.control.NonFatal(_) => None }
}
