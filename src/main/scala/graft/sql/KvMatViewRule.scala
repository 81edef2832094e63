package graft.sql

import graft.connector.{GraftKvTable, KvMatView, KvMatViewDef}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.planning.PhysicalOperation
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.types.LongType

/** Transparent aggregate rewrite over incrementally-maintained views
  * ([[KvMatView]]): a GROUP BY that a stored view can answer reads the
  * view instead of the base table —
  *
  * {{{
  * Aggregate(G', aggs, Filter(p, kv))          -- G' ⊆ view group cols,
  *   ==>  Aggregate(G', aggs',                 -- p over group cols only
  *          Filter(p' AND __cnt > 0, view))
  * }}}
  *
  * re-aggregating the view's per-group rows (SUM of sums / SUM of
  * counts), so grouping by a SUBSET of the view's group columns and
  * filters over group columns rewrite too. Answerable aggregates:
  * COUNT(*) / COUNT(col), SUM of a declared sum column (NULL-when-no-
  * input reproduced from the stored non-null counts), MIN/MAX of group
  * columns, and any arithmetic over those.
  *
  * Exactness is version-gated exactly like the secondary-index rewrite
  * ([[KvIndexRule]]): only views whose watermark equals the base
  * table's CURRENT manifest version are considered (an O(1) probe,
  * memoized per version), so view content is never trusted beyond the
  * snapshot it provably reflects. The one semantic gap a fresh
  * watermark does not close is NULL group values — such rows are
  * unrepresentable as view keys and are EXCLUDED from the view by
  * contract, while a base GROUP BY would emit them as NULL groups. The
  * rewrite therefore fires per group column only when the base schema
  * proves the column non-nullable, OR the view's maintained per-column
  * `nullRowsByGroup` counter proves the base holds no such row, OR the
  * query's own filters null-reject the column (then both sides drop
  * the same rows). At 100 TB this is the dashboard win: the same SQL
  * that would re-aggregate the fact table answers from a pre-folded
  * view thousands of times smaller, kept current by CDC-delta
  * refreshes. Disable with `spark.graft.matview.rewrite=false`. */
case class KvMatViewRule(spark: SparkSession) extends Rule[LogicalPlan]
    with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (spark.conf.get("spark.graft.matview.rewrite", "true") != "true")
      return plan
    plan.transformDown {
      case a: Aggregate => tryRewrite(a).getOrElse(a)
    }
  }

  private def eligible(r: DataSourceV2Relation): Boolean =
    KvRewrites.wholeTableRead(r)

  private def tryRewrite(a: Aggregate): Option[LogicalPlan] = a.child match {
    case PhysicalOperation(projects, filters, r: DataSourceV2Relation)
        if r.table.isInstanceOf[GraftKvTable] && eligible(r) &&
          // only pass-through column pruning between agg and scan — an
          // aliasing Project would re-name what the view knows by name
          projects.forall(_.isInstanceOf[AttributeReference]) =>
      val base = r.table.asInstanceOf[GraftKvTable].kvPath
      KvMatView.usableForPlanning(base).view
        .flatMap(d => rewriteWith(a, filters, r, base, d))
        .headOption
    case _ => None
  }

  private def rewriteWith(a: Aggregate, filters: Seq[Expression],
      r: DataSourceV2Relation, base: String,
      d: KvMatViewDef): Option[LogicalPlan] = {
    val groupNames = d.groupCols.toSet
    val baseByName = r.output.map(x => x.name -> x).toMap

    // query groups by a subset of the view's group columns, as plain
    // attributes (grouping expressions would group differently than the
    // stored tuples)
    if (!a.groupingExpressions.forall {
      case att: AttributeReference => groupNames.contains(att.name)
      case _ => false
    }) return None

    // filters must partition groups wholesale: deterministic,
    // subquery-free predicates over group columns only
    val conjuncts = filters.flatMap(splitConjunctivePredicates)
    if (!conjuncts.forall(c => c.deterministic &&
      c.collectFirst { case p: PlanExpression[_] => p }.isEmpty &&
      c.references.forall(att => groupNames.contains(att.name)))) return None

    // NULL-group soundness, per view group column (see scaladoc): each
    // column must be provably NULL-free — by schema, by the view's
    // maintained per-column counter, or by a null-rejecting query
    // filter (then both sides drop the same rows). Together the columns
    // cover every row the view excludes.
    val sound = d.groupCols.zipWithIndex.forall { case (c, i) =>
      baseByName.get(c) match {
        case None => false // schema drift — refuse
        case Some(att) => !att.nullable ||
          d.nullRowsByGroup.lift(i).contains(0L) ||
          conjuncts.exists(nullRejecting(_, att))
      }
    }
    if (!sound) return None

    viewRelation(base, d).flatMap { viewRel =>
      val viewOut = viewRel.output.map(x => x.name -> x).toMap
      if (!(d.groupCols :+ "__cnt").forall(viewOut.contains)) return None

      val translated = a.aggregateExpressions.map(translateNamed(_, d,
        groupNames, viewOut))
      if (translated.exists(_.isEmpty)) return None

      val remappedFilters = conjuncts.map(_.transform {
        case att: AttributeReference if viewOut.contains(att.name) =>
          viewOut(att.name)
      })
      // hidden __cnt = 0 rows (groups a refresh emptied) are not view rows
      val live: Expression = GreaterThan(viewOut("__cnt"), Literal(0L))
      val newChild = Filter(remappedFilters.foldLeft(live)(And), viewRel)
      val newGroups = a.groupingExpressions.map {
        case att: AttributeReference => viewOut(att.name)
      }
      Some(a.copy(groupingExpressions = newGroups,
        aggregateExpressions = translated.map(_.get), child = newChild))
    }
  }

  /** Rewrite one output expression onto the view, keeping the original
    * name and expression id (parents reference them). Group-column
    * leaves remap by name; every aggregate call must translate; any
    * remaining base-side reference refuses the rewrite. */
  private def translateNamed(ne: NamedExpression, d: KvMatViewDef,
      groupNames: Set[String],
      viewOut: Map[String, Attribute]): Option[NamedExpression] = {
    var ok = true
    val t = ne.transformUp {
      case ae @ AggregateExpression(fn, Complete, false, None, _) =>
        translateAgg(fn, d, groupNames, viewOut) match {
          case Some(x) => x
          case None => ok = false; ae
        }
      case _: AggregateExpression => ok = false; ne
      case att: AttributeReference if groupNames.contains(att.name) &&
          viewOut.contains(att.name) => viewOut(att.name)
    }
    if (!ok) return None
    val viewIds = viewOut.values.map(_.exprId).toSet
    if (!t.references.forall(att => viewIds.contains(att.exprId))) return None
    t match {
      case al: Alias => Some(al)
      case att: Attribute => Some(Alias(att, ne.name)(exprId = ne.exprId))
      case other => Some(Alias(other, ne.name)(exprId = ne.exprId))
    }
  }

  /** One aggregate call over the base, as an expression over aggregate
    * calls on the view's stored columns. */
  private def translateAgg(fn: AggregateFunction, d: KvMatViewDef,
      groupNames: Set[String],
      viewOut: Map[String, Attribute]): Option[Expression] = {
    def sumOf(col: String): Expression =
      Sum(viewOut(col)).toAggregateExpression()
    // COUNT over empty input is 0, SUM of a Long column is nullable —
    // coalesce restores COUNT's type AND the global-aggregate-over-
    // empty-table row
    def cntRows: Expression = Coalesce(Seq(sumOf("__cnt"), Literal(0L)))
    fn match {
      case Count(Seq(Literal(v, _))) if v != null => Some(cntRows)
      case Count(Seq(att: AttributeReference)) =>
        if (d.sumCols.contains(att.name) && viewOut.contains(s"__nn_${att.name}"))
          Some(Coalesce(Seq(sumOf(s"__nn_${att.name}"), Literal(0L))))
        // a group column is never NULL within view-covered rows (the
        // soundness gate holds), and a non-nullable column never is:
        // COUNT(col) = COUNT(*)
        else if (groupNames.contains(att.name) || !att.nullable) Some(cntRows)
        else None
      case s: Sum => s.child match {
        case att: AttributeReference if d.sumCols.contains(att.name) &&
            (s.dataType == LongType ||
              s.dataType.isInstanceOf[org.apache.spark.sql.types.DecimalType]) &&
            viewOut.contains(s"__sum_${att.name}") =>
          // SQL SUM: NULL when the (re-aggregated) group had no
          // non-null input. Decimal sums-of-sums widen a digit; the
          // cast back to Sum's own type is exact (ANSI errors on a
          // genuine overflow, exactly where the base SUM would too).
          val total: Expression =
            if (s.dataType == LongType) sumOf(s"__sum_${att.name}")
            else Cast(sumOf(s"__sum_${att.name}"), s.dataType)
          Some(If(GreaterThan(Coalesce(Seq(sumOf(s"__nn_${att.name}"),
            Literal(0L))), Literal(0L)),
            total, Literal(null, s.dataType)))
        case _ => None
      }
      // min/max of a group column: the view's distinct group tuples
      // carry exactly the base's (covered) value set
      case Min(att: AttributeReference) if groupNames.contains(att.name) =>
        Some(Min(viewOut(att.name)).toAggregateExpression())
      case Max(att: AttributeReference) if groupNames.contains(att.name) =>
        Some(Max(viewOut(att.name)).toAggregateExpression())
      // min/max of a DECLARED minmax value column: re-aggregate the
      // stored per-group extremes (min of mins / max of maxes; stored
      // NULL = group had no non-null value, which MIN/MAX skip — the
      // same NULL semantics the base aggregate has)
      case Min(att: AttributeReference) if d.minMaxCols.contains(att.name) &&
          viewOut.contains(s"__min_${att.name}") =>
        Some(Min(viewOut(s"__min_${att.name}")).toAggregateExpression())
      case Max(att: AttributeReference) if d.minMaxCols.contains(att.name) &&
          viewOut.contains(s"__max_${att.name}") =>
        Some(Max(viewOut(s"__max_${att.name}")).toAggregateExpression())
      case _ => None
    }
  }

  private def viewRelation(base: String, d: KvMatViewDef): Option[LogicalPlan] =
    KvRewrites.resolveRelation(spark, KvMatView.mvPath(base, d.name))(
      KvMatView.invalidate(base))

  /** p guarantees attr is not NULL on every accepted row (the shapes
    * KvIndexRule accepts, plus IS NOT NULL; `<=>` is deliberately
    * absent — it accepts NULL). */
  private def nullRejecting(e: Expression, attr: Attribute): Boolean = {
    def lit(x: Expression) = x match {
      case l: Literal => l.value != null
      case _ => false
    }
    e match {
      case IsNotNull(att: AttributeReference) => att.exprId == attr.exprId
      case EqualTo(att: AttributeReference, l) => att.exprId == attr.exprId && lit(l)
      case EqualTo(l, att: AttributeReference) => att.exprId == attr.exprId && lit(l)
      case GreaterThan(att: AttributeReference, l) => att.exprId == attr.exprId && lit(l)
      case GreaterThan(l, att: AttributeReference) => att.exprId == attr.exprId && lit(l)
      case GreaterThanOrEqual(att: AttributeReference, l) => att.exprId == attr.exprId && lit(l)
      case GreaterThanOrEqual(l, att: AttributeReference) => att.exprId == attr.exprId && lit(l)
      case LessThan(att: AttributeReference, l) => att.exprId == attr.exprId && lit(l)
      case LessThan(l, att: AttributeReference) => att.exprId == attr.exprId && lit(l)
      case LessThanOrEqual(att: AttributeReference, l) => att.exprId == attr.exprId && lit(l)
      case LessThanOrEqual(l, att: AttributeReference) => att.exprId == attr.exprId && lit(l)
      case In(att: AttributeReference, vs) =>
        att.exprId == attr.exprId && vs.nonEmpty && vs.forall(lit)
      case And(l, r) => nullRejecting(l, attr) || nullRejecting(r, attr)
      case Or(l, r) => nullRejecting(l, attr) && nullRejecting(r, attr)
      case _ => false
    }
  }
}
