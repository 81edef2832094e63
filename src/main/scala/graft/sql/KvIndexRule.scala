package graft.sql

import graft.connector.{GraftKvTable, KvIndex, KvIndexDef}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.planning.PhysicalOperation
import org.apache.spark.sql.catalyst.plans.LeftSemi
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

/** Secondary-index query rewrite: a selective, null-rejecting predicate
  * on an indexed value column of a graftkv table turns into a LEFT SEMI
  * join against the index table's primary keys:
  *
  * {{{
  * Filter(c = v AND rest, kv)
  *   ==>  Filter(c = v AND rest,
  *          kv ⋉_{pk} Project(pk, Filter(c = v, index)))
  * }}}
  *
  * The index is keyed (c, pk...), so `c = v` is a leading-key seek on
  * the index, and the semi-join's tiny build side reaches the base scan
  * as a runtime IN over the primary key (SupportsRuntimeV2Filtering —
  * the same machinery that prunes star joins), which prunes base
  * segments and seek ranges instead of scanning the table. The
  * ORIGINAL filter stays in place, so the rewrite is correctness-
  * neutral by construction: the semi-join can only REMOVE rows the
  * index proves absent, and it is applied only when the index is
  * provably exact — `KvIndex.inSync` pins its watermark to the base
  * table's current manifest version (an O(1) probe), and every
  * accepted predicate shape is null-rejecting, so rows missing from
  * the index (NULL indexed value) could not have matched anyway.
  * Disable with `spark.graft.index.rewrite=false`. */
case class KvIndexRule(spark: SparkSession) extends Rule[LogicalPlan]
    with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (spark.conf.get("spark.graft.index.rewrite", "true") != "true") return plan
    // COVERING pass first (top-down, so the Project above the Filter is
    // visible before the semi-join pass restructures the Filter): a
    // query needing only (indexed col, pk...) columns reads the INDEX
    // alone — no base-table access at all.
    val covered = plan.transformDown {
      case p @ Project(projList, Filter(cond, r: DataSourceV2Relation))
          if r.table.isInstanceOf[GraftKvTable] &&
            r.getTagValue(KvIndexRule.Applied).isEmpty =>
        covering(projList, cond, r).getOrElse(p)
    }
    covered.transformUp {
      case f @ Filter(cond, r: DataSourceV2Relation)
          if r.table.isInstanceOf[GraftKvTable] &&
            r.getTagValue(KvIndexRule.Applied).isEmpty =>
        rewrite(f, cond, r).getOrElse(f)
    }
  }

  private def eligible(r: DataSourceV2Relation): Boolean =
    KvRewrites.wholeTableRead(r)

  /** Answer the whole Project+Filter from the index when every
    * referenced column is stored there (single-column index: the
    * indexed value + the full primary key) and the predicate rejects
    * NULL indexed values (rows the index omits). The index's rows ARE
    * the base's live non-null-c rows — same multiplicity, one entry
    * per pk — so substituting the relation is exact, not a pruning. */
  private def covering(projList: Seq[NamedExpression], cond: Expression,
      r: DataSourceV2Relation): Option[LogicalPlan] = {
    if (!eligible(r)) return None
    val tbl = r.table.asInstanceOf[GraftKvTable]
    val base = tbl.kvPath
    val defs = KvIndex.usableForPlanning(base)
    if (defs.isEmpty) return None
    val conjuncts = splitConjunctivePredicates(cond)
    val candidates = for {
      d <- defs
      attrs = d.cols.map(c => r.output.find(_.name == c))
      if attrs.forall(_.isDefined)
      colAttrs = d.cols.zip(attrs.flatten)
      // the index omits a row when ANY indexed column is NULL, so the
      // predicate must reject NULLs on the lead (an indexable shape)
      // AND on every trailing indexed column
      if conjuncts.exists(KvIndexRule.indexable(_, colAttrs.head._2))
      if colAttrs.tail.forall { case (_, a) =>
        conjuncts.exists(c => KvIndexRule.indexable(c, a) ||
          KvIndexRule.isNotNullOn(c, a))
      }
      coveredNames = (d.cols ++ tbl.kvKeys).toSet
      if (projList ++ conjuncts).forall(_.references.forall(a =>
        coveredNames.contains(a.name)))
    } yield d
    candidates.headOption.flatMap { d =>
      indexRelation(base, d).map { idxRel =>
        val idxOut = idxRel.output.map(a => a.name -> a).toMap
        def remap(e: Expression): Expression = e.transform {
          case a: AttributeReference if idxOut.contains(a.name) => idxOut(a.name)
        }
        // keep the ORIGINAL output attribute ids — parents reference them
        val mapped = projList.map {
          case a: AttributeReference =>
            Alias(idxOut(a.name), a.name)(exprId = a.exprId)
          case ne => remap(ne).asInstanceOf[NamedExpression]
        }
        Project(mapped, Filter(remap(cond), idxRel))
      }
    }
  }

  private def indexRelation(base: String, d: KvIndexDef,
      runtimeFiltering: Boolean = true): Option[LogicalPlan] =
    KvRewrites.resolveRelation(spark, KvIndex.indexPath(base, d.name),
      runtimeFiltering)(KvIndex.invalidate(base))

  private def rewrite(f: Filter, cond: Expression,
      r: DataSourceV2Relation): Option[LogicalPlan] = {
    val tbl = r.table.asInstanceOf[GraftKvTable]
    if (!eligible(r)) return None
    val base = tbl.kvPath
    val defs = KvIndex.usableForPlanning(base)
    if (defs.isEmpty) return None
    val conjuncts = splitConjunctivePredicates(cond)
    // selectivity gate: an unselective predicate (say `c >= epoch_start`
    // matching most of the table) would turn the rewrite into a near-
    // full index scan + a semi-join carrying most primary keys — worse
    // than the plain scan it replaces, catastrophically so at 100 TB.
    // Estimate the matching fraction from the index's packed per-segment
    // leading-key bounds (metadata only; upper bound by construction)
    // and skip the rewrite past the threshold.
    // malformed values fall back to the default — the gate must never
    // turn into a planning failure
    val maxSel = spark.conf
      .get("spark.graft.index.rewrite.maxSelectivity", "0.5")
      .toDoubleOption.getOrElse(0.5)
    val candidates = for {
      d <- defs
      attrs = d.cols.map(c => r.output.find(_.name == c))
      if attrs.forall(_.isDefined)
      colAttrs = d.cols.zip(attrs.flatten)
      usableLead = conjuncts.filter(KvIndexRule.indexable(_, colAttrs.head._2))
      if usableLead.nonEmpty
      // EXACTNESS on a multi-column index: a base row is absent from it
      // whenever ANY indexed column is NULL — the semi-join may only
      // remove rows the original predicate rejects, so every trailing
      // indexed column needs a null-rejecting conjunct too
      if colAttrs.tail.forall { case (_, a) =>
        conjuncts.exists(c => KvIndexRule.indexable(c, a) ||
          KvIndexRule.isNotNullOn(c, a))
      }
      // trailing-column comparisons forward to the index scan (its own
      // non-lead pruning/blooms consume them); the selectivity gate
      // estimates from the LEAD predicate, the index's seek dimension
      usable = usableLead ++ colAttrs.tail.flatMap { case (_, a) =>
        conjuncts.filter(KvIndexRule.indexable(_, a))
      }
      if KvIndexRule.toV1(usableLead, d.cols.head).forall(p =>
        KvIndex.estimateLeadMatchFraction(KvIndex.indexPath(base, d.name), p)
          .forall(_ <= maxSel)) // no estimate ⇒ don't block
    } yield (d, colAttrs, usable)
    candidates.headOption.flatMap { case (d, colAttrs, usable) =>
      val byId = colAttrs.map { case (n, a) => a.exprId -> n }.toMap
      def onIndex(out: Map[String, Attribute]): Expression =
        usable.map(_.transform {
          case a: AttributeReference if byId.contains(a.exprId) =>
            out(byId(a.exprId))
        }).reduce(And)
      // both auxiliary index relations decline runtime filtering: the
      // rule injects the only useful runtime prune itself (base-side
      // DPP); Spark's PartitionPruning would otherwise add a REVERSE
      // DPP onto the index side with onlyInBroadcast=true, which
      // degenerates to dynamicpruningexpression(true) at execution — a
      // dead subquery and a "Can't translate true" WARN per run
      indexRelation(base, d, runtimeFiltering = false)
        .zip(indexRelation(base, d, runtimeFiltering = false)).map {
        case (idxRel, dppRel) => buildRewrite(cond, r, tbl, d, onIndex,
          idxRel, dppRel)
      }
    }
  }

  private def buildRewrite(cond: Expression, r: DataSourceV2Relation,
      tbl: GraftKvTable, d: KvIndexDef,
      onIndex: Map[String, Attribute] => Expression,
      idxRel: LogicalPlan, dppRel: LogicalPlan): LogicalPlan = {
    val idxOut = idxRel.output.map(a => a.name -> a).toMap
    val idxPred = onIndex(idxOut)
    val baseOut = r.output.map(a => a.name -> a).toMap
    val pkCond = tbl.kvKeys.map(k =>
      EqualTo(baseOut(k), idxOut(k)): Expression).reduce(And)
    val pks = Project(tbl.kvKeys.map(idxOut), Filter(idxPred, idxRel))
    // The base scan's pruning cannot come from Spark's own
    // PartitionPruning: the index side's predicate is consumed WHOLE
    // by pushdown (it is the index's leading key), so by the time
    // that rule looks for "a selective predicate on the other side"
    // there is no Filter node left to find — and the rule would
    // prune the wrong side. Inject the runtime subquery ourselves:
    // base rows qualify only when their LEAD key appears among the
    // index's matching primary keys, delivered to the scan as a
    // runtime IN (SupportsRuntimeV2Filtering) that re-prunes
    // segments and seek ranges. A separate relation instance (dppRel)
    // keeps the subquery's expr ids disjoint from the semi-join's.
    val dppOut = dppRel.output.map(a => a.name -> a).toMap
    val lead = tbl.kvKeys.head
    // pre-optimize the build side: AQE compiles a DynamicPruning
    // subquery with the planner DIRECTLY (no optimizer pass), exactly
    // as PartitionPruning hands it an already-optimized plan — a raw
    // DataSourceV2Relation here fails "No plan for RelationV2". The
    // nested execute is the OptimizeSubqueries pattern; pushdown
    // keeps the output attribute ids, so buildKeys stay valid.
    val buildQuery = spark.sessionState.optimizer.execute(
      Project(Seq(dppOut(lead)), Filter(onIndex(dppOut), dppRel)))
    val dpp = DynamicPruningSubquery(baseOut(lead), buildQuery,
      buildKeys = Seq(dppOut(lead)), broadcastKeyIndices = Seq(0),
      onlyInBroadcast = false)
    // tag the RELATION: predicate pushdown re-derives Filter-over-
    // relation shapes inside the fixpoint, and an untagged node would
    // re-trigger the rewrite every iteration
    r.setTagValue(KvIndexRule.Applied, true)
    Filter(cond,
      Join(Filter(dpp, r), pks, LeftSemi, Some(pkCond), JoinHint.NONE))
  }
}

object KvIndexRule {
  private[sql] val Applied = TreeNodeTag[Boolean]("graft.index.applied")

  private def nonNullLit(e: Expression): Boolean = e match {
    case l: Literal => l.value != null
    case _ => false
  }

  /** Catalyst → v1 translation of the `indexable` shapes (total over
    * them by construction), for the selectivity estimate — the same
    * filter form the scan's own segment pruning consumes. Values go
    * through convertToScala so UTF8String literals compare as the
    * external strings TriEval normalizes. */
  private[sql] def toV1(conjuncts: Seq[Expression],
      name: String): Option[org.apache.spark.sql.sources.Filter] = {
    import org.apache.spark.sql.catalyst.CatalystTypeConverters
    import org.apache.spark.sql.{sources => v1}
    def ext(l: Expression): Any = {
      val lit = l.asInstanceOf[Literal]
      CatalystTypeConverters.convertToScala(lit.value, lit.dataType)
    }
    def one(e: Expression): Option[v1.Filter] = e match {
      case EqualTo(_: AttributeReference, l) => Some(v1.EqualTo(name, ext(l)))
      case EqualTo(l, _: AttributeReference) => Some(v1.EqualTo(name, ext(l)))
      case GreaterThan(_: AttributeReference, l) => Some(v1.GreaterThan(name, ext(l)))
      case GreaterThan(l, _: AttributeReference) => Some(v1.LessThan(name, ext(l)))
      case GreaterThanOrEqual(_: AttributeReference, l) => Some(v1.GreaterThanOrEqual(name, ext(l)))
      case GreaterThanOrEqual(l, _: AttributeReference) => Some(v1.LessThanOrEqual(name, ext(l)))
      case LessThan(_: AttributeReference, l) => Some(v1.LessThan(name, ext(l)))
      case LessThan(l, _: AttributeReference) => Some(v1.GreaterThan(name, ext(l)))
      case LessThanOrEqual(_: AttributeReference, l) => Some(v1.LessThanOrEqual(name, ext(l)))
      case LessThanOrEqual(l, _: AttributeReference) => Some(v1.GreaterThanOrEqual(name, ext(l)))
      case In(_: AttributeReference, vs) => Some(v1.In(name, vs.map(ext).toArray))
      case Or(a, b) => for { x <- one(a); y <- one(b) } yield v1.Or(x, y)
      case _ => None
    }
    conjuncts.foldLeft(Option.empty[v1.Filter]) {
      case (None, e) => one(e)
      case (Some(acc), e) => one(e).map(v1.And(acc, _))
    }
  }

  /** Explicit IS NOT NULL on the attribute — enough to restore
    * exactness for a trailing indexed column (see the multi-column
    * candidates guard), though it prunes nothing on the index side. */
  private[sql] def isNotNullOn(e: Expression, attr: Attribute): Boolean =
    e match {
      case IsNotNull(a: AttributeReference) => a.exprId == attr.exprId
      case _ => false
    }

  /** Predicate shapes the index can answer: null-rejecting comparisons
    * of the indexed attribute against literals (and OR-combinations of
    * those). Null-rejecting matters — rows with a NULL indexed value
    * are absent from the index, which is exact only because none of
    * these shapes can accept a NULL. */
  private[sql] def indexable(e: Expression, attr: Attribute): Boolean = e match {
    case EqualTo(a: AttributeReference, l) => a.exprId == attr.exprId && nonNullLit(l)
    case EqualTo(l, a: AttributeReference) => a.exprId == attr.exprId && nonNullLit(l)
    case GreaterThan(a: AttributeReference, l) => a.exprId == attr.exprId && nonNullLit(l)
    case GreaterThan(l, a: AttributeReference) => a.exprId == attr.exprId && nonNullLit(l)
    case GreaterThanOrEqual(a: AttributeReference, l) => a.exprId == attr.exprId && nonNullLit(l)
    case GreaterThanOrEqual(l, a: AttributeReference) => a.exprId == attr.exprId && nonNullLit(l)
    case LessThan(a: AttributeReference, l) => a.exprId == attr.exprId && nonNullLit(l)
    case LessThan(l, a: AttributeReference) => a.exprId == attr.exprId && nonNullLit(l)
    case LessThanOrEqual(a: AttributeReference, l) => a.exprId == attr.exprId && nonNullLit(l)
    case LessThanOrEqual(l, a: AttributeReference) => a.exprId == attr.exprId && nonNullLit(l)
    case In(a: AttributeReference, vs) =>
      a.exprId == attr.exprId && vs.nonEmpty && vs.forall(nonNullLit)
    case Or(l, r) => indexable(l, attr) && indexable(r, attr)
    case _ => false
  }
}
