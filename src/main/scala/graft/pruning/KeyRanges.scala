package graft.pruning

import org.apache.spark.sql.types.DataType

/** Pruning-only disjoint multi-range predicate on one column — the
  * bounded-size over-approximation of a LARGE runtime IN set (the
  * surviving join keys a dynamic-pruning subquery hands the scan).
  *
  * `[los(i), his(i)]` are INCLUSIVE bounds in the NORMALIZED value
  * domain ([[TriEval.normalize]]), sorted ascending and pairwise
  * disjoint under the column type's [[TriEval.comparator]]. Built by
  * [[KeyRanges.coalesce]] from the sorted distinct IN values, so every
  * original value lies inside some range: pruning with the ranges can
  * never drop a matching row, and the join that produced the runtime
  * filter re-applies the exact condition downstream — identical
  * soundness to the reference's critical-point pruning, which also
  * over-approximates per dimension and relies on the final predicate
  * re-check (/root/reference src/main/scala/org/apache/spark/sql/
  * hbase/HBaseCriticalPoint.scala, re-derived).
  *
  * Spark 4 seals `sources.Filter`, so this cannot ride the pushed
  * filter tree; the scan planner threads it beside the filters and
  * applies it at the same three points the filter algebra prunes:
  * lead-dimension range intersection, per-segment key bounds, and
  * per-component zone maps.
  */
final case class KeyRanges(attribute: String, dataType: DataType,
    los: Array[Any], his: Array[Any]) {
  require(los.length == his.length && los.nonEmpty,
    "KeyRanges needs matching non-empty bound arrays")

  @transient private lazy val cmp = TriEval.comparator(dataType)

  /** The ranges as sorted disjoint [[TriEval.ValueRange]]s (both bounds
    * inclusive), for intersection with critical-point qualified sets. */
  def toValueRanges: Seq[TriEval.ValueRange] =
    los.indices.map(i => TriEval.ValueRange(
      Some(los(i)), loInc = true, Some(his(i)), hiInc = true))

  /** Index of the last range whose lower bound is ≤ v; -1 if none. */
  private def floorIdx(v: Any): Int = {
    var lo = 0
    var hi = los.length - 1
    var best = -1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      if (cmp(los(mid), v) <= 0) { best = mid; lo = mid + 1 } else hi = mid - 1
    }
    best
  }

  /** Three-valued evaluation against a column binding, mirroring the
    * TriEval contract: True = every point of the binding's range is
    * covered, False = none can be, Unknown otherwise (or no binding).
    * Open binding bounds are treated as closed — over-approximating
    * the binding only pushes a provable True/False toward Unknown,
    * which is always sound for pruning. */
  def eval(bound: Map[String, TriEval.Binding]): TriEval.Tri =
    bound.get(attribute) match {
      case None => TriEval.Unknown
      case Some(b) =>
        val r = b.range
        if (r.isPoint(b.cmp)) {
          val j = floorIdx(r.lo.get)
          if (j >= 0 && cmp(r.lo.get, his(j)) <= 0) TriEval.True
          else TriEval.False
        } else {
          // candidate = last range starting at/below the binding's top;
          // his are ascending (disjoint sorted), so it carries the max
          // upper bound among all ranges not starting above the binding
          val j = r.hi match {
            case None => los.length - 1
            case Some(h) => floorIdx(h)
          }
          if (j < 0) TriEval.False
          else if (r.lo.exists(l => cmp(his(j), l) < 0)) TriEval.False
          else if (r.lo.exists(l => cmp(los(j), l) <= 0) &&
            r.hi.exists(h => cmp(h, his(j)) <= 0)) TriEval.True
          else TriEval.Unknown
        }
    }

  override def toString: String =
    s"KeyRanges($attribute, ${los.length} ranges)"
}

object KeyRanges {

  /** Numeric distance between two NORMALIZED values, for gap-driven
    * coalescing; None for types with no usable measure (strings,
    * binary), which fall back to equal-count runs. Integral distances
    * subtract in DOUBLE: raw Long/Int subtraction wraps for values
    * spanning more than half the type's domain, and a wrapped
    * (negative) inter-cluster gap would sort LAST — every split would
    * land inside the dense runs and the biggest gap would never be
    * cut, silently reintroducing the [min,max] cliff. Double precision
    * loss at huge magnitudes only blurs the RANKING of near-equal
    * gaps, never the sign. */
  private def gapMeasure(dt: DataType): Option[(Any, Any) => Double] = {
    import org.apache.spark.sql.types._
    dt match {
      case LongType | TimestampType | TimestampNTZType =>
        Some((a, b) => b.asInstanceOf[Long].toDouble - a.asInstanceOf[Long].toDouble)
      case IntegerType | DateType =>
        Some((a, b) => b.asInstanceOf[Int].toDouble - a.asInstanceOf[Int].toDouble)
      case ShortType =>
        Some((a, b) => (b.asInstanceOf[Short] - a.asInstanceOf[Short]).toDouble)
      case ByteType =>
        Some((a, b) => (b.asInstanceOf[Byte] - a.asInstanceOf[Byte]).toDouble)
      case DoubleType =>
        Some((a, b) => b.asInstanceOf[Double] - a.asInstanceOf[Double])
      case FloatType =>
        Some((a, b) => b.asInstanceOf[Float].toDouble - a.asInstanceOf[Float].toDouble)
      case _: DecimalType =>
        Some((a, b) => b.asInstanceOf[org.apache.spark.sql.types.Decimal]
          .toBigDecimal.-(a.asInstanceOf[org.apache.spark.sql.types.Decimal]
            .toBigDecimal).toDouble)
      case _ => None
    }
  }

  /** Coalesce the raw IN values into at most `maxRanges` disjoint
    * inclusive ranges. The split points are the `maxRanges - 1`
    * LARGEST gaps between adjacent sorted values when the type has a
    * numeric measure — surviving join keys cluster (a dim filter
    * selects contiguous-ish key populations), and the gaps between
    * clusters carry all the pruning power a range set can express.
    * Consecutive integers have gap 1, so dense runs merge first and a
    * fully dense survivor set collapses to a single exact range.
    * Types without a measure split into equal-count runs, which still
    * bounds every range by actual surviving keys (monotonically
    * tighter than one global [min, max]). None when nothing
    * normalizes (all-null values). */
  def coalesce(attribute: String, dt: DataType, vals: Seq[Any],
      maxRanges: Int): Option[KeyRanges] = {
    require(maxRanges >= 1)
    val cmp = TriEval.comparator(dt)
    val norm = vals.iterator
      .map(TriEval.normalize(dt, _))
      .filter(_ != null).toArray
    if (norm.isEmpty) return None
    java.util.Arrays.sort(norm.asInstanceOf[Array[AnyRef]],
      new java.util.Comparator[AnyRef] {
        def compare(a: AnyRef, b: AnyRef): Int = cmp(a, b)
      })
    // drop adjacent duplicates (distinct under the dimension ordering)
    val distinct = new scala.collection.mutable.ArrayBuffer[Any](norm.length)
    norm.foreach { v =>
      if (distinct.isEmpty || cmp(distinct.last, v) != 0) distinct += v
    }
    val n = distinct.length
    val splits: Array[Int] = // indices i where a range ends at distinct(i)
      if (n <= maxRanges) Array.tabulate(n - 1)(identity)
      else gapMeasure(dt) match {
        case Some(measure) =>
          val gaps = Array.tabulate(n - 1)(i =>
            (measure(distinct(i), distinct(i + 1)), i))
          // descending by gap size; ties broken by position for determinism
          java.util.Arrays.sort(gaps.asInstanceOf[Array[AnyRef]],
            new java.util.Comparator[AnyRef] {
              def compare(a: AnyRef, b: AnyRef): Int = {
                val (ga, ia) = a.asInstanceOf[(Double, Int)]
                val (gb, ib) = b.asInstanceOf[(Double, Int)]
                val c = java.lang.Double.compare(gb, ga)
                if (c != 0) c else Integer.compare(ia, ib)
              }
            })
          gaps.take(maxRanges - 1).map(_._2).sorted
        case None =>
          // equal-count runs: ceil(n / maxRanges) values per range
          val per = (n + maxRanges - 1) / maxRanges
          Array.range(per - 1, n - 1, per)
      }
    val los = new Array[Any](splits.length + 1)
    val his = new Array[Any](splits.length + 1)
    var start = 0
    var r = 0
    while (r < splits.length) {
      los(r) = distinct(start)
      his(r) = distinct(splits(r))
      start = splits(r) + 1
      r += 1
    }
    los(r) = distinct(start)
    his(r) = distinct(n - 1)
    Some(KeyRanges(attribute, dt, los, his))
  }
}
