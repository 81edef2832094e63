package graft.pruning

import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._

/** Three-valued (Kleene) evaluation of a source filter tree against
  * per-column *ranges* instead of points — the planning-time core of the
  * reference's partial predicate reduction (/root/reference
  * src/main/scala/org/apache/spark/sql/hbase/catalyst/expressions/
  * PartialPredicateOperations.scala, re-derived for DSv2 source filters):
  * a predicate over a key range is True (every point satisfies it),
  * False (no point can), or Unknown (mixed / not decidable from the
  * range). Pruning drops exactly the False regions; Unknown is always
  * safe because Spark re-evaluates filters post-scan.
  */
object TriEval {

  sealed trait Tri {
    def &&(o: Tri): Tri = (this, o) match {
      case (False, _) | (_, False) => False
      case (True, True) => True
      case _ => Unknown
    }
    def ||(o: Tri): Tri = (this, o) match {
      case (True, _) | (_, True) => True
      case (False, False) => False
      case _ => Unknown
    }
    def not: Tri = this match {
      case True => False
      case False => True
      case Unknown => Unknown
    }
  }
  case object True extends Tri
  case object False extends Tri
  case object Unknown extends Tri

  /** Inclusive-or-open interval over one column's value domain.
    * None bound = unbounded. A point is lo==hi, both inclusive. */
  final case class ValueRange(lo: Option[Any], loInc: Boolean,
      hi: Option[Any], hiInc: Boolean) {
    def isPoint(cmp: (Any, Any) => Int): Boolean =
      lo.isDefined && hi.isDefined && loInc && hiInc && cmp(lo.get, hi.get) == 0
  }
  object ValueRange {
    val full: ValueRange = ValueRange(None, loInc = true, None, hiInc = true)
    def point(v: Any): ValueRange = ValueRange(Some(v), loInc = true, Some(v), hiInc = true)
  }

  /** Normalize an external filter literal into the decoded-key domain
    * (mirrors what the segment reader produces for each type). */
  def normalize(dt: DataType, v: Any): Any = (dt, v) match {
    case (_, null) => null
    case (LongType, n: Number) => n.longValue()
    case (IntegerType, n: Number) => n.intValue()
    case (ShortType, n: Number) => n.shortValue()
    case (ByteType, n: Number) => n.byteValue()
    // canonicalize -0.0 → +0.0: SQL equality treats them equal, but the
    // order-preserving encoding (and any hash of it) does not
    case (DoubleType, n: Number) =>
      val d = n.doubleValue(); if (d == 0.0d) 0.0d else d
    case (FloatType, n: Number) =>
      val f = n.floatValue(); if (f == 0.0f) 0.0f else f
    case (TimestampType, t: java.sql.Timestamp) =>
      t.getTime * 1000L + (t.getNanos % 1000000L) / 1000L
    case (TimestampType, i: java.time.Instant) =>
      i.getEpochSecond * 1000000L + i.getNano / 1000L
    case (TimestampNTZType, dt0: java.time.LocalDateTime) =>
      dt0.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + dt0.getNano / 1000L
    case (DateType, d: java.sql.Date) => d.toLocalDate.toEpochDay.toInt
    case (DateType, d: java.time.LocalDate) => d.toEpochDay.toInt
    // decimals normalize to catalyst Decimal (what decoded keys hold);
    // BigDecimal.compareTo under Decimal.compare is scale-independent
    case (_: DecimalType, d: org.apache.spark.sql.types.Decimal) => d
    case (_: DecimalType, d: java.math.BigDecimal) =>
      org.apache.spark.sql.types.Decimal(d)
    case (_: DecimalType, d: BigDecimal) =>
      org.apache.spark.sql.types.Decimal(d)
    case (_: DecimalType, n: Number) =>
      org.apache.spark.sql.types.Decimal(new java.math.BigDecimal(n.toString))
    case (_: StringType, s) => s.toString
    case (_, other) => other
  }

  def comparator(dt: DataType): (Any, Any) => Int = dt match {
    case LongType | TimestampType | TimestampNTZType => (a, b) =>
      java.lang.Long.compare(a.asInstanceOf[Long], b.asInstanceOf[Long])
    case IntegerType | DateType => (a, b) =>
      Integer.compare(a.asInstanceOf[Int], b.asInstanceOf[Int])
    case ShortType => (a, b) =>
      java.lang.Short.compare(a.asInstanceOf[Short], b.asInstanceOf[Short])
    case ByteType => (a, b) =>
      java.lang.Byte.compare(a.asInstanceOf[Byte], b.asInstanceOf[Byte])
    case DoubleType => (a, b) =>
      java.lang.Double.compare(a.asInstanceOf[Double], b.asInstanceOf[Double])
    case FloatType => (a, b) =>
      java.lang.Float.compare(a.asInstanceOf[Float], b.asInstanceOf[Float])
    case BooleanType => (a, b) =>
      java.lang.Boolean.compare(a.asInstanceOf[Boolean], b.asInstanceOf[Boolean])
    case _: DecimalType => (a, b) =>
      a.asInstanceOf[org.apache.spark.sql.types.Decimal]
        .compare(b.asInstanceOf[org.apache.spark.sql.types.Decimal])
    // strings must compare in UTF-8 byte order (the store's key order and
    // binary collation) — String.compareTo is UTF-16 code-unit order,
    // which disagrees for supplementary-plane codepoints
    case _ => (a, b) =>
      graft.codec.OrderedCodec.compareUtf8(a.toString, b.toString)
  }

  /** Bindings for the columns whose range is known (key dimensions of a
    * segment, or the dimension being qualified); unknown columns are
    * simply absent and evaluate to Unknown. */
  final case class Binding(dt: DataType, range: ValueRange) {
    val cmp: (Any, Any) => Int = comparator(dt)
  }

  /** Evaluate one filter (a full tree — And/Or/Not allowed) against the
    * bound ranges. Key columns are non-nullable by store contract, so
    * IsNull on a bound column is decidable. */
  def eval(f: Filter, bound: Map[String, Binding]): Tri = f match {
    case And(l, r) => eval(l, bound) && eval(r, bound)
    case Or(l, r) => eval(l, bound) || eval(r, bound)
    case Not(c) => eval(c, bound).not

    case EqualTo(a, v) => cmpTri(a, v, bound)(
      // True iff the range is exactly the point v
      (b, nv) => {
        val r = b.range
        if (r.isPoint(b.cmp)) { if (b.cmp(r.lo.get, nv) == 0) True else False }
        else if (outside(b, nv)) False
        else Unknown
      })

    case GreaterThan(a, v) => cmpBound(a, v, bound, (c, _) => c > 0)
    case GreaterThanOrEqual(a, v) => cmpBound(a, v, bound, (c, _) => c >= 0)
    case LessThan(a, v) => cmpBound(a, v, bound, (c, _) => c < 0)
    case LessThanOrEqual(a, v) => cmpBound(a, v, bound, (c, _) => c <= 0)

    case In(a, vs) => bound.get(a) match {
      case None => Unknown
      case Some(b) =>
        val arr = normalizedSorted(vs, b.dt)
        val r = b.range
        if (r.isPoint(b.cmp)) {
          if (sortedContains(arr, r.lo.get, b.cmp)) True else False
        } else if (!anyInRange(arr, b)) False
        else Unknown
    }

    case IsNull(a) => if (bound.contains(a)) False else Unknown // key cols are non-null
    case IsNotNull(a) => if (bound.contains(a)) True else Unknown

    case _ => Unknown
  }

  /** Per-In-instance cache of the normalized, sorted, null-free value
    * array, keyed on the values array's IDENTITY (weak — entries die
    * with the filter tree). One planning pass evaluates the same In
    * node against every candidate range and every segment's bounds;
    * without the cache a wide IN (point-get batching, runtime join
    * keys) re-normalizes per evaluation and the candidate loop in
    * qualifiedRanges goes quadratic in the IN size. */
  private val inCache = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[Array[Any], (DataType, Array[Any])]())

  private def normalizedSorted(vs: Array[Any], dt: DataType): Array[Any] = {
    val hit = inCache.get(vs)
    if (hit != null && hit._1 == dt) hit._2
    else {
      val cmp = comparator(dt)
      val arr = vs.iterator.map(normalize(dt, _)).filter(_ != null).toArray
      java.util.Arrays.sort(arr.asInstanceOf[Array[AnyRef]],
        new java.util.Comparator[AnyRef] {
          def compare(a: AnyRef, b: AnyRef): Int = cmp(a, b)
        })
      inCache.put(vs, (dt, arr))
      arr
    }
  }

  private def sortedContains(arr: Array[Any], v: Any,
      cmp: (Any, Any) => Int): Boolean = {
    var lo = 0
    var hi = arr.length - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val c = cmp(arr(mid), v)
      if (c == 0) return true
      else if (c < 0) lo = mid + 1
      else hi = mid - 1
    }
    false
  }

  /** Is any of the sorted values inside the binding's range? (the exact
    * negation of "every value is outside") */
  private def anyInRange(arr: Array[Any], b: Binding): Boolean = {
    if (arr.isEmpty) return false
    val r = b.range
    // first index whose value is not below the lower bound
    var first = 0
    r.lo.foreach { l =>
      var lo = 0
      var hi = arr.length - 1
      first = arr.length
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        val c = b.cmp(arr(mid), l)
        if (c < 0 || (c == 0 && !r.loInc)) lo = mid + 1
        else { first = mid; hi = mid - 1 }
      }
    }
    first < arr.length && !r.hi.exists { h =>
      val c = b.cmp(arr(first), h); c > 0 || (c == 0 && !r.hiInc)
    }
  }

  /** v strictly outside the bound's range? */
  private def outside(b: Binding, nv: Any): Boolean = {
    val r = b.range
    r.lo.exists(l => { val c = b.cmp(nv, l); c < 0 || (c == 0 && !r.loInc) }) ||
      r.hi.exists(h => { val c = b.cmp(nv, h); c > 0 || (c == 0 && !r.hiInc) })
  }

  private def cmpTri(a: String, v: Any, bound: Map[String, Binding])(
      f: (Binding, Any) => Tri): Tri =
    bound.get(a) match {
      case None => Unknown
      case Some(b) =>
        val nv = normalize(b.dt, v)
        if (nv == null) Unknown else f(b, nv)
    }

  /** Evaluate `range ⟨op⟩ v` where op is one of < <= > >=, expressed via
    * `holds(cmp(point, v), _)`: True if every point of the range
    * satisfies it, False if none does. */
  private def cmpBound(a: String, v: Any, bound: Map[String, Binding],
      holds: (Int, Any) => Boolean): Tri =
    cmpTri(a, v, bound) { (b, nv) =>
      val r = b.range
      // the comparison classifies the space around nv into three zones;
      // check the range's bounds against nv
      def boundState(bo: Option[Any], inc: Boolean, isLow: Boolean): Option[Boolean] =
        bo.map { x =>
          val c = b.cmp(x, nv)
          // tweak for open bounds: an open low bound at x behaves like
          // "just above x"; an open high bound like "just below x"
          val cAdj = if (c != 0) c else if (inc) 0 else if (isLow) 1 else -1
          holds(cAdj, nv)
        }
      val loHolds = boundState(r.lo, r.loInc, isLow = true)
      val hiHolds = boundState(r.hi, r.hiInc, isLow = false)
      (loHolds, hiHolds) match {
        case (Some(true), Some(true)) => True
        case (Some(false), Some(false)) => False
        // monotone predicates (>, >=): if even the high end fails → False,
        // if even the low end holds → True — but only for monotone ops;
        // both our op families are monotone in one direction, so:
        case (Some(l), Some(h)) => if (l != h) Unknown else if (l) True else False
        case (Some(l), None) => decideHalfOpen(l, r, b, nv, holds)
        case (None, Some(h)) => decideHalfOpen(h, r, b, nv, holds)
        case (None, None) => Unknown
      }
    }

  /** Half-open range: provable only when the predicate's satisfied zone
    * lies entirely on the bounded side. For monotone comparisons:
    *  - ops satisfied for large values (>, >=): range with no high bound
    *    reaches +∞ (satisfied) → if low end also satisfies → True else
    *    Unknown; range with no low bound reaches −∞ (unsatisfied) → if
    *    high end also fails → False else Unknown.
    *  - symmetric for (<, <=). `holds(+∞)` is probed with cmp result +1.
    */
  private def decideHalfOpen(boundedHolds: Boolean, r: ValueRange, b: Binding,
      nv: Any, holds: (Int, Any) => Boolean): Tri = {
    val holdsAtPlusInf = holds(1, nv)
    val noHi = r.hi.isEmpty
    if (noHi) {
      // range extends to +∞
      if (holdsAtPlusInf) { if (boundedHolds) True else Unknown }
      else { if (!boundedHolds) False else Unknown }
    } else {
      // range extends to −∞
      val holdsAtMinusInf = holds(-1, nv)
      if (holdsAtMinusInf) { if (boundedHolds) True else Unknown }
      else { if (!boundedHolds) False else Unknown }
    }
  }
}
