package graft.pruning

import graft.pruning.TriEval._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.DataType

/** Critical-point range generation for one key dimension — the
  * reference's pruning algebra (/root/reference src/main/scala/org/
  * apache/spark/sql/hbase/HBaseCriticalPoint.scala, re-derived):
  * every constant the predicate compares the dimension against is a
  * "critical point"; the points cut the domain into point ranges and
  * open intervals, and three-valued evaluation qualifies each piece.
  * What survives is the exact set of key regions that can hold matching
  * rows — the reader seeks across them, skipping the dead space
  * (`k = 8 OR k > 8` → [8] ∪ (8, ∞); `k < 8 AND k > 8` → ∅).
  */
object CriticalPoints {

  /** All constants compared against `col` anywhere in the filter tree. */
  def collect(f: Filter, col: String, dt: DataType): Seq[Any] = {
    val cmp = comparator(dt)
    def go(f: Filter): Seq[Any] = f match {
      case And(l, r) => go(l) ++ go(r)
      case Or(l, r) => go(l) ++ go(r)
      case Not(c) => go(c)
      case EqualTo(a, v) if a == col => Seq(normalize(dt, v))
      case GreaterThan(a, v) if a == col => Seq(normalize(dt, v))
      case GreaterThanOrEqual(a, v) if a == col => Seq(normalize(dt, v))
      case LessThan(a, v) if a == col => Seq(normalize(dt, v))
      case LessThanOrEqual(a, v) if a == col => Seq(normalize(dt, v))
      case In(a, vs) if a == col => vs.toSeq.map(normalize(dt, _))
      case _ => Nil
    }
    val vals = go(f).filter(_ != null)
    // sorted distinct under the dimension's ordering
    vals.distinct.sortWith((a, b) => cmp(a, b) < 0)
  }

  /** Candidate ranges cut by the critical points:
    * (-∞,v0) [v0] (v0,v1) [v1] … (vN,+∞); full domain when no points. */
  def candidates(points: Seq[Any]): Seq[ValueRange] =
    if (points.isEmpty) Seq(ValueRange.full)
    else {
      val first = ValueRange(None, loInc = true, Some(points.head), hiInc = false)
      val mids = points.sliding(2).collect { case Seq(a, b) =>
        ValueRange(Some(a), loInc = false, Some(b), hiInc = false)
      }.toSeq
      val pts = points.map(ValueRange.point)
      val last = ValueRange(Some(points.last), loInc = false, None, hiInc = true)
      (first +: pts.head +: mids.zip(pts.tail).flatMap { case (m, p) => Seq(m, p) }) :+ last
    }

  /** Qualified ranges for one dimension: candidates whose three-valued
    * evaluation of the conjunction is not False. Empty result = the
    * predicate is unsatisfiable on this dimension. */
  def qualifiedRanges(filters: Seq[Filter], col: String, dt: DataType): Seq[ValueRange] = {
    if (filters.isEmpty) return Seq(ValueRange.full)
    val conj = filters.reduce(And(_, _))
    val pts = collect(conj, col, dt)
    candidates(pts).filter { r =>
      TriEval.eval(conj, Map(col -> Binding(dt, r))) != TriEval.False
    }
  }

  /** Sorted, serializable multi-range on the leading key dimension, used
    * by the segment reader for seek/early-stop. Empty ranges = nothing
    * qualifies. */
  final case class MultiRange(ranges: Seq[ValueRange], dt: DataType)
      extends Serializable {
    @transient private lazy val cmp = comparator(dt)

    private def inRange(r: ValueRange, v: Any): Boolean =
      r.lo.forall(l => { val c = cmp(v, l); c > 0 || (c == 0 && r.loInc) }) &&
        r.hi.forall(h => { val c = cmp(v, h); c < 0 || (c == 0 && r.hiInc) })

    def contains(v: Any): Boolean = ranges.exists(inRange(_, v))

    /** v is past every range (sorted reader may stop). */
    def pastAll(v: Any): Boolean =
      ranges.isEmpty || ranges.last.hi.exists { h =>
        val c = cmp(v, h); c > 0 || (c == 0 && !ranges.last.hiInc)
      }

    /** Does the inclusive interval [lo, hi] intersect any qualified
      * range? (segment-level pruning on the leading dimension) */
    def intersects(lo: Any, hi: Any): Boolean = ranges.exists { r =>
      r.hi.forall(h => { val c = cmp(lo, h); c < 0 || (c == 0 && r.hiInc) }) &&
        r.lo.forall(l => { val c = cmp(hi, l); c > 0 || (c == 0 && r.loInc) })
    }

    /** Lower bound of the first range whose interior is still ahead of
      * `v` — the seek target when a sorted reader finds itself in a
      * disqualified gap (ranges are generated sorted by the
      * critical-point cut). A range with an OPEN lower bound equal to
      * `v` is ahead too: for `k > 50` the record k=50 sits exactly on
      * the excluded bound, and the next qualified values start right
      * after it — skipping to the NEXT range instead would leapfrog
      * them. The floor of such a bound is at/behind the current
      * position, so the resulting seek is a harmless no-op. */
    def nextLowerBound(v: Any): Option[Any] =
      ranges.find(r => r.lo.exists { l =>
        val c = cmp(l, v); c > 0 || (c == 0 && !r.loInc)
      }).flatMap(_.lo)

    /** Is the whole inclusive interval [lo, hi] inside ONE qualified
      * range? (fully-covered segment test for filtered metadata-only
      * aggregation — a single range is an interval, so containing both
      * ends contains everything between) */
    def coversInterval(lo: Any, hi: Any): Boolean =
      ranges.exists(r => inRange(r, lo) && inRange(r, hi))

    /** The subset of qualified ranges that intersect the inclusive
      * interval [lo, hi] — the per-partition specialization of a scan's
      * range set to one segment's key span. */
    def intersecting(lo: Any, hi: Any): Seq[ValueRange] = ranges.filter { r =>
      r.hi.forall(h => { val c = cmp(lo, h); c < 0 || (c == 0 && r.hiInc) }) &&
        r.lo.forall(l => { val c = cmp(hi, l); c > 0 || (c == 0 && r.loInc) })
    }
  }
}
