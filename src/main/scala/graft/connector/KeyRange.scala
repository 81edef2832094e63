package graft.connector

import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._

/** Conjunctive value range on the table's leading key column, derived
  * from pushed source filters — the single-dimension core of the
  * reference's critical-point pruning (/root/reference
  * HBaseCriticalPoint.scala:221-287: collect boundary constants per key
  * dimension, qualify ranges). Used twice: segment (region) pruning at
  * planning time, and record seek/early-stop inside the reader.
  *
  * Pruning-only semantics: a range that is too wide is always safe
  * because Spark re-evaluates every filter post-scan.
  */
final case class KeyRange(
    lower: Option[Any], lowerInc: Boolean,
    upper: Option[Any], upperInc: Boolean,
    cmp: (Any, Any) => Int) {

  def contains(v: Any): Boolean =
    lower.forall(l => { val c = cmp(v, l); c > 0 || (c == 0 && lowerInc) }) &&
      upper.forall(u => { val c = cmp(v, u); c < 0 || (c == 0 && upperInc) })

  /** v is strictly past the upper bound (sorted reader may stop). */
  def above(v: Any): Boolean =
    upper.exists(u => { val c = cmp(v, u); c > 0 || (c == 0 && !upperInc) })

  /** does [lo, hi] (inclusive) intersect this range? */
  def intersects(lo: Any, hi: Any): Boolean =
    !above(lo) && !lower.exists(l => { val c = cmp(hi, l); c < 0 || (c == 0 && !lowerInc) })
}

object KeyRange {

  /** Does this (top-level conjunct) filter constrain `col` in a shape the
    * pruner understands? */
  def constrains(f: Filter, col: String): Boolean = f match {
    case EqualTo(a, _) => a == col
    case GreaterThan(a, _) => a == col
    case GreaterThanOrEqual(a, _) => a == col
    case LessThan(a, _) => a == col
    case LessThanOrEqual(a, _) => a == col
    case In(a, vs) => a == col && vs.nonEmpty
    case _ => false
  }

  /** Normalize an external filter literal to the reader's value domain
    * (what RowCodec.leadingKeyValue produces). */
  private def normalize(dt: DataType, v: Any): Any = (dt, v) match {
    case (_, null) => null
    case (LongType, n: Number) => n.longValue()
    case (IntegerType, n: Number) => n.intValue()
    case (ShortType, n: Number) => n.shortValue()
    case (ByteType, n: Number) => n.byteValue()
    case (DoubleType, n: Number) => n.doubleValue()
    case (FloatType, n: Number) => n.floatValue()
    case (TimestampType, t: java.sql.Timestamp) =>
      t.getTime * 1000L + (t.getNanos % 1000000L) / 1000L
    case (TimestampType, i: java.time.Instant) =>
      i.getEpochSecond * 1000000L + i.getNano / 1000L
    case (TimestampNTZType, dt: java.time.LocalDateTime) =>
      dt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + dt.getNano / 1000L
    case (_: StringType, s) => s.toString
    case (_, other) => other
  }

  private def comparator(dt: DataType): (Any, Any) => Int = dt match {
    case LongType | TimestampType | TimestampNTZType => (a, b) =>
      java.lang.Long.compare(a.asInstanceOf[Long], b.asInstanceOf[Long])
    case IntegerType => (a, b) =>
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
    case _ => (a, b) => a.toString.compareTo(b.toString)
  }

  /** Fold pushed conjuncts into one range on the leading key column. */
  def fromFilters(filters: Array[Filter], dt: DataType, col: String): KeyRange = {
    val cmp = comparator(dt)
    var r = KeyRange(None, true, None, true, cmp)

    def tightenLower(v: Any, inc: Boolean): Unit = {
      val nv = normalize(dt, v)
      if (nv != null) {
        val tighter = r.lower.forall { l =>
          val c = cmp(nv, l); c > 0 || (c == 0 && !inc)
        }
        if (tighter) r = r.copy(lower = Some(nv), lowerInc = inc)
      }
    }
    def tightenUpper(v: Any, inc: Boolean): Unit = {
      val nv = normalize(dt, v)
      if (nv != null) {
        val tighter = r.upper.forall { u =>
          val c = cmp(nv, u); c < 0 || (c == 0 && !inc)
        }
        if (tighter) r = r.copy(upper = Some(nv), upperInc = inc)
      }
    }

    filters.foreach {
      case EqualTo(a, v) if a == col => tightenLower(v, inc = true); tightenUpper(v, inc = true)
      case GreaterThan(a, v) if a == col => tightenLower(v, inc = false)
      case GreaterThanOrEqual(a, v) if a == col => tightenLower(v, inc = true)
      case LessThan(a, v) if a == col => tightenUpper(v, inc = false)
      case LessThanOrEqual(a, v) if a == col => tightenUpper(v, inc = true)
      case In(a, vs) if a == col && vs.nonEmpty =>
        val nvs = vs.map(normalize(dt, _)).filter(_ != null)
        if (nvs.nonEmpty) {
          tightenLower(nvs.min(Ordering.fromLessThan[Any]((x, y) => cmp(x, y) < 0)), inc = true)
          tightenUpper(nvs.max(Ordering.fromLessThan[Any]((x, y) => cmp(x, y) < 0)), inc = true)
        }
      case _ => ()
    }
    r
  }
}
