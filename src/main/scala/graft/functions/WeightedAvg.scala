package graft.functions

import java.math.{BigDecimal => JBigDecimal}

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed UDAF surface (SURVEY §2.10): a weight-averaged value implemented
  * as an `Aggregator[IN, BUF, OUT]` and registered through
  * `functions.udaf`, so it plans as a regular hash aggregate with
  * partial/merge phases (map-side combine, one shuffle on the group key —
  * the same plan shape as a built-in aggregate, scale-safe by
  * construction).
  *
  * Inputs are DECIMAL columns (callers cast doubles with Spark's `cast`,
  * the same double→decimal semantics the DuckDB oracle's `CAST` has —
  * the [[graft.QuerySpec.dsum]] contract); accumulation is exact
  * `BigDecimal` arithmetic (order-independent across partitionings), and
  * only the final quotient drops to IEEE double — bit-identical to
  * `CAST(sum(v*w) AS DOUBLE) / CAST(sum(w) AS DOUBLE)`.
  */
object WeightedAvg
    extends Aggregator[(JBigDecimal, JBigDecimal), (JBigDecimal, JBigDecimal), Double] {

  override def zero: (JBigDecimal, JBigDecimal) =
    (JBigDecimal.ZERO, JBigDecimal.ZERO)

  override def reduce(b: (JBigDecimal, JBigDecimal),
      in: (JBigDecimal, JBigDecimal)): (JBigDecimal, JBigDecimal) =
    if (in._1 == null || in._2 == null) b // SQL aggregates skip null inputs
    else (b._1.add(in._1.multiply(in._2)), b._2.add(in._2))

  override def merge(x: (JBigDecimal, JBigDecimal), y: (JBigDecimal, JBigDecimal)):
      (JBigDecimal, JBigDecimal) =
    (x._1.add(y._1), x._2.add(y._2))

  override def finish(b: (JBigDecimal, JBigDecimal)): Double =
    if (b._2.signum == 0) Double.NaN
    else b._1.doubleValue() / b._2.doubleValue()

  override def bufferEncoder: Encoder[(JBigDecimal, JBigDecimal)] =
    Encoders.tuple(Encoders.DECIMAL, Encoders.DECIMAL)

  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble

  private lazy val fn =
    udaf(this, Encoders.tuple(Encoders.DECIMAL, Encoders.DECIMAL))

  /** `weighted_avg(value, weight)` as an aggregate Column. Pass DECIMAL
    * inputs (cast doubles first — see scaladoc). */
  def apply(value: Column, weight: Column): Column = fn(value, weight)
}
