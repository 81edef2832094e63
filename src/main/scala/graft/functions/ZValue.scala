package graft.functions

import graft.codec.ZOrder
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.graftbridge.{toColumn, toExpression}
import org.apache.spark.sql.types._

/** Native z-value (Morton interleave) kernel: the clustering dimensions'
  * order-preserving codes — normalized per dim by the table's
  * create-time (minCode, shift) so small value domains keep full
  * resolution — interleaved into one non-negative Long, the physical
  * leading key of a z-clustered kv table (see [[graft.codec.ZOrder]]).
  * A native Expression (not a UDF) so bulk loads keep the write
  * pipeline inside whole-stage codegen; the kernel itself is
  * branch-free bit math per row. */
case class ZValue(children: Seq[Expression], mins: Seq[Long],
    shifts: Seq[Int]) extends Expression {

  require(mins.length == children.length && shifts.length == children.length,
    "z_value wants one (minCode, shift) pair per dimension")

  private def bits: Int = ZOrder.bitsPerDim(children.length)

  override def nullable: Boolean = false
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = {
    if (children.length < 2 || children.length > 6)
      return TypeCheckResult.TypeCheckFailure(
        s"z_value wants 2..6 dimensions, got ${children.length}")
    children.zipWithIndex.collectFirst {
      case (c, i) if !ZValue.supported(c.dataType) =>
        TypeCheckResult.TypeCheckFailure(
          s"z_value dimension $i has unsupported type ${c.dataType}")
    }.getOrElse(TypeCheckResult.TypeCheckSuccess)
  }

  override def eval(input: InternalRow): Any = {
    val codes = new Array[Long](children.length)
    var i = 0
    while (i < codes.length) {
      codes(i) = ZOrder.dimCode(children(i).dataType, children(i).eval(input))
      i += 1
    }
    ZOrder.zValueScaled(codes, mins.toArray, shifts.toArray)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val evals = children.map(_.genCode(ctx))
    val codes = children.zip(evals).zipWithIndex.map { case ((c, e), i) =>
      val coded = c.dataType match {
        case LongType | TimestampType | TimestampNTZType =>
          s"graft.codec.ZOrder.codeLong(${e.value})"
        case IntegerType | DateType | ShortType | ByteType =>
          s"graft.codec.ZOrder.codeLong((long) ${e.value})"
        case DoubleType | FloatType =>
          s"graft.codec.ZOrder.codeDouble((double) ${e.value})"
        case BooleanType => s"graft.codec.ZOrder.codeBoolean(${e.value})"
        case _: StringType => s"graft.codec.ZOrder.codeUtf8(${e.value}.getBytes())"
        case BinaryType => s"graft.codec.ZOrder.codeUtf8(${e.value})"
        case other => throw new IllegalStateException(s"unreachable: $other")
      }
      val scaled = s"graft.codec.ZOrder.scaledCode($coded, ${mins(i)}L, " +
        s"${shifts(i)}, $bits)"
      if (c.nullable) s"(${e.isNull}) ? 0L : ($scaled)" else scaled
    }
    val childCode = evals.map(_.code.toString).mkString("\n")
    ev.copy(
      code = code"""
        |$childCode
        |final long ${ev.value} =
        |  graft.codec.ZOrder.zValueBits(new long[]{${codes.mkString(", ")}}, $bits);
        |""".stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ZValue = copy(children = newChildren)

  override def prettyName: String = "z_value"
}

object ZValue {

  private[graft] def supported(dt: DataType): Boolean = dt match {
    case LongType | TimestampType | TimestampNTZType | IntegerType | DateType |
        ShortType | ByteType | DoubleType | FloatType | BooleanType |
        BinaryType => true
    case _: StringType => true
    case _ => false
  }

  /** Column API without table stats (legacy top-bit resolution): fine
    * for full-domain data, poor for narrow domains — table creation
    * goes through [[forDims]] with create-time stats instead. */
  def z_value(dims: Column*): Column = {
    val bits = ZOrder.bitsPerDim(dims.length)
    toColumn(ZValue(dims.map(toExpression),
      Seq.fill(dims.length)(0L), Seq.fill(dims.length)(64 - bits)))
  }

  /** The kernel for a z-clustered table's persisted dim specs. */
  def forDims(zdims: Seq[graft.codec.ZDim], cols: Seq[Column]): Column =
    toColumn(ZValue(cols.map(toExpression),
      zdims.map(_.minCode), zdims.map(_.shift)))
}
