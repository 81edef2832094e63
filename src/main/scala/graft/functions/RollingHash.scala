package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.{toColumn, toExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Karp–Rabin rolling-hash document fingerprint.
  *
  * Combines the min, max and xor of all `window`-byte rolling hashes of
  * the UTF-8 text into one 64-bit fingerprint, so two documents sharing
  * most of their content (at any offset — the rolling window is
  * shift-invariant) land near each other far more often than md5 of the
  * full text would.
  *
  * A native Catalyst `Expression` with `doGenCode` (not a Scala UDF): the
  * generated code is a single static call, so it stays inside
  * whole-stage codegen and costs one pass over the bytes — the profile
  * you want when fingerprinting 100 TB of documents.
  *
  * Reference capability analog: server-side scan fingerprinting/filters
  * (/root/reference HBaseCustomFilter.scala) — re-expressed as a scalar
  * expression because Spark's scan already streams; only the hashing
  * kernel is custom.
  */
case class RollingHash(child: Expression, window: Int)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes() =
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"rolling_hash needs a string child, got ${child.dataType}")

  override def nullSafeEval(v: Any): Any =
    RollingHash.compute(v.asInstanceOf[UTF8String], window)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.RollingHash.compute($c, $window)")

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)

  override def prettyName: String = "rolling_hash"
}

object RollingHash {
  private final val B = 0x100000001b3L // FNV-ish odd multiplier

  /** One pass over the UTF-8 bytes; O(1) state. Called from generated code. */
  def compute(s: UTF8String, window: Int): Long = {
    val bytes = s.getBytes
    val n = bytes.length
    if (n == 0) return 0L
    val w = math.min(window, n)
    // pow = B^w for removing the outgoing byte
    var pow = 1L
    var i = 0
    while (i < w) { pow *= B; i += 1 }
    var h = 0L
    i = 0
    while (i < w) { h = h * B + (bytes(i) & 0xffL); i += 1 }
    var minH = h; var maxH = h; var xorH = h
    while (i < n) {
      h = h * B + (bytes(i) & 0xffL) - pow * (bytes(i - w) & 0xffL)
      if (java.lang.Long.compareUnsigned(h, minH) < 0) minH = h
      if (java.lang.Long.compareUnsigned(h, maxH) > 0) maxH = h
      xorH ^= h
      i += 1
    }
    minH ^ java.lang.Long.rotateLeft(maxH, 21) ^ java.lang.Long.rotateLeft(xorH, 42)
  }

  /** Column API: 64-bit shift-invariant fingerprint of `text`. */
  def rolling_hash(text: Column, window: Int = 16): Column =
    toColumn(RollingHash(toExpression(text), window))
}
