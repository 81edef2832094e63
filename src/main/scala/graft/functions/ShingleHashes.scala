package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.{toColumn, toExpression}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native distinct-shingle-hash kernel: array<string> tokens →
  * array<long> of DISTINCT n-gram shingle hashes, in one pass.
  *
  * Replaces `array_distinct(transform(wordShingles(text), xxhash64))`,
  * which (a) materializes every shingle as a concatenated string and
  * (b) runs the transform lambda through the interpreted
  * higher-order-function path — the dominant cost of the dedup
  * pipeline's text scan. Here each token is hashed once and shingle
  * hashes are rolled from the token hashes (no string concatenation),
  * deduplicated in a per-row hash set. Same preference rationale as
  * [[MinHashSignature]]: a native Expression where built-ins can't
  * express the kernel efficiently.
  */
case class ShingleHashes(child: Expression, n: Int)
    extends UnaryExpression {

  require(n >= 1, "shingle size must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes() = child.dataType match {
    case ArrayType(_: StringType, _) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"shingle_hashes needs array<string>, got $other")
  }

  override def nullSafeEval(v: Any): Any =
    ShingleHashes.compute(v.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ShingleHashes.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)

  override def prettyName: String = "shingle_hashes"
}

object ShingleHashes {
  private final val Seed = 42L

  /** Called from generated code: hash each token once, roll each
    * n-token window from the token hashes, dedupe. A document with
    * fewer than n tokens yields ONE whole-document shingle (the
    * wordShingles convention — short docs still dedupe against each
    * other). Null tokens hash as a constant. */
  def compute(tokens: ArrayData, n: Int): ArrayData = {
    val m = tokens.numElements()
    val th = new Array[Long](m)
    var i = 0
    while (i < m) {
      val t = tokens.getUTF8String(i)
      th(i) = if (t == null) 0L else XXH64.hashUTF8String(t, Seed)
      i += 1
    }
    if (m < n) {
      var h = 0L
      var j = 0
      while (j < m) { h = XXH64.hashLong(th(j), h); j += 1 }
      return new GenericArrayData(Array(h))
    }
    val seen = new java.util.HashSet[java.lang.Long](math.max(16, m * 2))
    val out = new Array[Long](m - n + 1)
    var k = 0
    i = 0
    while (i <= m - n) {
      var h = th(i)
      var j = 1
      while (j < n) { h = XXH64.hashLong(th(i + j), h); j += 1 }
      if (seen.add(h)) { out(k) = h; k += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, k))
  }

  /** Column API. */
  def shingle_hashes(tokens: Column, n: Int = 3): Column =
    toColumn(ShingleHashes(toExpression(tokens), n))
}
