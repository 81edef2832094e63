package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.{toColumn, toExpression}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native whitespace tokenizer: string → array<string> of the maximal
  * runs of non-whitespace characters — exactly
  * `filter(split(text, "\\s+"), t => length(t) > 0)`, the engine's
  * tokenization contract (and the oracle's
  * `list_filter(string_split_regex(text, '\s+'), t -> len(t) > 0)`).
  *
  * Replaces the regex path on the hot tokenize scans (guide §4: prefer
  * specialized native code over general machinery in the per-row hot
  * path): `split` compiles/matches a java.util.regex pattern and
  * materializes the empty leading/trailing fields the filter then
  * drops; here one byte scan finds the runs and each token is a
  * ZERO-COPY view over the row's bytes. Semantics are identical by
  * construction: Java's `\s` is exactly { space, \t, \n, \x0B, \f, \r }
  * — all ASCII, so byte-level scanning is UTF-8-safe and non-ASCII
  * whitespace (e.g. U+00A0) stays a token character on both paths.
  * Pinned against the regex path by a property test in
  * TextFunctionsSpec.
  */
case class WhitespaceTokens(child: Expression) extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes() = child.dataType match {
    case _: StringType =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"whitespace_tokens needs string, got $other")
  }

  override def nullSafeEval(v: Any): Any =
    WhitespaceTokens.compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.WhitespaceTokens.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): WhitespaceTokens =
    copy(child = newChild)

  override def prettyName: String = "whitespace_tokens"
}

object WhitespaceTokens {

  private def isWs(b: Byte): Boolean =
    b == 0x20 || (b >= 0x09 && b <= 0x0d) // space, \t, \n, \x0B, \f, \r

  /** Called from generated code: one byte scan; each token is a
    * zero-copy UTF8String view over the shared byte array. */
  def compute(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    // count runs first so the output array allocates exactly once
    var count = 0
    var i = 0
    while (i < n) {
      if (!isWs(bytes(i)) && (i == 0 || isWs(bytes(i - 1)))) count += 1
      i += 1
    }
    if (count == 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](count)
    var k = 0
    i = 0
    while (i < n) {
      if (!isWs(bytes(i))) {
        val start = i
        while (i < n && !isWs(bytes(i))) i += 1
        out(k) = UTF8String.fromBytes(bytes, start, i - start)
        k += 1
      } else i += 1
    }
    new GenericArrayData(out)
  }

  /** Column API. */
  def whitespace_tokens(text: Column): Column =
    toColumn(WhitespaceTokens(toExpression(text)))
}
