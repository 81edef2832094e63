package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.{toColumn, toExpression}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native k-permutation MinHash kernel: array<string> shingles →
  * array<long> signature, all k minima in one JVM-speed pass.
  *
  * Why a custom Catalyst expression and not column algebra: the
  * equivalent `aggregate`/`transform`/`zip_with` pipeline evaluates
  * its lambdas through the interpreted higher-order-function path —
  * k × |shingles| interpreted calls per row. This expression does the
  * same math in two tight loops (one xxHash64 per shingle + k cheap
  * long re-hashes), generated into whole-stage codegen as a single
  * static call. Preference order per the engine guidelines: built-ins
  * first, native Expression where built-ins can't express it
  * efficiently — this is the latter.
  */
case class MinHashSignature(child: Expression, k: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes() = child.dataType match {
    case ArrayType(_: StringType, _) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"minhash_signature needs array<string>, got $other")
  }

  override def nullSafeEval(v: Any): Any =
    MinHashSignature.compute(v.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MinHashSignature.compute($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)

  override def prettyName: String = "minhash_signature"
}

object MinHashSignature {
  // Spark's xxhash64(col) default seed. NOTE: the one-scan dedup
  // pipeline feeds `computeFromHashes` with ShingleHashes values, which
  // ROLL per-token hashes instead of hashing the concatenated shingle
  // string — a different (still uniform) hash family, so its signatures
  // are NOT bit-identical to this string path's. MinHash semantics
  // (Pr[collision] = Jaccard) hold for either family.
  private final val Seed = 42L

  /** Called from generated code: one xxHash64 per shingle, k long
    * re-hashes per shingle, signed minima (any consistent order is a
    * valid minhash). */
  def compute(shingles: ArrayData, k: Int): ArrayData = {
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      val s = shingles.getUTF8String(i)
      if (s != null) {
        val h = XXH64.hashUTF8String(s, Seed)
        var j = 0
        while (j < k) {
          val p = XXH64.hashLong(h, j)
          if (p < mins(j)) mins(j) = p
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** Same minima from PRE-HASHED shingles (array<long> of
    * `xxhash64(shingle)` values): duplicates can't change a minimum, so
    * this equals [[compute]] over the raw shingles — the kernel of the
    * one-scan dedup pipeline, where the shingle-hash set is computed
    * once and reused for both signatures and Jaccard verification. */
  def computeFromHashes(hashes: ArrayData, k: Int): ArrayData = {
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val n = hashes.numElements()
    var i = 0
    while (i < n) {
      if (!hashes.isNullAt(i)) {
        val h = hashes.getLong(i)
        var j = 0
        while (j < k) {
          val p = XXH64.hashLong(h, j)
          if (p < mins(j)) mins(j) = p
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** Column API. */
  def minhash_signature(shingles: Column, k: Int = 64): Column =
    toColumn(MinHashSignature(toExpression(shingles), k))

  def minhash_signature_hashed(hashes: Column, k: Int = 64): Column =
    toColumn(MinHashFromHashes(toExpression(hashes), k))
}

/** [[MinHashSignature]] over pre-hashed shingles (array<long>). */
case class MinHashFromHashes(child: Expression, k: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes() = child.dataType match {
    case ArrayType(LongType, _) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"minhash_signature_hashed needs array<bigint>, got $other")
  }

  override def nullSafeEval(v: Any): Any =
    MinHashSignature.computeFromHashes(v.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MinHashSignature.computeFromHashes($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): MinHashFromHashes =
    copy(child = newChild)

  override def prettyName: String = "minhash_signature_hashed"
}
