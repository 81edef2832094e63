package graft.sql

import graft.functions.{MinHashSignature, RollingHash}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

/** Session extensions (the reference's HBaseSQLContext/dialect wiring,
  * /root/reference HBaseSQLContext.scala:29-51 + HBaseSQLDialect.scala,
  * restated as SparkSessionExtensions): registers the engine's native
  * expressions as SQL functions so `spark.sql` users get them too.
  *
  * {{{
  * SparkSession.builder().withExtensions(new GraftExtensions).getOrCreate()
  * // or: spark.conf spark.sql.extensions=graft.sql.GraftExtensions
  * spark.sql("SELECT rolling_hash(text, 16), minhash_signature(shingles, 64) ...")
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(GraftExtensions.rollingHashFn)
    e.injectFunction(GraftExtensions.minhashFn)
    // LOAD DATA INPATH ... INTO TABLE ... (reference parser statement,
    // HBaseSQLParser.scala:213-222) — everything else delegates
    e.injectParser((_, delegate) => new GraftSqlParser(delegate))
    // materialized-view rewrite FIRST: an aggregate a view answers never
    // needs the index semi-join underneath it (rules run in injection
    // order within the optimization batch, and the index rewrite's
    // restructured Filter would hide the Aggregate-over-scan shape)
    e.injectOptimizerRule(s => KvMatViewRule(s))
    // secondary-index rewrite: Filter on an in-sync indexed column →
    // semi-join against the index's primary keys (runs in the operator
    // optimization batch, before V2 pushdown sees the relation)
    e.injectOptimizerRule(s => KvIndexRule(s))
    // whole-table approx_count_distinct from V9 NDV sketch metadata
    e.injectOptimizerRule(s => KvNdvRule(s))
    // whole-table approx_percentile from V11 quantile-summary metadata
    e.injectOptimizerRule(s => KvPercentileRule(s))
  }
}

object GraftExtensions {

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private[sql] val rollingHashFn = (
    FunctionIdentifier("rolling_hash"),
    new ExpressionInfo(classOf[RollingHash].getName, "rolling_hash"),
    (exprs: Seq[Expression]) => exprs match {
      case Seq(text) => RollingHash(text, 16)
      case Seq(text, w) => RollingHash(text, intLit(w, "window"))
      case _ => throw new IllegalArgumentException(
        "rolling_hash(text[, window]) takes 1 or 2 arguments")
    })

  private[sql] val minhashFn = (
    FunctionIdentifier("minhash_signature"),
    new ExpressionInfo(classOf[MinHashSignature].getName, "minhash_signature"),
    (exprs: Seq[Expression]) => exprs match {
      case Seq(arr) => MinHashSignature(arr, 64)
      case Seq(arr, k) => MinHashSignature(arr, intLit(k, "k"))
      case _ => throw new IllegalArgumentException(
        "minhash_signature(shingles[, k]) takes 1 or 2 arguments")
    })

  /** Imperative registration for sessions created without extensions
    * (e.g. the driver's own SparkSession). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("rolling_hash", rollingHashFn._3, "built-in")
    reg.createOrReplaceTempFunction("minhash_signature", minhashFn._3, "built-in")
  }
}
