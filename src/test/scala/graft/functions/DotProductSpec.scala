package graft.functions

import graft.TestSpark
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native dot-product kernel must be BIT-IDENTICAL to the
  * interpreted `zip_with`/`aggregate` algebra it replaced — the ann
  * gates' DuckDB oracles restate that exact fold, so an ulp of drift
  * here is a correctness failure, not a rounding nit. */
class DotProductSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** The replaced algebra, verbatim. */
  private def hofDot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  test("bit-identical to the zip_with/aggregate fold on float vectors") {
    val rnd = new scala.util.Random(11)
    val rows = (0 until 200).map { i =>
      (i.toLong, Seq.fill(64)(rnd.nextGaussian().toFloat),
        Seq.fill(64)(rnd.nextGaussian().toFloat))
    }.toDF("id", "a", "b")
    val both = rows.select(
      DotProduct.dot_product(col("a"), col("b")).as("native"),
      hofDot(col("a"), col("b")).as("hof"))
    assert(both.filter(!(col("native") <=> col("hof"))).count() == 0)
    // and on mixed float × double-literal arrays (the centroid shape)
    val cents = array((0 until 64).map(i => lit(i * 0.37 - 3.1)): _*)
    val mixed = rows.select(
      DotProduct.dot_product(col("a"), cents).as("native"),
      hofDot(col("a"), cents).as("hof"))
    assert(mixed.filter(!(col("native") <=> col("hof"))).count() == 0)
  }

  test("null semantics match: ragged lengths, null elements, empty arrays") {
    val df = Seq(
      (1L, Seq[Option[Float]](Some(1f), Some(2f)), Seq[Option[Float]](Some(3f), Some(4f))),
      (2L, Seq[Option[Float]](Some(1f), Some(2f)), Seq[Option[Float]](Some(3f))), // ragged
      (3L, Seq[Option[Float]](Some(1f), None), Seq[Option[Float]](Some(3f), Some(4f))), // null elem
      (4L, Seq.empty[Option[Float]], Seq.empty[Option[Float]]) // empty → 0.0
    ).toDF("id", "a", "b")
    val got = df.select(col("id"),
        DotProduct.dot_product(col("a"), col("b")).as("native"),
        hofDot(col("a"), col("b")).as("hof"))
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)), Option(r.get(2)))).toMap
    assert(got(1L) == (Some(11.0), Some(11.0)))
    assert(got(2L) == (None, None))
    assert(got(3L) == (None, None))
    assert(got(4L) == (Some(0.0), Some(0.0)))
    // null ARRAY input → null, both paths
    val nullArr = Seq((1L, Option.empty[Seq[Float]], Option(Seq(1f))))
      .toDF("id", "a", "b")
      .select(DotProduct.dot_product(col("a"), col("b"))).head()
    assert(nullArr.isNullAt(0))
  }

  test("runs inside whole-stage codegen (no interpreted fallback)") {
    // over a real scan: a local relation would constant-fold the plan
    val emb = graft.Tables.table(spark, TestSpark.sf, "embeddings")
    val df = emb.select(
      DotProduct.dot_product(col("embedding"), col("embedding")).as("d"))
      .filter(col("d") >= 0)
    // the project/filter carrying dot_product must sit INSIDE a
    // whole-stage-codegen subtree (rendered as the `*(n)` prefix)
    val plan = df.queryExecution.executedPlan
    val inCodegen = plan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec
          if w.toString.contains("dot_product") => w
    }
    assert(inCodegen.nonEmpty, plan.toString.take(1500))
    assert(df.count() > 0)
  }

  test("int8 arrays (the quantized-scan shape) compute exactly") {
    val df = Seq((Seq(127.toByte, (-127).toByte, 0.toByte),
      Seq(0.5, 2.0, 9.9))).toDF("q", "w")
    val v = df.select(DotProduct.dot_product(col("q"), col("w")))
      .head().getDouble(0)
    assert(v == 127 * 0.5 + -127 * 2.0)
  }

  test("decimal arrays compute like the replaced cast(\"double\") fold") {
    // Similarity.dot callers with decimal embeddings went through
    // zip_with + cast("double") before the native kernel — decimals
    // must keep working, via the same Decimal.toDouble the Cast uses
    val df = Seq((Seq(BigDecimal("1.25"), BigDecimal("-2.50")),
      Seq(2.0, 4.0))).toDF("a", "b")
    val v = df.select(DotProduct.dot_product(col("a"), col("b")))
      .head().getDouble(0)
    assert(v == 1.25 * 2.0 + -2.5 * 4.0)
    // decimal × decimal too
    val v2 = df.select(DotProduct.dot_product(col("a"), col("a")))
      .head().getDouble(0)
    assert(v2 == 1.25 * 1.25 + 2.5 * 2.5)
  }

  test("rejects non-numeric arrays loudly") {
    val df = Seq((Seq("x"), Seq(1f))).toDF("a", "b")
    val e = intercept[Exception] {
      df.select(DotProduct.dot_product(col("a"), col("b"))).collect()
    }
    assert(e.getMessage.toLowerCase.contains("numeric") ||
      e.getMessage.toLowerCase.contains("datatype_mismatch"))
  }
}
