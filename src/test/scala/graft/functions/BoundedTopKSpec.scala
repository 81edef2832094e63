package graft.functions

import graft.TestSpark
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The bounded top-k aggregate must be indistinguishable from the
  * row_number window it replaces — including Spark's double ordering
  * edges (NaN greatest, -0.0 == 0.0) and id tie-breaks. */
class BoundedTopKSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def windowTopK(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.withColumn("rk", row_number().over(
        Window.partitionBy("g").orderBy(col("s").desc, col("id"))))
      .filter(col("rk") <= k)
      .select(col("g"), col("id"), col("s"), col("rk").cast("int").as("rk"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        java.lang.Double.doubleToLongBits(r.getDouble(2)),
        r.getInt(3))).sorted.toSeq

  private def aggTopK(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.groupBy("g")
      .agg(BoundedTopK.bounded_top_k(k, col("s"), col("id"), lit(0L))
        .as("__top"))
      .select(col("g"), posexplode(col("__top")).as(Seq("__i", "__e")))
      .select(col("g"), col("__e.id").as("id"), col("__e.score").as("s"),
        (col("__i") + 1).cast("int").as("rk"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        java.lang.Double.doubleToLongBits(r.getDouble(2)),
        r.getInt(3))).sorted.toSeq

  test("equals the row_number window on adversarial doubles") {
    // per group: exact ties (id tiebreak), ±0.0 (must compare equal),
    // NaN (ranks FIRST, like Spark's double ordering), groups smaller
    // and larger than k, negative scores
    val rows = Seq(
      (1L, 10L, 0.5), (1L, 11L, 0.5), (1L, 12L, 0.5), (1L, 9L, 0.7),
      (2L, 20L, 0.0), (2L, 21L, -0.0), (2L, 22L, -0.3), (2L, 23L, 1.0),
      (3L, 30L, Double.NaN), (3L, 31L, 0.9), (3L, 32L, Double.NaN),
      (4L, 40L, -1.0), // group smaller than k
      (5L, 50L, 0.1), (5L, 51L, 0.2), (5L, 52L, 0.3), (5L, 53L, 0.4),
      (5L, 54L, 0.5), (5L, 55L, 0.6), (5L, 56L, 0.7)
    ).toDF("g", "id", "s")
    for (k <- Seq(1, 2, 3, 5, 10)) {
      val w = windowTopK(rows, k)
      val a = aggTopK(rows, k)
      assert(a == w, s"diverged at k=$k:\nwin $w\nagg $a")
    }
  }

  test("random fuzz equals the window across partitionings") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 5000).map(_ => (rnd.nextInt(40).toLong,
      rnd.nextLong().abs % 100000, // duplicate ids across groups OK
      math.floor(rnd.nextGaussian() * 50) / 100)) // forced score ties
      .toDF("g", "id", "s")
    for (parts <- Seq(1, 7, 32); k <- Seq(3, 8)) {
      val df = rows.repartition(parts)
      assert(aggTopK(df, k) == windowTopK(df, k), s"parts=$parts k=$k")
    }
  }

  test("merge path: pre-aggregated partials combine to the same answer") {
    // many input partitions with interleaved group rows forces real
    // partial buffers to merge on the reduce side
    val rows = (0 until 2000).map(i => (i % 5L, i.toLong, (i % 97) / 10.0))
      .toDF("g", "id", "s").repartition(16)
    assert(aggTopK(rows, 4) == windowTopK(rows, 4))
  }

  test("null score raises loudly instead of silently diverging") {
    val rows = Seq((1L, 1L, Some(1.0)), (1L, 2L, None))
      .toDF("g", "id", "s")
    val e = intercept[Exception] {
      rows.groupBy("g")
        .agg(BoundedTopK.bounded_top_k(2, col("s"), col("id"), lit(0L)))
        .collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("bounded_top_k")), e.toString)
  }
}
