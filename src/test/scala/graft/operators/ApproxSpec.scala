package graft.operators

import graft.{SparkEntry, Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** approx_count_distinct has no cross-engine oracle (HLL sketches
  * differ), so its accuracy contract is pinned here instead: within the
  * configured relative error of the exact count (reference surface:
  * APPROXIMATE(0.04) COUNT(DISTINCT …), HBaseSQLQuerySuite.scala:299-309). */
class ApproxSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("a10 approximate count distinct is within 3× rsd of exact") {
    val approx = SparkEntry.queries("a10_approx_count_distinct")(spark, TestSpark.sf)
      .head().getLong(0)
    val exact = Tables.table(spark, TestSpark.sf, "orders")
      .agg(countDistinct(col("o_custkey"))).head().getLong(0)
    val rel = math.abs(approx - exact).toDouble / exact
    assert(rel <= 0.12, s"approx=$approx exact=$exact rel=$rel")
  }
}
