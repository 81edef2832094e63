package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the synthesized partsupp table ([[PartSupp]]): shape invariants
  * the TPC-H Q2/Q11/Q16/Q20 plans build on, and idempotent
  * materialization. Cross-engine value equality with the DuckDB
  * derivation is the driver gate (`ps1_partsupp_gen`). */
class PartSuppSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("partsupp: 4 distinct suppliers per part, valid domains, unique keys") {
    val ps = PartSupp.table(spark, sf)
    val nParts = graft.Tables.table(spark, sf, "part").count()
    assert(ps.count() == nParts * 4)
    assert(ps.select("ps_partkey", "ps_suppkey").distinct().count() == nParts * 4)
    val perPart = ps.groupBy("ps_partkey")
      .agg(countDistinct("ps_suppkey").as("n"))
      .agg(min("n").as("mn"), max("n").as("mx")).head()
    assert(perPart.getLong(0) == 4 && perPart.getLong(1) == 4)
    val dom = ps.agg(
      min("ps_availqty"), max("ps_availqty"),
      min("ps_supplycost"), max("ps_supplycost")).head()
    assert(dom.getInt(0) >= 1 && dom.getInt(1) <= 9999)
    assert(dom.getDouble(2) >= 1.0 && dom.getDouble(3) <= 992.0)
    // every ps_suppkey is a real supplier
    val orphans = ps.join(graft.Tables.table(spark, sf, "supplier"),
      col("ps_suppkey") === col("s_suppkey"), "left_anti").count()
    assert(orphans == 0)
  }

  test("ensure is idempotent and deterministic across calls") {
    val p1 = PartSupp.ensure(spark, sf)
    val before = spark.read.parquet(p1).orderBy("ps_partkey", "ps_suppkey")
      .collect().toSeq
    val p2 = PartSupp.ensure(spark, sf)
    assert(p1 == p2)
    val again = PartSupp.generate(spark, sf)
      .orderBy("ps_partkey", "ps_suppkey").collect().toSeq
    assert(before == again)
  }
}
