package graft.connector

import graft.TestSpark
import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Multi-column secondary indexes: exactness under NULL trailing values
  * and trailing-column predicate forwarding. */
class KvIndexMultiColSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fixture(): String = {
    val p = Files.createTempDirectory("kv_idx_mc").toString + "/t"
    val df = Seq(
      (1L, "a", java.lang.Long.valueOf(10L)),
      (2L, "a", null.asInstanceOf[java.lang.Long]), // NULL trailing col
      (3L, "b", java.lang.Long.valueOf(20L)),
      (4L, "a", java.lang.Long.valueOf(30L))
    ).toDF("pk", "c1", "c2")
    KvCommands.createTable(df, p, Seq("pk"))
    KvIndex.create(spark, p, "i2", Seq("c1", "c2"))
    p
  }

  test("lead-only predicate on a 2-col index must not lose NULL-trailing rows") {
    val p = fixture()
    val got = KvCommands.table(spark, p).filter(col("c1") === "a")
      .select("pk").as[Long].collect().sorted
    assert(got.sameElements(Array(1L, 2L, 4L)),
      s"got ${got.mkString(",")} — row with c2=NULL lost")
  }

  test("IS NOT NULL on the trailing column restores the rewrite, exactly") {
    val p = fixture()
    val df = KvCommands.table(spark, p)
      .filter(col("c1") === "a" && col("c2").isNotNull)
    val got = df.select("pk").as[Long].collect().sorted
    assert(got.sameElements(Array(1L, 4L)))
    assert(df.queryExecution.optimizedPlan.toString.contains("LeftSemi"))
  }

  test("multi-column covering query reads the index alone") {
    val p = fixture()
    val df = KvCommands.table(spark, p)
      .filter(col("c1") === "a" && col("c2") > 5L)
      .select("c1", "c2", "pk")
    val got = df.select("pk").as[Long].collect().sorted
    assert(got.sameElements(Array(1L, 4L)))
    val plan = df.queryExecution.optimizedPlan.toString
    // covering: one relation (the index), no semi-join back to the base
    assert(!plan.contains("LeftSemi"), plan.take(1500))
    assert(plan.contains("_index"), plan.take(1500))
  }

  test("predicates on both indexed columns rewrite and stay exact") {
    val p = fixture()
    val df = KvCommands.table(spark, p)
      .filter(col("c1") === "a" && col("c2") >= 10L)
    val got = df.select("pk").as[Long].collect().sorted
    assert(got.sameElements(Array(1L, 4L)))
    // the rewrite fires: plan contains the semi-join against the index
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.contains("LeftSemi"), plan.take(1500))
  }
}
