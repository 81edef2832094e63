package graft.operators

import graft.{Tables, TestSpark}
import graft.connector.KvCommands
import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Error paths the reference locks in too (invalid-aggregation analysis
  * errors, HBaseSQLQuerySuite.scala:760-779; non-null key contract) —
  * failures must be loud and well-attributed, not silent corruption. */
class ErrorPathSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("non-aggregated column in an aggregate query is an analysis error") {
    Tables.table(spark, TestSpark.sf, "orders").createOrReplaceTempView("o_err")
    val e = intercept[AnalysisException] {
      spark.sql("SELECT o_orderstatus, sum(o_totalprice) FROM o_err").collect()
    }
    assert(e.getMessage.toLowerCase.contains("group"))
  }

  test("unresolved column is an analysis error naming the column") {
    val e = intercept[AnalysisException] {
      Tables.table(spark, TestSpark.sf, "nation").select(col("no_such_col")).collect()
    }
    assert(e.getMessage.contains("no_such_col"))
  }

  test("null in a key column fails the kv write loudly") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("graftkv_err").toString + "/t"
    val df = Seq((java.lang.Long.valueOf(1L), "a"), (null.asInstanceOf[java.lang.Long], "b"))
      .toDF("k", "v")
    val e = intercept[Exception] { KvCommands.createTable(df, path, Seq("k")) }
    // key columns report NOT NULL, so Spark's ANSI store-assignment
    // assert usually fires first; the codec's own guard is the backstop
    def mentions(t: Throwable) = t != null && t.getMessage != null &&
      (t.getMessage.contains("null in key column") ||
        t.getMessage.contains("NOT_NULL_ASSERT_VIOLATION"))
    assert(mentions(e) || mentions(e.getCause))
  }

  test("NUL inside a string key value is rejected, not truncated") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("graftkv_err2").toString + "/t"
    val df = Seq(("a\u0000b", 1)).toDF("k", "v")
    val e = intercept[Exception] { KvCommands.createTable(df, path, Seq("k")) }
    assert(e.getMessage.contains("NUL") ||
      Option(e.getCause).exists(_.getMessage.contains("NUL")))
  }

  test("kv table with unknown key column fails creation with a clear message") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("graftkv_err3").toString + "/t"
    val df = Seq((1L, "a")).toDF("k", "v")
    val e = intercept[Exception] { KvCommands.createTable(df, path, Seq("nope")) }
    assert(e.getMessage.contains("nope") ||
      Option(e.getCause).exists(_.getMessage.contains("nope")))
  }
}
