package graft

import org.scalatest.funsuite.AnyFunSuite

/** The shell's execution core: corpus views + kv catalog + native
  * functions all reachable from one SQL entry point. */
class ShellSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = TestSpark.spark
    Tables.registerAll(s, TestSpark.sf)
    sql.GraftExtensions.register(s)
    s.conf.set("spark.sql.catalog.graft", classOf[connector.GraftKvCatalog].getName)
    s.conf.set("spark.sql.catalog.graft.root",
      java.nio.file.Files.createTempDirectory("graft_shell").toString)
    s
  }

  test("corpus views, kv DDL, and native functions through one SQL session") {
    assert(Shell.execute(spark, "SELECT count(*) AS c FROM lineitem;").head().getLong(0) == 6000L)
    Shell.execute(spark, "CREATE NAMESPACE IF NOT EXISTS graft.sh")
    Shell.execute(spark,
      "CREATE TABLE graft.sh.t TBLPROPERTIES('key'='n_nationkey') AS SELECT * FROM nation")
    assert(Shell.execute(spark, "SELECT count(*) AS c FROM graft.sh.t").head().getLong(0) == 25L)
    val h = Shell.execute(spark,
      "SELECT rolling_hash(n_name) AS h FROM graft.sh.t WHERE n_nationkey = 3")
      .head().getLong(0)
    assert(h != 0L)
    Shell.execute(spark, "DROP TABLE graft.sh.t")
  }
}
