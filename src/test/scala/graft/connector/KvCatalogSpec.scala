package graft.connector

import graft.TestSpark
import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** The reference's SQL DDL/DML surface (SURVEY §2.8 O1-O7) through the
  * graftkv TableCatalog plugin, driven entirely with spark.sql. */
class KvCatalogSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = TestSpark.spark
    s.conf.set("spark.sql.catalog.graft", classOf[GraftKvCatalog].getName)
    s.conf.set("spark.sql.catalog.graft.root",
      Files.createTempDirectory("graft_catalog").toString)
    s
  }

  test("CREATE / INSERT / SELECT / SHOW / DESCRIBE / ALTER / DROP via SQL") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
    spark.sql(
      "CREATE TABLE graft.db.t (k BIGINT, v STRING, d DOUBLE) TBLPROPERTIES ('key'='k')")

    // O6: INSERT VALUES; O7: INSERT SELECT
    spark.sql("INSERT INTO graft.db.t VALUES (2, 'b', 2.5), (1, 'a', 1.0)")
    spark.sql("INSERT INTO graft.db.t SELECT 3, 'c', 3.5")

    val rows = spark.sql("SELECT k, v, d FROM graft.db.t ORDER BY k").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(rows.map(_.getString(1)).toSeq == Seq("a", "b", "c"))

    // filter through the connector (pruning path) via SQL
    assert(spark.sql("SELECT v FROM graft.db.t WHERE k = 2").head().getString(0) == "b")

    // O4 / O5
    val tables = spark.sql("SHOW TABLES IN graft.db").collect().map(_.getString(1))
    assert(tables.contains("t"))
    val desc = spark.sql("DESCRIBE TABLE graft.db.t").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(desc("k") == "bigint" && desc("v") == "string")

    // INSERT OVERWRITE (beyond-reference freebie; reference rejects overwrite)
    spark.sql("INSERT OVERWRITE graft.db.t VALUES (9, 'z', 0.0)")
    assert(spark.sql("SELECT count(*) AS c FROM graft.db.t").head().getLong(0) == 1L)

    // O3: ALTER on an empty table only (metadata-only, like the reference)
    spark.sql("CREATE TABLE graft.db.t2 (k BIGINT, a STRING) TBLPROPERTIES ('key'='k')")
    spark.sql("ALTER TABLE graft.db.t2 ADD COLUMN b INT")
    spark.sql("ALTER TABLE graft.db.t2 DROP COLUMN a")
    val cols = spark.sql("DESCRIBE TABLE graft.db.t2").collect().map(_.getString(0))
    assert(cols.contains("b") && !cols.contains("a"))

    // O2
    spark.sql("DROP TABLE graft.db.t")
    spark.sql("DROP TABLE graft.db.t2")
    assert(spark.sql("SHOW TABLES IN graft.db").collect().isEmpty)
  }

  test("CTAS creates and loads a kv table") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db2")
    spark.sql(
      s"""CREATE TABLE graft.db2.li TBLPROPERTIES ('key'='l_orderkey,l_linenumber') AS
         |SELECT l_orderkey, l_linenumber, l_quantity
         |FROM parquet.`${TestSpark.sf}/lineitem.parquet` WHERE l_orderkey < 100""".stripMargin)
    val n = spark.sql("SELECT count(*) AS c FROM graft.db2.li").head().getLong(0)
    val exp = spark.read.parquet(s"${TestSpark.sf}/lineitem.parquet")
      .filter("l_orderkey < 100").count()
    assert(n == exp)
    spark.sql("DROP TABLE graft.db2.li")
  }
}
