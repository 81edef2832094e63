package graft.sql

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends AnyFunSuite {
  private lazy val spark = { val s = TestSpark.spark; GraftExtensions.register(s); s }

  test("rolling_hash is callable from SQL and matches the Column API") {
    graft.Tables.table(spark, TestSpark.sf, "documents").createOrReplaceTempView("docs_v")
    val viaSql = spark.sql(
      "SELECT doc_id, rolling_hash(text, 16) AS h FROM docs_v ORDER BY doc_id LIMIT 10")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val viaCol = graft.Tables.table(spark, TestSpark.sf, "documents")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        graft.functions.RollingHash.rolling_hash(
          org.apache.spark.sql.functions.col("text"), 16).as("h"))
      .orderBy("doc_id").limit(10)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(viaSql.toSeq == viaCol.toSeq)
  }

  test("minhash_signature is callable from SQL with default and explicit k") {
    val rows = spark.sql(
      """SELECT minhash_signature(array('a b c', 'b c d'), 8) AS sig,
        |       minhash_signature(array('a b c', 'b c d')) AS sig64""".stripMargin)
      .head()
    assert(rows.getSeq[Long](0).length == 8)
    assert(rows.getSeq[Long](1).length == 64)
  }

  test("SEARCH statement runs BM25 and matches the Column API") {
    import spark.implicits._
    Seq(
      (0L, "spark scan fast spark spark"),
      (1L, "spark window"),
      (2L, "table value other words here"),
      (3L, "scan scan scan scan")
    ).toDF("doc_id", "text").createOrReplaceTempView("search_v")
    val viaSql = spark.sql("SEARCH search_v FOR 'spark scan' TOP 3")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    val viaApi = graft.pipeline.Retrieval
      .bm25TopK(spark.table("search_v"), Seq("spark", "scan"), k = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    assert(viaSql.toSeq == viaApi.toSeq)
    assert(viaSql.nonEmpty && viaSql.head._1 == 0L) // both terms, high tf
    // USING picks the text column; default TOP is 10
    Seq((7L, "spark only here")).toDF("doc_id", "body")
      .createOrReplaceTempView("search_b")
    val body = spark.sql("SEARCH search_b FOR 'spark' USING body").collect()
    assert(body.length == 1 && body.head.getLong(0) == 7L)
    // a missing text column fails loudly, not with a planner mystery
    val e = intercept[Exception] {
      spark.sql("SEARCH search_b FOR 'spark'").collect()
    }
    assert(e.getMessage.contains("SEARCH"))
    // a missing doc_id column fails loudly too (round-11 advice item)
    Seq(("x", "spark text")).toDF("name", "text")
      .createOrReplaceTempView("search_noid")
    val e2 = intercept[Exception] {
      spark.sql("SEARCH search_noid FOR 'spark'").collect()
    }
    assert(e2.getMessage.contains("doc_id"))
    // a malformed SEARCH (quote inside the term literal) states the
    // grammar instead of falling through to an opaque delegate error
    val e3 = intercept[Exception] {
      spark.sql("SEARCH search_v FOR 'it''s broken'").collect()
    }
    assert(e3.getMessage.contains("whitespace-separated"))
  }

  test("non-literal k is rejected with a clear error") {
    val e = intercept[Exception] {
      spark.sql("SELECT minhash_signature(array('x'), 1 + 1)").collect()
    }
    assert(e.getMessage.contains("integer literal") || e.getMessage.contains("minhash"))
  }
}
