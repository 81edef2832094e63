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

  test("SEARCH INDEX serves the ranking from a materialized index") {
    import spark.implicits._
    val docs = Seq(
      (0L, "spark scan fast spark spark"),
      (1L, "spark window"),
      (2L, "table value other words here"),
      (3L, "scan scan scan scan")
    ).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("sql_ir").toString
    graft.pipeline.Retrieval.buildIndex(docs, dir)
    val viaSql = spark.sql(s"SEARCH INDEX '$dir' FOR 'spark scan' TOP 3")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    val viaApi = graft.pipeline.Retrieval
      .bm25SearchIndex(spark, dir, Seq("spark", "scan"), k = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    assert(viaSql.toSeq == viaApi.toSeq && viaSql.nonEmpty)
    // a dir without an index fails with the statement's own error
    val e = intercept[Exception] {
      spark.sql("SEARCH INDEX '/tmp/definitely_no_index_here' FOR 'x'")
        .collect()
    }
    assert(e.getMessage.contains("SEARCH INDEX"))
  }

  test("SEARCH with tab/newline after the keyword still states the grammar") {
    // the malformed-statement guard must fire on ANY whitespace after
    // SEARCH, not just a single space (round-11 advice item)
    for (stmt <- Seq("SEARCH\tsearch_v FOR 'it''s'", "SEARCH\nx FOR 'a''b'")) {
      val e = intercept[Exception] { spark.sql(stmt).collect() }
      assert(e.getMessage.contains("whitespace-separated"), stmt)
    }
  }

  test("APPROXIMATE [(rsd)] COUNT(DISTINCT c) rewrites onto" +
      " approx_count_distinct") {
    import spark.implicits._
    (1 to 100).map(i => (i % 7, i % 13)).toDF("a", "b")
      .createOrReplaceTempView("apx_v")
    // reference syntax (HBaseSQLQuerySuite.scala:299-309)
    val plain = spark.sql(
      "SELECT APPROXIMATE COUNT(DISTINCT a) AS c FROM apx_v").head().getLong(0)
    val modern = spark.sql(
      "SELECT approx_count_distinct(a) AS c FROM apx_v").head().getLong(0)
    assert(plain == modern)
    val rsd = spark.sql(
      "SELECT APPROXIMATE(0.04) COUNT(DISTINCT a) AS c FROM apx_v")
      .head().getLong(0)
    val modernRsd = spark.sql(
      "SELECT approx_count_distinct(a, 0.04) AS c FROM apx_v")
      .head().getLong(0)
    assert(rsd == modernRsd)
    // composes inside a bigger projection + GROUP BY
    val grouped = spark.sql(
      """SELECT b % 2 AS g, APPROXIMATE COUNT(DISTINCT a) AS c, count(*) AS n
        |FROM apx_v GROUP BY 1 ORDER BY 1""".stripMargin)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    val groupedModern = spark.sql(
      """SELECT b % 2 AS g, approx_count_distinct(a) AS c, count(*) AS n
        |FROM apx_v GROUP BY 1 ORDER BY 1""".stripMargin)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(grouped.toSeq == groupedModern.toSeq)
    // the rewrite never fires inside a string literal
    val lit = spark.sql(
      "SELECT 'APPROXIMATE COUNT(DISTINCT a)' AS s").head().getString(0)
    assert(lit == "APPROXIMATE COUNT(DISTINCT a)")
    // a DOUBLE-quoted literal containing an apostrophe used to flip the
    // single-quote parity tracker and kill the rewrite after it
    val dq = spark.sql(
      "SELECT \"don't\" AS s, APPROXIMATE COUNT(DISTINCT a) AS c FROM apx_v")
      .head()
    assert(dq.getString(0) == "don't" && dq.getLong(1) == modern)
    // comments are masked too (even with an unbalanced quote inside)
    val cm = spark.sql(
      "SELECT APPROXIMATE COUNT(DISTINCT a) AS c " +
        "-- don't APPROXIMATE COUNT(DISTINCT b)\nFROM apx_v").head().getLong(0)
    assert(cm == modern)
  }

  test("maskProtected blanks literals, backtick identifiers, and comments") {
    import graft.sql.GraftSqlParser.maskProtected
    // index-preserving: same length, delimiters kept, contents blanked
    assert(maskProtected("SELECT 'a(b' AS x") == "SELECT '   ' AS x")
    assert(maskProtected("SELECT \"do''n't\" , y") == "SELECT \"       \" , y")
    assert(maskProtected("SELECT `we``ird` FROM t") == "SELECT `       ` FROM t")
    val lineComment = maskProtected("a -- tail 'q\nb")
    assert(lineComment.length == 14 && lineComment.startsWith("a ") &&
      lineComment.endsWith("\nb") && !lineComment.contains("'"))
    assert(maskProtected("x /* 'y */ z") == "x          z")
    // nested bracketed comments (SPARK-28880): the tail stays masked
    val nested = maskProtected("a /* x /* y */ z */ b")
    assert(nested == "a " + (" " * 17) + " b", s"[$nested]")
    // doubled-quote escape stays inside the literal
    assert(maskProtected("'it''s' z") == "'     ' z")
    // backslash escape
    assert(maskProtected("'it\\'s' z") == "'     ' z")
  }

  test("a CREATE statement merely MENTIONING 'MAPPED BY' in a literal delegates to Spark") {
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW mb_lit AS " +
      "SELECT 'CREATE TABLE x MAPPED BY (y)' AS s")
    assert(spark.sql("SELECT s FROM mb_lit").head().getString(0)
      .contains("MAPPED BY"))
    spark.sql("DROP VIEW mb_lit")
  }

  test("CREATE TABLE … MAPPED BY runs the reference DDL text end-to-end") {
    val root = java.nio.file.Files.createTempDirectory("mapped_cat").toString
    spark.conf.set("spark.sql.catalog.graftm",
      classOf[graft.connector.GraftKvCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftm.root", root)
    // reference-style DDL with a BARE table name: lands in the current
    // catalog when that is a graft catalog (reference scripts run
    // against an hbase-native session; the analog is a graft-current one)
    spark.catalog.setCurrentCatalog("graftm")
    try {
      spark.sql(
        """CREATE TABLE teacher (grade INTEGER, class INTEGER,
          |  subject STRING, teacher_name STRING, teacher_age INTEGER,
          |  PRIMARY KEY (grade, class, subject))
          |  MAPPED BY (teacher, COLS=[teacher_name=cf.a, teacher_age=cf.b])"""
          .stripMargin)
      spark.sql(
        "INSERT INTO teacher VALUES (1, 2, 'math', 'alice', 31), " +
          "(1, 3, 'art', 'bob', 44)")
      val rows = spark.sql(
        "SELECT teacher_name, teacher_age FROM teacher WHERE grade = 1 " +
          "AND class = 2 AND subject = 'math'")
        .collect().map(r => (r.getString(0), r.getInt(1)))
      assert(rows.toSeq == Seq(("alice", 31)))
      // the declared layout is real: key order + mapping properties
      val props = spark.sql("SHOW TBLPROPERTIES teacher").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      assert(props("key") == "grade,class,subject")
      assert(props(graft.connector.GraftKvMeta.MappedTableProp) == "teacher")
      assert(props(graft.connector.GraftKvMeta.MappedColsProp) ==
        "teacher_name:cf.a,teacher_age:cf.b")
      // IN stringformat selects the string codec (kv11-class surface)
      spark.sql(
        """CREATE TABLE t_str (k INTEGER, v STRING, PRIMARY KEY (k))
          |  MAPPED BY (hstr, COLS=[v=f.v]) IN STRINGFORMAT""".stripMargin)
      spark.sql("INSERT INTO t_str VALUES (100, 'x'), (51, 'y')")
      // numeric order on string-encoded keys: 51 < 100 (typed compare)
      assert(spark.sql("SELECT k FROM t_str WHERE k > 60")
        .collect().map(_.getInt(0)).toSeq == Seq(100))
      val strProps = spark.sql("SHOW TBLPROPERTIES t_str").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      assert(strProps("encoding") == graft.store.RowCodec.StringFormat)
      // the reference's consistency rule: a non-key column missing from
      // COLS is rejected with the reference's own message
      val bad = intercept[Exception] {
        spark.sql(
          """CREATE TABLE broken (a INTEGER, b STRING, c STRING,
            |  PRIMARY KEY (a)) MAPPED BY (hb, COLS=[b=f.b])""".stripMargin)
      }
      assert(bad.getMessage.contains("Column Info of Create Table"))
      // malformed MAPPED BY text states the grammar instead of the
      // delegate's opaque parse error
      val mal = intercept[Exception] {
        spark.sql("CREATE TABLE x (a INT) MAPPED BY nonsense")
      }
      assert(mal.getMessage.contains("MAPPED BY"))

      // ALTER…MAPPED BY (reference HBaseSQLParser.scala:185-209): add a
      // mapped non-key column — existing rows read null, new writes
      // carry it, and the mapping property extends
      spark.sql("ALTER TABLE teacher ADD teacher_mail STRING " +
        "MAPPED BY (teacher_mail=cf.c)")
      val props3 = spark.sql("SHOW TBLPROPERTIES teacher").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      assert(props3(graft.connector.GraftKvMeta.MappedColsProp) ==
        "teacher_name:cf.a,teacher_age:cf.b,teacher_mail:cf.c")
      spark.sql("INSERT INTO teacher VALUES " +
        "(2, 5, 'bio', 'carol', 28, 'carol@x')")
      assert(spark.sql("SELECT teacher_mail FROM teacher WHERE grade = 2")
        .head().getString(0) == "carol@x")
      assert(spark.sql("SELECT teacher_mail FROM teacher WHERE grade = 1 " +
        "AND class = 2 AND subject = 'math'").head().isNullAt(0))
      // the reference's COLUMN-less DROP retires the column + mapping
      spark.sql("ALTER TABLE teacher DROP teacher_mail")
      assert(!spark.table("teacher").columns.contains("teacher_mail"))
      val props4 = spark.sql("SHOW TBLPROPERTIES teacher").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      assert(props4(graft.connector.GraftKvMeta.MappedColsProp) ==
        "teacher_name:cf.a,teacher_age:cf.b")
      // error parity with alterTableDropNonKey: key columns refuse
      val kerr = intercept[Exception] {
        spark.sql("ALTER TABLE teacher DROP grade")
      }
      assert(kerr.getMessage.contains("key column"))
      // a mapping that names a different column than the added one
      val merr = intercept[Exception] {
        spark.sql("ALTER TABLE teacher ADD xcol INT MAPPED BY (ycol=f.q)")
      }
      assert(merr.getMessage.contains("MAPPED BY"))
    } finally {
      spark.catalog.setCurrentCatalog("spark_catalog")
      spark.conf.unset("spark.sql.catalog.graftm")
      spark.conf.unset("spark.sql.catalog.graftm.root")
    }
  }

  test("non-literal k is rejected with a clear error") {
    val e = intercept[Exception] {
      spark.sql("SELECT minhash_signature(array('x'), 1 + 1)").collect()
    }
    assert(e.getMessage.contains("integer literal") || e.getMessage.contains("minhash"))
  }
}
