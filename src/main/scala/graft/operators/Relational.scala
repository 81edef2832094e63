package graft.operators

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** The relational parity surface of the engine — every declared query from
  * SURVEY.md §2 (scans, filters, joins, aggregates, sorts, set ops, scalar
  * functions, windows, grouping sets), expressed DataFrame-first so Catalyst
  * plans scans with pushed filters/pruned columns and picks join strategies
  * (broadcast for dims, shuffled for facts) on its own.
  *
  * Reference surface being reproduced: the relational algebra locked in by
  * Huawei-Spark/Spark-SQL-on-HBase's test corpus
  * (src/test/scala/org/apache/spark/sql/hbase/HBaseSQLQuerySuite.scala,
  * HBaseBasicQueriesSuite.scala, HBaseTpcMiniTestSuite.scala).
  */
object Relational {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  // engine-exact double aggregation (see QuerySpec.dsum contract)
  private def dsum(c: Column): Column = QuerySpec.dsum(c)
  private def davg(c: Column): Column = QuerySpec.davg(c)

  private val stageLock = new Object

  /** Idempotently materialize a derived-format copy of the documents
    * corpus (JSONL/ORC/hive-partitioned parquet source gates). The
    * cache key folds in a corpus fingerprint — the driver regenerates
    * /root/testdata between rounds, and a stale staged copy would fail
    * the gates against a fresh oracle with no hint why. */
  private def staged(s: SparkSession, d: String, kind: String)(
      build: String => Unit): String = stageLock.synchronized {
    def stamp(f: java.io.File): Long =
      if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty).map(stamp).sum
      else f.length() + f.lastModified()
    val fp = java.lang.Long.toHexString(
      stamp(new java.io.File(s"$d/documents.parquet")))
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_stage/" +
      s"${d.replaceAll("[^a-zA-Z0-9.]", "_")}/${kind}_$fp"
    if (!new java.io.File(s"$path/_SUCCESS").exists()) {
      // the corpus regenerated: staged copies of the PREVIOUS corpus are
      // dead weight — sweep them before building the new fingerprint
      graft.Tables.sweepStaleSiblings(new java.io.File(path).getParentFile,
        s"${kind}_", s"${kind}_$fp")
      build(path)
    }
    path
  }

  val specs: Seq[QuerySpec] = Seq(

    // ── §2.1 scans ────────────────────────────────────────────────────────
    // (l_orderkey, l_linenumber) is NOT unique in the corpus — every
    // lineitem ordering below is total over the projected columns.
    QuerySpec.checked("s1_scan_limit",
      """SELECT * FROM lineitem ORDER BY l_orderkey, l_linenumber, l_partkey,
        |l_suppkey, l_quantity, l_extendedprice LIMIT 3""") {
      (s, d) => t(s, d, "lineitem").orderBy("l_orderkey", "l_linenumber",
        "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice").limit(3)
    },

    QuerySpec.checked("s2_point_lookup",
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |WHERE l_orderkey = 1 ORDER BY l_linenumber, l_quantity""") { (s, d) =>
      t(s, d, "lineitem").filter(col("l_orderkey") === 1)
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_linenumber", "l_quantity")
    },

    QuerySpec.checked("s3_count_star",
      "SELECT count(*) AS cnt FROM lineitem") { (s, d) =>
      t(s, d, "lineitem").agg(count(lit(1)).as("cnt"))
    },

    // gzip-JSONL roundtrip of the documents corpus — the lingua franca
    // of training-data interchange. The gate writes the corpus once per
    // corpus generation (sharded .json.gz), reads it back with an
    // explicit schema (type fidelity, not inference), and hash-matches
    // the PARQUET truth — so writer escaping, reader parsing, and
    // compression framing are all on the hook.
    QuerySpec.checked("s4_jsonl_roundtrip",
      """SELECT doc_id, text, lang, source, n_chars FROM documents
        |ORDER BY doc_id""") { (s, d) =>
      val p = staged(s, d, "jsonl") { path =>
        t(s, d, "documents").write.mode("overwrite")
          .option("compression", "gzip").json(path)
      }
      s.read
        .schema("doc_id BIGINT, text STRING, lang STRING, source STRING," +
          " n_chars BIGINT")
        .json(p)
        .select("doc_id", "text", "lang", "source", "n_chars")
        .orderBy("doc_id")
    },

    // ORC roundtrip — the other columnar interchange format Spark
    // ships natively; types carry in the file footer (no schema pass).
    QuerySpec.checked("s5_orc_roundtrip",
      """SELECT doc_id, text, lang, source, n_chars FROM documents
        |ORDER BY doc_id""") { (s, d) =>
      val p = staged(s, d, "orc") { path =>
        t(s, d, "documents").write.mode("overwrite").orc(path)
      }
      s.read.orc(p)
        .select("doc_id", "text", "lang", "source", "n_chars")
        .orderBy("doc_id")
    },

    // Hive-style partitioned parquet + partition PRUNING: the corpus is
    // laid out lang=<v>/… and a lang filter must resolve at the
    // directory level (PartitionFilters in the scan; the spec pins the
    // pruned file count), reading none of the other languages' bytes —
    // the standard layout for multi-source corpus curation at scale.
    QuerySpec.checked("s6_partition_pruned_scan",
      """SELECT doc_id, text, n_chars FROM documents
        |WHERE lang = 'en' ORDER BY doc_id""") { (s, d) =>
      val p = staged(s, d, "bylang") { path =>
        t(s, d, "documents").write.mode("overwrite")
          .partitionBy("lang").parquet(path)
      }
      s.read.parquet(p)
        .filter(col("lang") === "en")
        .select("doc_id", "text", "n_chars")
        .orderBy("doc_id")
    },

    // ── §2.2 filters / predicates ─────────────────────────────────────────
    QuerySpec.checked("p1_filter_project",
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_totalprice > 1000 AND o_orderstatus = 'O'
        |ORDER BY o_orderkey""") { (s, d) =>
      t(s, d, "orders")
        .filter(col("o_totalprice") > 1000 && col("o_orderstatus") === "O")
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
    },

    QuerySpec.checked("p2_not_demorgan",
      """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |WHERE NOT (o_orderstatus = 'O' OR o_totalprice < 500)
        |ORDER BY o_orderkey""") { (s, d) =>
      t(s, d, "orders")
        .filter(!(col("o_orderstatus") === "O" || col("o_totalprice") < 500))
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .orderBy("o_orderkey")
    },

    QuerySpec.checked("p3_in_list",
      """SELECT c_name FROM customer WHERE c_nationkey IN (1, 2, 3)
        |ORDER BY c_name""") { (s, d) =>
      t(s, d, "customer").filter(col("c_nationkey").isin(1, 2, 3))
        .select("c_name").orderBy("c_name")
    },

    QuerySpec.checked("p4_range_conjunction",
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |WHERE l_orderkey > 10 AND l_orderkey < 500 AND l_quantity >= 25
        |ORDER BY l_orderkey, l_linenumber, l_quantity""") { (s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_orderkey") > 10 && col("l_orderkey") < 500 &&
          col("l_quantity") >= 25)
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber", "l_quantity")
    },

    // o_custkey has no NULLs in the corpus at any SF, so IS NULL semantics
    // are exercised through a derived nullable column (nullif) instead.
    QuerySpec.checked("p5_is_null",
      """SELECT o_orderkey FROM orders WHERE nullif(o_orderstatus, 'O') IS NULL
        |ORDER BY o_orderkey""") { (s, d) =>
      t(s, d, "orders").filter(nullif(col("o_orderstatus"), lit("O")).isNull)
        .select("o_orderkey").orderBy("o_orderkey")
    },

    QuerySpec.checked("p6_is_not_null",
      """SELECT o_orderkey FROM orders WHERE nullif(o_orderstatus, 'O') IS NOT NULL
        |ORDER BY o_orderkey""") { (s, d) =>
      t(s, d, "orders").filter(nullif(col("o_orderstatus"), lit("O")).isNotNull)
        .select("o_orderkey").orderBy("o_orderkey")
    },

    QuerySpec.checked("p7_timestamp_between",
      """SELECT l_orderkey, l_linenumber FROM lineitem
        |WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-01-01'
        |ORDER BY l_orderkey, l_linenumber""") { (s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_shipdate").between(
          to_timestamp(lit("1996-01-01")), to_timestamp(lit("1997-01-01"))))
        .select("l_orderkey", "l_linenumber")
        .orderBy("l_orderkey", "l_linenumber")
    },

    QuerySpec.checked("p8_like",
      "SELECT c_name FROM customer WHERE c_name LIKE '%0001%' ORDER BY c_name") {
      (s, d) =>
        t(s, d, "customer").filter(col("c_name").like("%0001%"))
          .select("c_name").orderBy("c_name")
    },

    QuerySpec.checked("p9_not_like",
      "SELECT c_name FROM customer WHERE c_name NOT LIKE '%1%' ORDER BY c_name") {
      (s, d) =>
        t(s, d, "customer").filter(!col("c_name").like("%1%"))
          .select("c_name").orderBy("c_name")
    },

    QuerySpec.checked("p10_not_between",
      """SELECT o_orderkey FROM orders WHERE o_orderkey NOT BETWEEN 10 AND 5000
        |ORDER BY o_orderkey""") { (s, d) =>
      t(s, d, "orders").filter(!col("o_orderkey").between(10, 5000))
        .select("o_orderkey").orderBy("o_orderkey")
    },

    // ── §2.3 joins ────────────────────────────────────────────────────────
    QuerySpec.checked("j1_inner_equi",
      """SELECT c.c_name, o.o_orderkey, o.o_totalprice
        |FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
        |ORDER BY o.o_orderkey""") { (s, d) =>
      val c = t(s, d, "customer"); val o = t(s, d, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "inner")
        .select("c_name", "o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
    },

    QuerySpec.checked("j2_left_outer",
      """SELECT n.n_nationkey, n.n_name, r.r_name
        |FROM nation n LEFT OUTER JOIN region r ON n.n_regionkey = r.r_regionkey
        |ORDER BY n.n_nationkey""") { (s, d) =>
      val n = t(s, d, "nation"); val r = t(s, d, "region")
      n.join(r, n("n_regionkey") === r("r_regionkey"), "left_outer")
        .select("n_nationkey", "n_name", "r_name")
        .orderBy("n_nationkey")
    },

    QuerySpec.checked("j3_full_outer",
      """SELECT r.r_regionkey, r.r_name, n.n_nationkey, n.n_name
        |FROM region r FULL OUTER JOIN nation n ON r.r_regionkey = n.n_regionkey
        |ORDER BY n.n_nationkey ASC NULLS FIRST, r.r_regionkey ASC NULLS FIRST""") {
      (s, d) =>
        val r = t(s, d, "region"); val n = t(s, d, "nation")
        r.join(n, r("r_regionkey") === n("n_regionkey"), "full_outer")
          .select("r_regionkey", "r_name", "n_nationkey", "n_name")
          .orderBy(col("n_nationkey").asc_nulls_first, col("r_regionkey").asc_nulls_first)
    },

    QuerySpec.checked("j4_left_semi_theta",
      """SELECT x.n_nationkey, x.n_name, x.n_regionkey FROM nation x
        |WHERE EXISTS (SELECT 1 FROM region y WHERE x.n_regionkey >= y.r_regionkey + 2)
        |ORDER BY x.n_nationkey""") { (s, d) =>
      val n = t(s, d, "nation"); val r = t(s, d, "region")
      n.join(r, n("n_regionkey") >= r("r_regionkey") + 2, "left_semi")
        .select("n_nationkey", "n_name", "n_regionkey")
        .orderBy("n_nationkey")
    },

    QuerySpec.checked("j5_implicit_join",
      """SELECT s.s_name FROM supplier s, nation n
        |WHERE s.s_nationkey = n.n_nationkey AND n.n_name = 'NATION_3'
        |ORDER BY s.s_name""") { (s, d) =>
      val sup = t(s, d, "supplier"); val n = t(s, d, "nation")
      sup.crossJoin(n)
        .filter(col("s_nationkey") === col("n_nationkey") && col("n_name") === "NATION_3")
        .select("s_name").orderBy("s_name")
    },

    QuerySpec.checked("j6_multiway_self",
      """SELECT a.n_nationkey AS ak, b.n_name AS bn, c.n_regionkey AS ck
        |FROM nation a JOIN nation b ON a.n_nationkey = b.n_nationkey
        |JOIN nation c ON a.n_nationkey = c.n_nationkey
        |ORDER BY ak""") { (s, d) =>
      val a = t(s, d, "nation").alias("a")
      val b = t(s, d, "nation").alias("b")
      val c = t(s, d, "nation").alias("c")
      a.join(b, col("a.n_nationkey") === col("b.n_nationkey"))
        .join(c, col("a.n_nationkey") === col("c.n_nationkey"))
        .select(col("a.n_nationkey").as("ak"), col("b.n_name").as("bn"),
          col("c.n_regionkey").as("ck"))
        .orderBy("ak")
    },

    QuerySpec.checked("j7_nullsafe_eq",
      """SELECT n.n_nationkey, r.r_name FROM nation n JOIN region r
        |ON n.n_regionkey IS NOT DISTINCT FROM r.r_regionkey
        |ORDER BY n.n_nationkey""") { (s, d) =>
      val n = t(s, d, "nation"); val r = t(s, d, "region")
      n.join(r, n("n_regionkey") <=> r("r_regionkey"))
        .select("n_nationkey", "r_name").orderBy("n_nationkey")
    },

    QuerySpec.checked("j8_join_limited_subquery",
      """SELECT c.c_custkey, o.o_orderkey
        |FROM (SELECT * FROM customer ORDER BY c_custkey LIMIT 100) c
        |JOIN orders o ON c.c_custkey = o.o_custkey
        |ORDER BY o.o_orderkey""") { (s, d) =>
      val c = t(s, d, "customer").orderBy("c_custkey").limit(100)
      val o = t(s, d, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"))
        .select("c_custkey", "o_orderkey").orderBy("o_orderkey")
    },

    QuerySpec.checked("j9_fact_dim_broadcast",
      """SELECT l.l_orderkey, l.l_linenumber, p.p_name
        |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |WHERE p.p_size > 40
        |ORDER BY l.l_orderkey, l.l_linenumber, p.p_name""") { (s, d) =>
      val l = t(s, d, "lineitem")
      val p = t(s, d, "part").filter(col("p_size") > 40)
      // dim side is small at every SF relative to the fact: broadcast it.
      l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
        .select("l_orderkey", "l_linenumber", "p_name")
        .orderBy("l_orderkey", "l_linenumber", "p_name")
    },

    QuerySpec.checked("j10_left_anti",
      """SELECT c.c_custkey FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 4000)
        |ORDER BY c.c_custkey""") { (s, d) =>
      val c = t(s, d, "customer")
      val o = t(s, d, "orders").filter(col("o_totalprice") > 4000)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select("c_custkey").orderBy("c_custkey")
    },

    // skew-safe salted join — must be indistinguishable from the plain
    // join (the oracle IS the plain join), while spreading hot keys over
    // nSalts shuffle partitions. The replicated side must be a genuinely
    // small dim (supplier = SF×10k rows): replication multiplies it by
    // nSalts, so a fact-sized right side would defeat the rewrite.
    QuerySpec.checked("j11_salted_join",
      """SELECT l.l_orderkey, l.l_linenumber, s.s_name
        |FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |ORDER BY l.l_orderkey, l.l_linenumber, s.s_name""") { (s, d) =>
      Scale.saltedJoin(
        t(s, d, "lineitem").withColumnRenamed("l_suppkey", "s_suppkey"),
        t(s, d, "supplier"), key = "s_suppkey", nSalts = 8)
        .select(col("l_orderkey"), col("l_linenumber"), col("s_name"))
        .orderBy("l_orderkey", "l_linenumber", "s_name")
    },

    // ── §2.4 aggregates ───────────────────────────────────────────────────
    QuerySpec.checked("a1_groupby_count",
      """SELECT l_orderkey, count(1) AS cnt FROM lineitem
        |GROUP BY l_orderkey ORDER BY l_orderkey""") { (s, d) =>
      t(s, d, "lineitem").groupBy("l_orderkey")
        .agg(count(lit(1)).as("cnt")).orderBy("l_orderkey")
    },

    QuerySpec.checked("a2_group_sum_range",
      """SELECT l_orderkey, l_linenumber,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_price
        |FROM lineitem WHERE l_orderkey > 100 AND l_orderkey <= 500
        |GROUP BY l_orderkey, l_linenumber
        |ORDER BY l_orderkey, l_linenumber""") { (s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_orderkey") > 100 && col("l_orderkey") <= 500)
        .groupBy("l_orderkey", "l_linenumber")
        .agg(dsum(col("l_extendedprice")).as("sum_price"))
        .orderBy("l_orderkey", "l_linenumber")
    },

    QuerySpec.checked("a3_min_max_avg",
      """SELECT l_returnflag, min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) / count(l_quantity) AS avg_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""") { (s, d) =>
      t(s, d, "lineitem").groupBy("l_returnflag")
        .agg(min("l_quantity").as("min_qty"), max("l_quantity").as("max_qty"),
          davg(col("l_quantity")).as("avg_qty"))
        .orderBy("l_returnflag")
    },

    QuerySpec.checked("a4_count_distinct",
      "SELECT count(DISTINCT o_custkey) AS cd FROM orders") { (s, d) =>
      t(s, d, "orders").agg(countDistinct(col("o_custkey")).as("cd"))
    },

    QuerySpec.checked("a5_having",
      """SELECT o_custkey, count(o_orderkey) AS cnt FROM orders
        |GROUP BY o_custkey HAVING count(o_orderkey) > 5
        |ORDER BY o_custkey ASC NULLS FIRST""") { (s, d) =>
      t(s, d, "orders").groupBy("o_custkey")
        .agg(count(col("o_orderkey")).as("cnt"))
        .filter(col("cnt") > 5)
        .orderBy(col("o_custkey").asc_nulls_first)
    },

    QuerySpec.checked("a6_avg_group",
      """SELECT c_nationkey,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE) / count(c_acctbal) AS avg_bal
        |FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""") { (s, d) =>
      t(s, d, "customer").groupBy("c_nationkey")
        .agg(davg(col("c_acctbal")).as("avg_bal"))
        .orderBy("c_nationkey")
    },

    QuerySpec.checked("a7_count_in",
      """SELECT count(o_custkey) AS cnt FROM orders
        |WHERE o_custkey IN (1, 25, 50, 75, 100)""") { (s, d) =>
      t(s, d, "orders").filter(col("o_custkey").isin(1, 25, 50, 75, 100))
        .agg(count(col("o_custkey")).as("cnt"))
    },

    // shared builder (TpcH.q1) so the parquet and kv gates never drift
    QuerySpec.checked("a8_tpch_q1", TpcH.q1OracleSql) { (s, d) =>
      TpcH.q1(name => t(s, d, name))
    },

    QuerySpec.checked("a9_multi_count_distinct",
      """SELECT count(*) AS cd2 FROM
        |(SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem)""") { (s, d) =>
      t(s, d, "lineitem")
        .agg(countDistinct(col("l_returnflag"), col("l_linestatus")).as("cd2"))
    },

    // HLL sketch values differ across engines, so the sketch itself
    // cannot hash-match — but the accuracy CONTRACT can: emit the exact
    // count (oracle-checkable) plus an in-band verdict for the sketch
    // at 3× the configured rsd (ApproxSpec pins the same bound).
    QuerySpec.checked("a10_approx_count_distinct",
      """SELECT count(DISTINCT o_custkey) AS exact_cd, true AS approx_ok
        |FROM orders""") { (s, d) =>
      t(s, d, "orders")
        .agg(countDistinct(col("o_custkey")).as("exact_cd"),
          approx_count_distinct(col("o_custkey"), 0.04).as("acd"))
        .select(col("exact_cd"),
          (abs(col("acd") - col("exact_cd")).cast("double") / col("exact_cd")
            <= 0.12).as("approx_ok"))
    },

    QuerySpec.checked("a11_group_by_expr",
      """SELECT l_orderkey % 10 AS bucket, count(1) AS cnt FROM lineitem
        |GROUP BY 1 ORDER BY 1""") { (s, d) =>
      t(s, d, "lineitem").groupBy((col("l_orderkey") % 10).as("bucket"))
        .agg(count(lit(1)).as("cnt")).orderBy("bucket")
    },

    QuerySpec.checked("a12_negated_agg",
      "SELECT -max(l_quantity) AS neg_max, -min(l_quantity) AS neg_min FROM lineitem") {
      (s, d) =>
        t(s, d, "lineitem")
          .agg((-max(col("l_quantity"))).as("neg_max"),
            (-min(col("l_quantity"))).as("neg_min"))
    },

    // ── §2.6 sorts / limits / distinct ────────────────────────────────────
    QuerySpec.checked("t1_sort_desc_limit",
      "SELECT * FROM nation ORDER BY n_name DESC LIMIT 5") { (s, d) =>
      t(s, d, "nation").orderBy(col("n_name").desc).limit(5)
    },

    QuerySpec.checked("t2_sort_multi_dir",
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""") { (s, d) =>
      t(s, d, "orders").select("o_orderkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc).limit(10)
    },

    QuerySpec.checked("t3_distinct",
      "SELECT DISTINCT o_orderstatus FROM orders ORDER BY o_orderstatus") { (s, d) =>
      t(s, d, "orders").select("o_orderstatus").distinct().orderBy("o_orderstatus")
    },

    QuerySpec.checked("t4_topk_project",
      "SELECT c_name FROM customer ORDER BY c_custkey LIMIT 2") { (s, d) =>
      t(s, d, "customer").orderBy("c_custkey").select("c_name").limit(2)
    },

    // ── §2.7 set operations ───────────────────────────────────────────────
    QuerySpec.checked("u1_union_distinct",
      """SELECT n_name AS name FROM nation UNION SELECT r_name AS name FROM region
        |ORDER BY name""") { (s, d) =>
      t(s, d, "nation").select(col("n_name").as("name"))
        .union(t(s, d, "region").select(col("r_name").as("name")))
        .distinct().orderBy("name")
    },

    QuerySpec.checked("u2_union_all",
      """SELECT n_regionkey AS rk FROM nation UNION ALL
        |SELECT r_regionkey AS rk FROM region ORDER BY rk""") { (s, d) =>
      t(s, d, "nation").select(col("n_regionkey").as("rk"))
        .union(t(s, d, "region").select(col("r_regionkey").as("rk")))
        .orderBy("rk")
    },

    QuerySpec.checked("u3_intersect",
      """SELECT n_regionkey AS rk FROM nation INTERSECT
        |SELECT r_regionkey AS rk FROM region ORDER BY rk""") { (s, d) =>
      t(s, d, "nation").select(col("n_regionkey").as("rk"))
        .intersect(t(s, d, "region").select(col("r_regionkey").as("rk")))
        .orderBy("rk")
    },

    QuerySpec.checked("u4_except",
      """SELECT rk FROM (SELECT n_nationkey AS rk FROM nation EXCEPT
        |SELECT r_regionkey AS rk FROM region) ORDER BY rk""") { (s, d) =>
      t(s, d, "nation").select(col("n_nationkey").as("rk"))
        .except(t(s, d, "region").select(col("r_regionkey").as("rk")))
        .orderBy("rk")
    },

    // ── §2.9 scalar functions / expressions ───────────────────────────────
    QuerySpec.checked("f1_substr",
      """SELECT substr(c_name, 1, 8) AS s FROM customer
        |ORDER BY c_custkey LIMIT 5""") { (s, d) =>
      t(s, d, "customer").orderBy("c_custkey")
        .select(substring(col("c_name"), 1, 8).as("s")).limit(5)
    },

    QuerySpec.checked("f2_upper_lower",
      """SELECT upper(n.n_name) AS un, lower(r.r_name) AS lr
        |FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
        |ORDER BY un""") { (s, d) =>
      val n = t(s, d, "nation"); val r = t(s, d, "region")
      n.join(r, n("n_regionkey") === r("r_regionkey"))
        .select(upper(col("n_name")).as("un"), lower(col("r_name")).as("lr"))
        .orderBy("un")
    },

    QuerySpec.checked("f3_math_scalar",
      "SELECT CAST(abs(-1.3) AS DOUBLE) AS a, CAST(sqrt(4.0) AS DOUBLE) AS sq") {
      (s, _) =>
        s.range(1).select(abs(lit(-1.3d)).as("a"), sqrt(lit(4.0d)).as("sq"))
    },

    QuerySpec.checked("f4_bitwise",
      """SELECT o_orderkey & 1 AS band, o_orderkey | 0 AS bor,
        |  xor(o_orderkey, 0) AS bxor, ~o_orderkey AS bnot
        |FROM orders ORDER BY o_orderkey LIMIT 3""") { (s, d) =>
      t(s, d, "orders").orderBy("o_orderkey")
        .select(
          col("o_orderkey").bitwiseAND(lit(1L)).as("band"),
          col("o_orderkey").bitwiseOR(lit(0L)).as("bor"),
          col("o_orderkey").bitwiseXOR(lit(0L)).as("bxor"),
          bitwise_not(col("o_orderkey")).as("bnot"))
        .limit(3)
    },

    QuerySpec.checked("f5_case_when",
      """SELECT o_orderkey,
        |  CASE WHEN o_totalprice > 1000 THEN 'big' ELSE 'small' END AS sz
        |FROM orders ORDER BY o_orderkey LIMIT 10""") { (s, d) =>
      t(s, d, "orders").orderBy("o_orderkey")
        .select(col("o_orderkey"),
          when(col("o_totalprice") > 1000, "big").otherwise("small").as("sz"))
        .limit(10)
    },

    QuerySpec.checked("f6_casts",
      "SELECT CAST(true AS VARCHAR) AS bs, CAST('123' AS INTEGER) AS i") { (s, _) =>
      s.range(1).select(lit(true).cast("string").as("bs"),
        lit("123").cast("int").as("i"))
    },

    QuerySpec.checked("f7_unary_neg",
      """SELECT -o_totalprice AS np, -(o_orderkey + 1) AS nk
        |FROM orders ORDER BY o_orderkey LIMIT 3""") { (s, d) =>
      t(s, d, "orders").orderBy("o_orderkey")
        .select((-col("o_totalprice")).as("np"),
          (-(col("o_orderkey") + 1)).as("nk"))
        .limit(3)
    },

    QuerySpec.checked("f8_between_numeric",
      """SELECT l_orderkey, l_linenumber FROM lineitem
        |WHERE l_quantity BETWEEN 10 AND 20
        |ORDER BY l_orderkey, l_linenumber LIMIT 5""") { (s, d) =>
      t(s, d, "lineitem").filter(col("l_quantity").between(10, 20))
        .select("l_orderkey", "l_linenumber")
        .orderBy("l_orderkey", "l_linenumber").limit(5)
    },

    QuerySpec.checked("f9_concat_length",
      """SELECT c_name || '_' || c_mktsegment AS cn,
        |  CAST(length(c_name) AS INTEGER) AS ln
        |FROM customer ORDER BY c_custkey LIMIT 5""") { (s, d) =>
      t(s, d, "customer").orderBy("c_custkey")
        .select(concat(col("c_name"), lit("_"), col("c_mktsegment")).as("cn"),
          length(col("c_name")).as("ln"))
        .limit(5)
    },

    // UDF surface (reference: HBaseAdditionalQuerySuite.scala:193-227) — a
    // registered scalar UDF usable in projections/filters.
    QuerySpec.checked("f10_udf_scalar",
      """SELECT c_name FROM customer
        |WHERE CAST(length(c_name) AS INTEGER) > 10 AND c_nationkey = 1
        |ORDER BY c_name""") { (s, d) =>
      s.udf.register("graft_strlen", (v: String) => if (v == null) 0 else v.length)
      t(s, d, "customer")
        .filter(call_udf("graft_strlen", col("c_name")) > 10 && col("c_nationkey") === 1)
        .select("c_name").orderBy("c_name")
    },

    QuerySpec.checked("f11_conditional",
      """SELECT o_orderkey, coalesce(o_orderpriority, 'none') AS pr,
        |  nullif(o_orderstatus, 'O') AS st
        |FROM orders ORDER BY o_orderkey LIMIT 5""") { (s, d) =>
      t(s, d, "orders").orderBy("o_orderkey")
        .select(col("o_orderkey"),
          coalesce(col("o_orderpriority"), lit("none")).as("pr"),
          nullif(col("o_orderstatus"), lit("O")).as("st"))
        .limit(5)
    },

    QuerySpec.checked("f12_datetime_parts",
      """SELECT CAST(year(o_orderdate) AS INTEGER) AS y,
        |  CAST(month(o_orderdate) AS INTEGER) AS m, count(*) AS cnt
        |FROM orders GROUP BY 1, 2 ORDER BY 1, 2""") { (s, d) =>
      t(s, d, "orders")
        .groupBy(year(col("o_orderdate")).as("y"), month(col("o_orderdate")).as("m"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy("y", "m")
    },

    QuerySpec.checked("f13_complex_types",
      """SELECT l_orderkey, ([l_quantity, l_discount])[1] AS arr0,
        |  ({'q': l_quantity, 'd': l_discount}).q AS sq
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, l_quantity, l_discount LIMIT 5""") { (s, d) =>
      t(s, d, "lineitem").orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_discount")
        .select(col("l_orderkey"),
          array(col("l_quantity"), col("l_discount")).getItem(0).as("arr0"),
          struct(col("l_quantity").as("q"), col("l_discount").as("d"))
            .getField("q").as("sq"))
        .limit(5)
    },

    QuerySpec.checked("f15_string_funcs",
      """SELECT trim(c_mktsegment) AS t, replace(c_name, 'Customer', 'C') AS rp,
        |  lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS lp,
        |  CAST(strpos(c_name, '#') AS INTEGER) AS ip,
        |  reverse(c_mktsegment) AS rv
        |FROM customer ORDER BY c_custkey LIMIT 5""") { (s, d) =>
      t(s, d, "customer").orderBy("c_custkey")
        .select(trim(col("c_mktsegment")).as("t"),
          regexp_replace(col("c_name"), "Customer", "C").as("rp"),
          lpad(col("c_custkey").cast("string"), 10, "0").as("lp"),
          instr(col("c_name"), "#").as("ip"),
          reverse(col("c_mktsegment")).as("rv"))
        .limit(5)
    },

    // sqrt is IEEE-correctly-rounded (identical across engines); ln/exp
    // are probed at exact points only — libm implementations may differ
    // in the last ulp elsewhere, and round() differs on .5 ties
    QuerySpec.checked("f16_math_funcs",
      """SELECT CAST(sqrt(o_totalprice) AS DOUBLE) AS sq,
        |  CAST(floor(o_totalprice) AS BIGINT) AS f,
        |  CAST(ceil(o_totalprice) AS BIGINT) AS c,
        |  CAST(pow(o_orderkey, 2) AS DOUBLE) AS p,
        |  o_orderkey % 7 AS m, CAST(exp(0) AS DOUBLE) AS e,
        |  CAST(ln(1) AS DOUBLE) AS l
        |FROM orders ORDER BY o_orderkey LIMIT 5""") { (s, d) =>
      t(s, d, "orders").orderBy("o_orderkey")
        .select(sqrt(col("o_totalprice")).as("sq"),
          floor(col("o_totalprice")).as("f"),
          ceil(col("o_totalprice")).as("c"),
          pow(col("o_orderkey"), 2).as("p"),
          (col("o_orderkey") % 7).as("m"),
          exp(lit(0)).as("e"),
          log(lit(1.0)).as("l"))
        .limit(5)
    },

    // generator / UDTF surface (§2.10): explode = LATERAL VIEW / unnest
    QuerySpec.checked("x1_explode",
      """SELECT n_nationkey, unnest(string_split(n_name, '_')) AS part
        |FROM nation WHERE n_nationkey < 5 ORDER BY n_nationkey, part""") { (s, d) =>
      t(s, d, "nation").filter(col("n_nationkey") < 5)
        .select(col("n_nationkey"), explode(split(col("n_name"), "_")).as("part"))
        .orderBy("n_nationkey", "part")
    },

    QuerySpec.checked("x2_scalar_subquery",
      """SELECT o_orderkey, (SELECT max(o_totalprice) FROM orders) AS mx
        |FROM orders ORDER BY o_orderkey LIMIT 5""") { (s, d) =>
      val o = t(s, d, "orders")
      val mx = o.agg(max(col("o_totalprice")).as("mx"))
      o.orderBy("o_orderkey").limit(5).select("o_orderkey")
        .crossJoin(broadcast(mx))
    },

    // partition-local sort (reference T2 SORT BY) — order depends on the
    // partitioning, so no cross-engine oracle; pinned by plan/count only
    // intra-partition order has no ANSI restatement (the layout is the
    // point), so the checked form states the conservation laws + the
    // order itself: row/key totals match the corpus and every
    // partition is verified monotone INSIDE its task (round 13 —
    // formerly rows-only)
    QuerySpec.checked("t5_sort_within_partitions",
      """SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
        |  true AS sorted_ok FROM orders""") { (s, d) =>
      import s.implicits._
      val sorted = t(s, d, "orders").select("o_orderkey", "o_totalprice")
        .sortWithinPartitions("o_orderkey")
      sorted.select(col("o_orderkey")).as[Long]
        .mapPartitions { it =>
          var n = 0L; var ksum = 0L; var ok = true; var prev = Long.MinValue
          it.foreach { k =>
            if (k < prev) ok = false
            prev = k; n += 1; ksum += k
          }
          Iterator((n, ksum, ok))
        }
        .toDF("n", "ksum", "ok")
        .agg(sum("n").cast("long").as("n_rows"),
          sum("ksum").cast("long").as("key_sum"),
          coalesce(min("ok"), lit(true)).as("sorted_ok"))
    },

    // ── §2.5 windows (engine capability beyond reference parity) ─────────
    QuerySpec.checked("w1_row_number",
      """SELECT o_orderkey,
        |  CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS INTEGER) AS rn
        |FROM orders ORDER BY o_orderkey""") { (s, d) =>
      val w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
      t(s, d, "orders")
        .select(col("o_orderkey"), row_number().over(w).as("rn"))
        .orderBy("o_orderkey")
    },

    // RANGE (not ROWS) frame + DECIMAL accumulation: (l_orderkey,
    // l_linenumber) has duplicates, so a ROWS frame would be
    // tie-order-dependent; RANGE gives every peer row the same value.
    QuerySpec.checked("w2_running_sum",
      """SELECT l_orderkey, l_linenumber,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) OVER (
        |    PARTITION BY l_orderkey ORDER BY l_linenumber
        |    RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_qty
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""") { (s, d) =>
      val w = Window.partitionBy("l_orderkey").orderBy("l_linenumber")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          sum(col("l_quantity").cast(DecimalType(38, 6))).over(w)
            .cast(DoubleType).as("run_qty"))
        .orderBy("l_orderkey", "l_linenumber")
    },

    QuerySpec.checked("w3_rank_lag",
      """SELECT o_orderkey,
        |  CAST(rank() OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC) AS INTEGER) AS rk,
        |  lag(o_totalprice) OVER (PARTITION BY o_orderstatus ORDER BY o_orderkey) AS prev_price
        |FROM orders ORDER BY o_orderkey""") { (s, d) =>
      val wRank = Window.partitionBy("o_orderstatus").orderBy(col("o_totalprice").desc)
      val wLag = Window.partitionBy("o_orderstatus").orderBy("o_orderkey")
      t(s, d, "orders")
        .select(col("o_orderkey"), rank().over(wRank).as("rk"),
          lag(col("o_totalprice"), 1).over(wLag).as("prev_price"))
        .orderBy("o_orderkey")
    },

    // ── grouping sets (beyond-reference freebies, §2.4 "absent") ──────────
    QuerySpec.checked("g1_rollup",
      """SELECT l_returnflag, l_linestatus, count(*) AS cnt FROM lineitem
        |GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""") {
      (s, d) =>
        t(s, d, "lineitem").rollup("l_returnflag", "l_linestatus")
          .agg(count(lit(1)).as("cnt"))
          .orderBy(col("l_returnflag").asc_nulls_first,
            col("l_linestatus").asc_nulls_first)
    },

    // explicit GROUPING SETS (SQL entry point — the DataFrame API only
    // exposes rollup/cube; both lifecycles are first-class, SURVEY §3.1/3.2)
    QuerySpec.checked("g3_grouping_sets",
      """SELECT l_returnflag, l_linestatus, count(*) AS cnt FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""") {
      (s, d) =>
        Tables.table(s, d, "lineitem").createOrReplaceTempView("lineitem_gs")
        s.sql(
          """SELECT l_returnflag, l_linestatus, count(*) AS cnt FROM lineitem_gs
            |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
            |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin)
    },

    // IN-subquery predicate (semi-join in SQL form)
    QuerySpec.checked("x3_in_subquery",
      """SELECT o_orderkey FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_nationkey = 1)
        |ORDER BY o_orderkey""") { (s, d) =>
      Tables.table(s, d, "orders").createOrReplaceTempView("orders_sq")
      Tables.table(s, d, "customer").createOrReplaceTempView("customer_sq")
      s.sql(
        """SELECT o_orderkey FROM orders_sq
          |WHERE o_custkey IN (SELECT c_custkey FROM customer_sq WHERE c_nationkey = 1)
          |ORDER BY o_orderkey""".stripMargin)
    },

    // pivot (beyond-reference freebie) — oracle as CASE aggregation
    QuerySpec.checked("p11_pivot",
      """SELECT l_linestatus,
        |  CAST(sum(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS A,
        |  CAST(sum(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END) AS BIGINT) AS N,
        |  CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS R
        |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""") { (s, d) =>
      t(s, d, "lineitem")
        .groupBy("l_linestatus")
        .pivot("l_returnflag", Seq("A", "N", "R"))
        .agg(coalesce(count(lit(1)), lit(0L)))
        .na.fill(0L)
        .orderBy("l_linestatus")
    },

    // unpivot (melt) — pivot's inverse; oracle as a UNION ALL of the
    // wide columns (DuckDB's UNPIVOT normalizes types differently, the
    // union keeps both sides' shapes identical)
    QuerySpec.checked("p12_unpivot",
      """SELECT * FROM (
        |  SELECT c_custkey, 'c_acctbal' AS metric, CAST(c_acctbal AS DOUBLE) AS value FROM customer
        |  UNION ALL
        |  SELECT c_custkey, 'c_nationkey' AS metric, CAST(c_nationkey AS DOUBLE) AS value FROM customer
        |) ORDER BY c_custkey, metric""") { (s, d) =>
      t(s, d, "customer")
        .unpivot(Array(col("c_custkey")),
          Array(col("c_acctbal").cast("double").as("c_acctbal"),
            col("c_nationkey").cast("double").as("c_nationkey")),
          "metric", "value")
        .orderBy("c_custkey", "metric")
    },

    // min_by/max_by — the deterministic restatement of the reference's
    // LAST(n) surface (HBaseSQLQuerySuite.scala:88-92): value at the
    // extreme of a unique ordering column
    QuerySpec.checked("a13_min_by_max_by",
      """SELECT o_orderstatus,
        |  max_by(o_totalprice, o_orderkey) AS last_price,
        |  min_by(o_totalprice, o_orderkey) AS first_price
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""") { (s, d) =>
      t(s, d, "orders").groupBy("o_orderstatus")
        .agg(max_by(col("o_totalprice"), col("o_orderkey")).as("last_price"),
          min_by(col("o_totalprice"), col("o_orderkey")).as("first_price"))
        .orderBy("o_orderstatus")
    },

    // ── §2.10 typed UDAF (Aggregator + functions.udaf) ───────────────────
    // Quantity-weighted mean price; decimal-exact accumulation so the
    // double result is bit-identical to DuckDB (see WeightedAvg scaladoc).
    // Scales are chosen so the product sum stays scale 6 — DuckDB's
    // decimal→double cast is lossy once the unscaled value leaves the
    // int64 range, so a scale-12 product sum would drift a ulp.
    QuerySpec.checked("a14_udaf",
      """SELECT l_returnflag,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(24,4)) * CAST(l_quantity AS DECIMAL(14,2))) AS DOUBLE)
        |    / CAST(sum(CAST(l_quantity AS DECIMAL(14,2))) AS DOUBLE) AS wavg_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""") { (s, d) =>
      t(s, d, "lineitem").groupBy("l_returnflag")
        .agg(graft.functions.WeightedAvg(
          col("l_extendedprice").cast("decimal(24,4)"),
          col("l_quantity").cast("decimal(14,2)")).as("wavg_price"))
        .orderBy("l_returnflag")
    },

    QuerySpec.checked("g2_cube",
      """SELECT o_orderstatus, o_orderpriority, count(*) AS cnt FROM orders
        |GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""") {
      (s, d) =>
        t(s, d, "orders").cube("o_orderstatus", "o_orderpriority")
          .agg(count(lit(1)).as("cnt"))
          .orderBy(col("o_orderstatus").asc_nulls_first,
            col("o_orderpriority").asc_nulls_first)
    },

    // ── round-4 surface widening ──────────────────────────────────────────

    // Exact interpolated quantiles. l_quantity holds small integers, so
    // every interpolation at p ∈ {0.25, 0.5} lands on a multiple of 0.25 —
    // exact in double under both engines' interpolation formulas (a general
    // p over arbitrary doubles could differ by an ulp between a+(b-a)f and
    // a(1-f)+bf).
    QuerySpec.checked("a15_median",
      """SELECT l_returnflag,
        |  quantile_cont(l_quantity, 0.5) AS med_qty,
        |  quantile_cont(l_quantity, 0.25) AS q1_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""") { (s, d) =>
      t(s, d, "lineitem").groupBy("l_returnflag")
        .agg(expr("percentile(l_quantity, 0.5)").as("med_qty"),
          expr("percentile(l_quantity, 0.25)").as("q1_qty"))
        .orderBy("l_returnflag")
    },

    // TPC-H Q3 shape (shipping priority): selective dim filter →
    // 3-way join → grouped revenue → top-k. Revenue routes through
    // DECIMAL(38,6) (cross-engine exact) and the ORDER BY carries a
    // unique tiebreak (l_orderkey), so the LIMIT is deterministic.
    QuerySpec.checked("a16_tpch_q3", TpcH.q3OracleSql) { (s, d) =>
      TpcH.q3(t(s, d, _))
    },

    // TPC-H Q5 shape (local supplier volume): 6-way star with the
    // customer-supplier co-nation condition; the three dims
    // (supplier/nation/region) broadcast, the fact side shuffles once.
    QuerySpec.checked("a17_tpch_q5",
      """SELECT n_name,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue
        |FROM customer, orders, lineitem, supplier, nation, region
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |  AND r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""") { (s, d) =>
      t(s, d, "lineitem")
        .join(t(s, d, "orders")
          .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01")) &&
            col("o_orderdate") < to_timestamp(lit("1998-01-01"))),
          col("l_orderkey") === col("o_orderkey"))
        .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .join(t(s, d, "supplier"),
          col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .join(t(s, d, "nation"), col("s_nationkey") === col("n_nationkey"))
        .join(t(s, d, "region").filter(col("r_name") === "ASIA"),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy("n_name")
        .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    },

    // TPC-H Q10 shape (returned-item reporting): quarter window +
    // returnflag filter, revenue per customer, top 20 with a unique
    // tiebreak.
    QuerySpec.checked("a18_tpch_q10",
      """SELECT c_custkey, c_name,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
        |  c_acctbal, n_name
        |FROM customer, orders, lineitem, nation
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND o_orderdate >= TIMESTAMP '1998-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-04-01'
        |  AND l_returnflag = 'R' AND c_nationkey = n_nationkey
        |GROUP BY c_custkey, c_name, c_acctbal, n_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20""") { (s, d) =>
      t(s, d, "customer")
        .join(t(s, d, "orders")
          .filter(col("o_orderdate") >= to_timestamp(lit("1998-01-01")) &&
            col("o_orderdate") < to_timestamp(lit("1998-04-01"))),
          col("c_custkey") === col("o_custkey"))
        .join(t(s, d, "lineitem").filter(col("l_returnflag") === "R"),
          col("l_orderkey") === col("o_orderkey"))
        .join(t(s, d, "nation"), col("c_nationkey") === col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    },

    // TPC-H Q18 shape (large-volume customer): aggregate-HAVING
    // subquery as a semi-join — the scalable form: one grouped pass
    // over lineitem finds qualifying orders, a semi-join restricts the
    // fact, and only then do the dimension joins and final grouping
    // run. Quantity sums route through DECIMAL(38,6) on BOTH sides so
    // the HAVING boundary cannot flip on float accumulation order.
    QuerySpec.checked("a19_tpch_q18", TpcH.q18OracleSql) { (s, d) =>
      TpcH.q18(t(s, d, _))
    },

    // Rank-fraction window functions: the divisions are the same two
    // IEEE-exact operations in both engines ((rank-1)/(n-1), rank/n), and
    // o_orderkey is unique so the ordering is total.
    QuerySpec.checked("w4_rank_fractions",
      """SELECT o_orderkey,
        |  CAST(ntile(4) OVER (PARTITION BY o_orderstatus ORDER BY o_orderkey) AS INTEGER) AS tile,
        |  percent_rank() OVER (PARTITION BY o_orderstatus ORDER BY o_orderkey) AS pr,
        |  cume_dist() OVER (PARTITION BY o_orderstatus ORDER BY o_orderkey) AS cd
        |FROM orders ORDER BY o_orderkey""") { (s, d) =>
      val w = Window.partitionBy("o_orderstatus").orderBy("o_orderkey")
      t(s, d, "orders").select(col("o_orderkey"),
        ntile(4).over(w).as("tile"), percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd")).orderBy("o_orderkey")
    },

    // Correlated aggregate subquery, re-expressed as the scalable form: one
    // grouped aggregation + an equi-join back to the fact (never a per-row
    // subquery execution). The oracle states the correlated original.
    QuerySpec.checked("x4_correlated_agg_subquery",
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders o
        |WHERE o_totalprice > (
        |  SELECT CAST(sum(CAST(o2.o_totalprice AS DECIMAL(38,6))) AS DOUBLE)
        |         / count(o2.o_totalprice)
        |  FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
        |ORDER BY o_orderkey""") { (s, d) =>
      val o = t(s, d, "orders")
      val avgs = o.groupBy("o_custkey")
        .agg(davg(col("o_totalprice")).as("__avg"))
      o.join(avgs, "o_custkey")
        .where(col("o_totalprice") > col("__avg"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy("o_orderkey")
    },

    // Regex family. The replace pattern is anchored so first-match
    // (DuckDB default) and all-matches (Spark) semantics coincide.
    QuerySpec.checked("f17_regex",
      """SELECT o_orderkey,
        |  regexp_extract(o_orderpriority, '([0-9]+)', 1) AS pri_num,
        |  regexp_replace(o_orderpriority, '^[0-9]-', '') AS pri_name,
        |  lpad(o_orderstatus, 3, '_') AS padded
        |FROM orders ORDER BY o_orderkey LIMIT 20""") { (s, d) =>
      t(s, d, "orders").orderBy("o_orderkey").limit(20)
        .select(col("o_orderkey"),
          regexp_extract(col("o_orderpriority"), "([0-9]+)", 1).as("pri_num"),
          regexp_replace(col("o_orderpriority"), "^[0-9]-", "").as("pri_name"),
          lpad(col("o_orderstatus"), 3, "_").as("padded"))
    }
  )
}
