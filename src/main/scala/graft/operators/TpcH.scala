package graft.operators

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The TPC-H decision-support suite, adapted to the driver corpus.
  *
  * The reference pins its inherited relational surface with a TPC-mini
  * suite (src/test/scala/org/apache/spark/sql/hbase/
  * HBaseTpcMiniTestSuite.scala); Q1/Q3/Q5/Q10/Q18 shapes already gate in
  * Relational.scala (a8/a16-a19). This file completes the suite with
  * every remaining query expressible over the corpus schema: Q4, Q6, Q7,
  * Q8, Q9, Q12, Q13, Q14, Q15, Q17, Q19, Q21, Q22 — and, since round 7,
  * Q2/Q11/Q16/Q20 over the deterministically synthesized partsupp table
  * ([[PartSupp]]; the corpus does not ship one), making the suite
  * 22/22 complete.
  *
  * Adaptations (the corpus is TPC-H-ISH — no commitdate/receiptdate/
  * shipmode/phone columns): "late delivery" predicates restate as
  * l_shipdate > o_orderdate; Q12's shipmode groups by l_linestatus;
  * Q22's phone country code restates as c_nationkey % 7. Each keeps the
  * original's PLAN shape — that is what these queries exist to exercise:
  * semi/anti joins from EXISTS, correlated aggregate gates as grouped
  * joins, disjunctive pushdown, CASE-sum ratios, having-on-aggregate.
  *
  * Cross-engine exactness: double aggregation routes through
  * DECIMAL(38,6) (QuerySpec.dsum contract), ratios divide two such
  * doubles (IEEE-exact in both engines), counts cast to BIGINT, years to
  * INTEGER, and every query is totally ordered.
  */
object TpcH {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  private def dsum(c: Column): Column = QuerySpec.dsum(c)
  private def davg(c: Column): Column = QuerySpec.davg(c)

  private def ts(lit0: String): Column = to_timestamp(lit(lit0))

  /** Q1 (pricing summary) over ANY table source — shared by the
    * parquet gate (`a8_tpch_q1`, Relational.scala) and the kv-storage
    * gate (`kv44_tpch_q1_on_kv`, KvOps.scala): the full-table
    * scan-and-aggregate shape, on kv driven by the columnar reader +
    * pushed shipdate filter. */
  val q1OracleSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_base_price,
      |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS sum_disc_price,
      |  CAST(sum(CAST(l_discount AS DECIMAL(38,6))) AS DOUBLE) / count(l_discount) AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  def q1(table: String => DataFrame): DataFrame =
    table("lineitem")
      .filter(col("l_shipdate") <= ts("1998-09-02"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("sum_disc_price"),
        davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** Q6 (forecast revenue) over ANY table source — the pure
    * filter-and-aggregate shape; on kv the shipdate/discount/quantity
    * conjunction pushes into zone pruning + residual codegen. */
  val q6OracleSql: String =
    """SELECT CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(38,6))) AS DOUBLE) AS revenue
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      |  AND l_shipdate < TIMESTAMP '1998-01-01'
      |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin

  def q6(table: String => DataFrame): DataFrame =
    table("lineitem")
      .filter(col("l_shipdate") >= ts("1997-01-01") &&
        col("l_shipdate") < ts("1998-01-01") &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(dsum(col("l_extendedprice") * col("l_discount")).as("revenue"))

  /** Q3 (shipping priority) over ANY table source — shared by the
    * parquet gate (`a16_tpch_q3`, Relational.scala) and the kv-storage
    * gate (`kv32_tpch_q3_on_kv`, KvOps.scala) so the two can never
    * drift: both run THIS plan against the SAME oracle, differing only
    * in where the tables live. */
  val q3OracleSql: String =
    """SELECT l_orderkey,
      |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
      |  o_orderdate, o_orderpriority
      |FROM customer, orders, lineitem
      |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
      |  AND l_orderkey = o_orderkey
      |  AND o_orderdate < TIMESTAMP '1998-06-01'
      |  AND l_shipdate > TIMESTAMP '1998-06-01'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, o_orderdate, l_orderkey
      |LIMIT 10""".stripMargin

  def q3(table: String => DataFrame): DataFrame = {
    val cutoff = ts("1998-06-01")
    table("customer").filter(col("c_mktsegment") === "BUILDING")
      .join(table("orders").filter(col("o_orderdate") < cutoff),
        col("c_custkey") === col("o_custkey"))
      .join(table("lineitem").filter(col("l_shipdate") > cutoff),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
      .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
        .as("revenue"))
      .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
      .orderBy(col("revenue").desc, col("o_orderdate"), col("l_orderkey"))
      .limit(10)
  }

  /** Q18 (large-volume customer) over ANY table source — shared by the
    * parquet gate (`a19_tpch_q18`) and the kv-storage gate
    * (`kv34_tpch_q18_on_kv`); on a kv lineitem keyed by l_orderkey the
    * HAVING subquery's GROUP BY runs shuffle-free off the scan's
    * KeyGroupedPartitioning. */
  val q18OracleSql: String =
    """SELECT c_custkey, c_name, o_orderkey, o_totalprice,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS total_qty
      |FROM customer, orders, lineitem
      |WHERE o_orderkey IN (
      |    SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      |    HAVING sum(CAST(l_quantity AS DECIMAL(38,6))) > 300)
      |  AND c_custkey = o_custkey AND o_orderkey = l_orderkey
      |GROUP BY c_custkey, c_name, o_orderkey, o_totalprice
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin

  /** Largest plan-stats estimate of the lineitem scan (bytes) at which
    * [[q18]] still broadcast-hints its heavy-hitter semi build. The
    * HAVING's survivor count grows LINEARLY with the fact (~0.3% of
    * orders ≈ rows/800 in TPC-H), so an UNCONDITIONAL hint — which
    * bypasses every AQE size check — would eventually hit the 8 GB /
    * 512M-row broadcast cap and OOM the driver (r15 verdict item 2).
    * At the 1 TB default the bound is ~5M survivor keys ≈ 40 MB
    * broadcast — two orders of magnitude under the cap — while every
    * bench scale (10 MB at sf0.1, 107 MB at the sf1 fixture) keeps the
    * measured 2.8 → 1.9 s win; past it the plain join lets AQE price
    * the build from runtime sizes and keep the scale-safe sort-merge. */
  val Q18MaxBroadcastFactBytesKey = "spark.graft.q18.maxBroadcastFactBytes"
  val Q18MaxBroadcastFactBytesDefault: Long = 1L << 40

  def q18(table: String => DataFrame): DataFrame = {
    val li = table("lineitem")
    val big = li.groupBy("l_orderkey")
      .agg(dsum(col("l_quantity")).as("__q"))
      .filter(col("__q") > 300).select("l_orderkey")
    // Broadcast the heavy-hitter set explicitly (round 15, guide §3.1):
    // the HAVING keeps only orders whose total quantity exceeds 300 —
    // ~0.3% of orders — but the filter sits ABOVE the aggregation
    // exchange, so AQE prices the semi-join by the pre-HAVING agg stage
    // (270 MB at 10×) and planned a sort-merge join that shuffled the
    // whole fact by l_orderkey (144 MB at 10×). With the hint the fact
    // never shuffles for the semi; measured 2.8 → 1.9 s at the sf1
    // section. SIZE-CONDITIONAL since round 16: the survivor set grows
    // linearly with the fact, so the hint applies only while the fact's
    // plan-stats estimate keeps the survivor bound far under the
    // broadcast cap (see [[Q18MaxBroadcastFactBytesKey]]) — above it
    // the hint is withheld and AQE plans from runtime sizes.
    val maxFact = li.sparkSession.conf
      .get(Q18MaxBroadcastFactBytesKey,
        Q18MaxBroadcastFactBytesDefault.toString).toLong
    val estFact = li.queryExecution.optimizedPlan.stats.sizeInBytes
    val build = if (estFact <= maxFact) broadcast(big) else big
    li.join(build, Seq("l_orderkey"), "left_semi")
      .join(table("orders"), col("l_orderkey") === col("o_orderkey"))
      .join(table("customer"), col("o_custkey") === col("c_custkey"))
      .groupBy("c_custkey", "c_name", "o_orderkey", "o_totalprice")
      .agg(dsum(col("l_quantity")).as("total_qty"))
      .select("c_custkey", "c_name", "o_orderkey", "o_totalprice", "total_qty")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(20)
  }

  val specs: Seq[QuerySpec] = Seq(

    // Q4 — order priority checking. EXISTS(lineitem shipped after the
    // order date) ⟺ max(l_shipdate) per l_orderkey > o_orderdate, so the
    // semi-join build side is the PRE-AGGREGATED one-row-per-order
    // relation (map-side-combinable max), not the raw fact projection:
    // the raw-fact broadcast grows with fact size (600k rows at sf0.1,
    // unbroadcastable at 100×), while the aggregate is bounded by the
    // order count and stays broadcastable an order of magnitude longer.
    QuerySpec.checked("h04_tpch_q4",
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-07-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""") { (s, d) =>
      val o = t(s, d, "orders")
        .filter(col("o_orderdate") >= ts("1996-01-01") &&
          col("o_orderdate") < ts("1996-07-01"))
      val maxShip = t(s, d, "lineitem")
        .groupBy("l_orderkey")
        .agg(max(col("l_shipdate")).as("__max_ship"))
      o.join(maxShip,
          col("l_orderkey") === col("o_orderkey") &&
            col("__max_ship") > col("o_orderdate"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    },

    // Q6 — forecasting revenue change: the pure scan-side query (all
    // three predicates push to the parquet scan; no join, no shuffle
    // beyond the final single-row agg).
    QuerySpec.checked("h06_tpch_q6", q6OracleSql) { (s, d) =>
      q6(name => t(s, d, name))
    },

    // Q7 — volume shipping between two nations: the nation table joins
    // TWICE (supplier side and customer side) with a symmetric pair
    // disjunction; both nation copies broadcast.
    QuerySpec.checked("h07_tpch_q7",
      """SELECT supp_nation, cust_nation, l_year,
        |  CAST(sum(CAST(volume AS DECIMAL(38,6))) AS DOUBLE) AS revenue
        |FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |        CAST(year(l_shipdate) AS INTEGER) AS l_year,
        |        l_extendedprice * (1 - l_discount) AS volume
        |      FROM supplier, lineitem, orders, customer, nation n1, nation n2
        |      WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
        |        AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
        |        AND c_nationkey = n2.n_nationkey
        |        AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        |        AND l_shipdate >= TIMESTAMP '1996-01-01'
        |        AND l_shipdate < TIMESTAMP '1998-01-01') shipping
        |GROUP BY supp_nation, cust_nation, l_year
        |ORDER BY supp_nation, cust_nation, l_year""") { (s, d) =>
      val n1 = t(s, d, "nation").select(col("n_nationkey").as("s_nkey"),
        col("n_name").as("supp_nation"))
      val n2 = t(s, d, "nation").select(col("n_nationkey").as("c_nkey"),
        col("n_name").as("cust_nation"))
      t(s, d, "lineitem")
        .filter(col("l_shipdate") >= ts("1996-01-01") &&
          col("l_shipdate") < ts("1998-01-01"))
        .join(t(s, d, "orders"), col("o_orderkey") === col("l_orderkey"))
        .join(t(s, d, "customer"), col("c_custkey") === col("o_custkey"))
        .join(t(s, d, "supplier"), col("s_suppkey") === col("l_suppkey"))
        .join(n1, col("s_nationkey") === col("s_nkey"))
        .join(n2, col("c_nationkey") === col("c_nkey"))
        .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
          (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).as("l_year"))
        .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    },

    // Q8 — national market share: the widest join in the suite (7 tables,
    // nation twice); the share is a CASE-sum over the joined volume
    // divided by the total, both DECIMAL-routed then divided as doubles.
    QuerySpec.checked("h08_tpch_q8",
      """SELECT o_year,
        |  CAST(sum(CAST(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END AS DECIMAL(38,6))) AS DOUBLE)
        |    / CAST(sum(CAST(volume AS DECIMAL(38,6))) AS DOUBLE) AS mkt_share
        |FROM (SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
        |        l_extendedprice * (1 - l_discount) AS volume,
        |        n2.n_name AS supp_nation
        |      FROM part, supplier, lineitem, orders, customer, nation n1, nation n2, region
        |      WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
        |        AND l_orderkey = o_orderkey AND o_custkey = c_custkey
        |        AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
        |        AND r_name = 'ASIA' AND s_nationkey = n2.n_nationkey
        |        AND o_orderdate >= TIMESTAMP '1996-01-01'
        |        AND o_orderdate < TIMESTAMP '1998-01-01'
        |        AND p_type = 'PROMO') all_nations
        |GROUP BY o_year ORDER BY o_year""") { (s, d) =>
      val n1 = t(s, d, "nation").select(col("n_nationkey").as("c_nkey"),
        col("n_regionkey").as("c_rkey"))
      val n2 = t(s, d, "nation").select(col("n_nationkey").as("s_nkey"),
        col("n_name").as("supp_nation"))
      val vol = col("l_extendedprice") * (lit(1) - col("l_discount"))
      t(s, d, "lineitem")
        .join(t(s, d, "part").filter(col("p_type") === "PROMO"),
          col("p_partkey") === col("l_partkey"))
        .join(t(s, d, "orders")
          .filter(col("o_orderdate") >= ts("1996-01-01") &&
            col("o_orderdate") < ts("1998-01-01")),
          col("l_orderkey") === col("o_orderkey"))
        .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .join(n1, col("c_nationkey") === col("c_nkey"))
        .join(t(s, d, "region").filter(col("r_name") === "ASIA"),
          col("c_rkey") === col("r_regionkey"))
        .join(t(s, d, "supplier"), col("s_suppkey") === col("l_suppkey"))
        .join(n2, col("s_nationkey") === col("s_nkey"))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg((dsum(when(col("supp_nation") === "NATION_3", vol).otherwise(0)) /
          dsum(vol)).as("mkt_share"))
        .orderBy("o_year")
    },

    // Q9 — product-type profit (sans partsupp: profit = revenue). The
    // LIKE filter on part name is the selective entry; groups by the
    // SUPPLIER's nation and order year.
    QuerySpec.checked("h09_tpch_q9",
      """SELECT nation, o_year,
        |  CAST(sum(CAST(amount AS DECIMAL(38,6))) AS DOUBLE) AS sum_profit
        |FROM (SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
        |        l_extendedprice * (1 - l_discount) AS amount
        |      FROM part, supplier, lineitem, orders, nation
        |      WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
        |        AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
        |        AND p_name LIKE '%red%') profit
        |GROUP BY nation, o_year ORDER BY nation, o_year DESC""") { (s, d) =>
      t(s, d, "lineitem")
        .join(t(s, d, "part").filter(col("p_name").like("%red%")),
          col("p_partkey") === col("l_partkey"))
        .join(t(s, d, "orders"), col("o_orderkey") === col("l_orderkey"))
        .join(t(s, d, "supplier"), col("s_suppkey") === col("l_suppkey"))
        .join(t(s, d, "nation"), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"),
          year(col("o_orderdate")).as("o_year"))
        .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("sum_profit"))
        .orderBy(col("nation"), col("o_year").desc)
    },

    // Q12 — shipping-priority classification (shipmode → l_linestatus):
    // late-shipped lines bucket their order's priority into high/low
    // CASE-counts per status.
    QuerySpec.checked("h12_tpch_q12",
      """SELECT l_linestatus,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM orders, lineitem
        |WHERE o_orderkey = l_orderkey AND l_shipdate > o_orderdate
        |  AND l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |GROUP BY l_linestatus ORDER BY l_linestatus""") { (s, d) =>
      val hi = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      t(s, d, "lineitem")
        .filter(col("l_shipdate") >= ts("1997-01-01") &&
          col("l_shipdate") < ts("1998-01-01"))
        .join(t(s, d, "orders"), col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") > col("o_orderdate"))
        .groupBy("l_linestatus")
        .agg(sum(when(hi, 1).otherwise(0)).as("high_line_count"),
          sum(when(!hi, 1).otherwise(0)).as("low_line_count"))
        .orderBy("l_linestatus")
    },

    // Q13 — customer order-count distribution: LEFT OUTER join with a
    // join-clause-only filter (the distinction Q13 exists to test — a
    // WHERE would drop order-less customers), then a two-level count.
    QuerySpec.checked("h13_tpch_q13",
      """SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
        |FROM (SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
        |      FROM customer LEFT OUTER JOIN orders
        |        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |      GROUP BY c_custkey) c_orders
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""") { (s, d) =>
      t(s, d, "customer")
        .join(t(s, d, "orders").filter(col("o_orderpriority") =!= "1-URGENT"),
          col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    },

    // Q14 — promo revenue percent: CASE-sum ratio over one join; both
    // sums DECIMAL-routed, the ratio an IEEE double division.
    QuerySpec.checked("h14_tpch_q14",
      """SELECT 100.0 *
        |  CAST(sum(CAST(CASE WHEN p_type = 'PROMO'
        |    THEN l_extendedprice * (1 - l_discount) ELSE 0 END AS DECIMAL(38,6))) AS DOUBLE)
        |  / CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE)
        |  AS promo_revenue
        |FROM lineitem, part
        |WHERE l_partkey = p_partkey
        |  AND l_shipdate >= TIMESTAMP '1997-09-01'
        |  AND l_shipdate < TIMESTAMP '1997-10-01'""") { (s, d) =>
      val vol = col("l_extendedprice") * (lit(1) - col("l_discount"))
      t(s, d, "lineitem")
        .filter(col("l_shipdate") >= ts("1997-09-01") &&
          col("l_shipdate") < ts("1997-10-01"))
        .join(t(s, d, "part"), col("l_partkey") === col("p_partkey"))
        .agg((lit(100.0) *
          dsum(when(col("p_type") === "PROMO", vol).otherwise(0)) /
          dsum(vol)).as("promo_revenue"))
    },

    // Q15 — top supplier: a reused aggregate ("view") compared against
    // its own max — the equality stays in DECIMAL(38,6) (exact in both
    // engines), so ties resolve identically; output casts to double.
    QuerySpec.checked("h15_tpch_q15",
      """WITH revenue AS (
        |  SELECT l_suppkey AS supplier_no,
        |    sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |    AND l_shipdate < TIMESTAMP '1997-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue
        |FROM supplier, revenue
        |WHERE s_suppkey = supplier_no
        |  AND total_revenue = (SELECT max(total_revenue) FROM revenue)
        |ORDER BY s_suppkey""") { (s, d) =>
      val revenue = t(s, d, "lineitem")
        .filter(col("l_shipdate") >= ts("1997-01-01") &&
          col("l_shipdate") < ts("1997-04-01"))
        .groupBy(col("l_suppkey").as("supplier_no"))
        .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast(org.apache.spark.sql.types.DecimalType(38, 6)))
          .as("total_revenue"))
      val top = revenue.agg(max(col("total_revenue")).as("__max"))
      t(s, d, "supplier")
        .join(revenue, col("s_suppkey") === col("supplier_no"))
        .join(top, col("total_revenue") === col("__max"))
        .select(col("s_suppkey"), col("s_name"),
          col("total_revenue").cast("double").as("total_revenue"))
        .orderBy("s_suppkey")
    },

    // Q17 — small-quantity revenue: the correlated per-part average gate,
    // re-expressed as a grouped aggregate + equi-join (the scalable
    // form); the threshold math is double-deterministic on both sides.
    QuerySpec.checked("h17_tpch_q17",
      """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) / 7.0 AS avg_yearly
        |FROM lineitem, part
        |WHERE p_partkey = l_partkey AND p_brand = 'Brand#23'
        |  AND l_quantity < (
        |    SELECT 0.2 * (CAST(sum(CAST(l2.l_quantity AS DECIMAL(38,6))) AS DOUBLE)
        |                  / count(l2.l_quantity))
        |    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)""") { (s, d) =>
      val li = t(s, d, "lineitem")
      val partAvg = li.groupBy(col("l_partkey").as("ap_partkey"))
        .agg((lit(0.2) * davg(col("l_quantity"))).as("qty_cut"))
      li.join(t(s, d, "part").filter(col("p_brand") === "Brand#23"),
          col("p_partkey") === col("l_partkey"))
        .join(partAvg, col("l_partkey") === col("ap_partkey"))
        .filter(col("l_quantity") < col("qty_cut"))
        .agg((dsum(col("l_extendedprice")) / 7.0).as("avg_yearly"))
    },

    // Q19 — disjunctive brand/size/quantity predicates: three OR'd
    // conjunct groups over the join; the partkey equi-condition must
    // still extract (no cartesian), the rest evaluates as residual.
    QuerySpec.checked("h19_tpch_q19",
      """SELECT CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue
        |FROM lineitem, part
        |WHERE p_partkey = l_partkey AND (
        |     (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
        |       AND l_quantity BETWEEN 1 AND 11)
        |  OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
        |       AND l_quantity BETWEEN 10 AND 20)
        |  OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
        |       AND l_quantity BETWEEN 20 AND 30))""") { (s, d) =>
      val pred =
        (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
          col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
          col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#34" && col("p_size").between(1, 15) &&
          col("l_quantity").between(20, 30))
      t(s, d, "lineitem")
        .join(t(s, d, "part"), col("p_partkey") === col("l_partkey"))
        .filter(pred)
        .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("revenue"))
    },

    // Q21 — suppliers who kept orders waiting: the EXISTS/NOT-EXISTS
    // pair re-expressed as per-order supplier statistics (distinct
    // suppliers, distinct LATE suppliers) joined back — one grouped
    // pass instead of two correlated subqueries per row.
    QuerySpec.checked("h21_tpch_q21",
      """SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
        |FROM supplier, lineitem l1, orders, nation
        |WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
        |  AND o_orderstatus = 'F' AND l1.l_shipdate > o_orderdate
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_shipdate > o_orderdate)
        |  AND s_nationkey = n_nationkey AND n_name = 'NATION_5'
        |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100""") { (s, d) =>
      // ONE lineitem pass, ONE fact shuffle: the joined fact partitions
      // by l_orderkey once; the per-(order, supplier) aggregation runs
      // shuffle-free on it (partitioning by a PREFIX of the grouping
      // keys satisfies the clustering requirement), and the per-order
      // supplier statistics are WINDOWS over the same partitioning —
      // no second aggregation, no join back (round 9; previously the
      // perSupp→perOrder→join shape cost two more pair-level shuffles).
      // A row of l1 qualifies iff its order has >1 supplier and exactly
      // one late supplier (which must be l1's own, since l1 is late),
      // so numwait is the sum of the qualifying groups' late-line
      // counts. At cluster scale the one explicit repartition is the
      // operation bucketing lineitem by orderkey would make free.
      import org.apache.spark.sql.expressions.Window
      val li = t(s, d, "lineitem")
      val o = t(s, d, "orders").filter(col("o_orderstatus") === "F")
      val w = Window.partitionBy(col("l_orderkey"))
      val perSupp = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .repartition(col("l_orderkey"))
        .groupBy(col("l_orderkey"), col("l_suppkey"))
        .agg(sum(when(col("l_shipdate") > col("o_orderdate"), 1L)
          .otherwise(0L)).as("late_lines"))
        .withColumn("nsupp", count(lit(1)).over(w))
        .withColumn("nlate",
          sum(when(col("late_lines") > 0, 1).otherwise(0)).over(w))
      perSupp.filter(col("late_lines") > 0 &&
          col("nsupp") > 1 && col("nlate") === 1)
        .join(t(s, d, "supplier"), col("s_suppkey") === col("l_suppkey"))
        .join(t(s, d, "nation").filter(col("n_name") === "NATION_5"),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy("s_name")
        .agg(sum(col("late_lines")).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(100)
    },

    // Q22 — global sales opportunity: positive-balance average as the
    // scalar gate (a broadcast single-row cross join), customers with no
    // URGENT orders via LEFT ANTI join (every synthetic customer has
    // SOME order, so the original no-orders gate returns zero rows — the
    // priority condition keeps the anti-join non-vacuous); country code
    // restates as nationkey % 7.
    QuerySpec.checked("h22_tpch_q22",
      """SELECT cntrycode, CAST(count(*) AS BIGINT) AS numcust,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE) AS totacctbal
        |FROM (SELECT CAST(c_nationkey % 7 AS INTEGER) AS cntrycode, c_acctbal
        |      FROM customer
        |      WHERE c_nationkey % 7 IN (0, 2, 4, 6)
        |        AND c_acctbal > (
        |          SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE)
        |                 / count(c_acctbal)
        |          FROM customer
        |          WHERE c_acctbal > 0.0 AND c_nationkey % 7 IN (0, 2, 4, 6))
        |        AND NOT EXISTS (SELECT 1 FROM orders
        |                        WHERE o_custkey = c_custkey
        |                          AND o_orderpriority = '1-URGENT')) custsale
        |GROUP BY cntrycode ORDER BY cntrycode""") { (s, d) =>
      val cust = t(s, d, "customer")
        .withColumn("cntrycode", (col("c_nationkey") % 7).cast("int"))
        .filter(col("cntrycode").isin(0, 2, 4, 6))
      val cut = cust.filter(col("c_acctbal") > 0.0)
        .agg(davg(col("c_acctbal")).as("__avgbal"))
      cust
        .join(cut, col("c_acctbal") > col("__avgbal"))
        .join(t(s, d, "orders").filter(col("o_orderpriority") === "1-URGENT"),
          col("o_custkey") === col("c_custkey"), "left_anti")
        .groupBy("cntrycode")
        .agg(count(lit(1)).as("numcust"), dsum(col("c_acctbal")).as("totacctbal"))
        .orderBy("cntrycode")
    },

    // partsupp generation gate: the MATERIALIZED parquet file's full
    // contents against DuckDB's independent re-derivation of the same
    // formulas from part × supplier — pins both the generator and the
    // file before any query builds on them. (ps_partkey, ps_suppkey) is
    // unique by construction (the 4 per-part rank offsets are distinct
    // mod S), so the ordering is total.
    QuerySpec.checked("ps1_partsupp_gen",
      PartSupp.oracleCte +
        """SELECT ps_partkey, ps_suppkey, ps_availqty, ps_supplycost
          |FROM partsupp ORDER BY ps_partkey, ps_suppkey""".stripMargin) { (s, d) =>
      PartSupp.table(s, d).orderBy("ps_partkey", "ps_suppkey")
    },

    // Q2 — minimum-cost supplier: the correlated per-part MIN over the
    // region's suppliers re-expressed as a grouped aggregate joined
    // back on (part, cost) — the scalable form. Cost equality is exact
    // (selection of an untouched 2-decimal double, no arithmetic).
    // p_mfgr/s_address/s_phone/s_comment don't exist in the corpus;
    // p_brand stands in for the manufacturer and ps_suppkey joins the
    // output to keep the order total.
    QuerySpec.checked("h02_tpch_q2",
      PartSupp.oracleCte +
        """, pse AS (
          |  SELECT ps_partkey, ps_suppkey, ps_supplycost, s_name, s_acctbal, n_name
          |  FROM partsupp, supplier, nation, region
          |  WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey
          |    AND n_regionkey = r_regionkey AND r_name = 'EUROPE')
          |SELECT s_acctbal, s_name, n_name, p_partkey, p_brand, ps_suppkey
          |FROM part, pse
          |WHERE p_partkey = ps_partkey AND p_size = 15 AND p_type = 'PROMO'
          |  AND ps_supplycost = (SELECT min(ps_supplycost) FROM pse p2
          |                       WHERE p2.ps_partkey = pse.ps_partkey)
          |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100""".stripMargin) { (s, d) =>
      val pse = PartSupp.table(s, d)
        .join(t(s, d, "supplier"), col("ps_suppkey") === col("s_suppkey"))
        .join(t(s, d, "nation"), col("s_nationkey") === col("n_nationkey"))
        .join(t(s, d, "region").filter(col("r_name") === "EUROPE"),
          col("n_regionkey") === col("r_regionkey"))
        .select("ps_partkey", "ps_suppkey", "ps_supplycost",
          "s_name", "s_acctbal", "n_name")
      val minCost = pse.groupBy(col("ps_partkey").as("mc_partkey"))
        .agg(min("ps_supplycost").as("mc_cost"))
      t(s, d, "part").filter(col("p_size") === 15 && col("p_type") === "PROMO")
        .join(pse, col("p_partkey") === col("ps_partkey"))
        .join(minCost, col("ps_partkey") === col("mc_partkey") &&
          col("ps_supplycost") === col("mc_cost"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_brand",
          "ps_suppkey")
        .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
          col("p_partkey"))
        .limit(100)
    },

    // Q11 — important stock: per-part value vs a scalar gate. TPC-H's
    // 0.0001/SF threshold hard-codes the scale factor; restated
    // SF-independently as 1.5× the mean per-part value (same plan
    // shape: grouped agg + broadcast single-row cross join). The gate
    // compares doubles produced by identical IEEE expressions on both
    // sides.
    QuerySpec.checked("h11_tpch_q11",
      PartSupp.oracleCte +
        """, ps_n AS (
          |  SELECT ps_partkey, ps_supplycost, ps_availqty
          |  FROM partsupp, supplier, nation
          |  WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey
          |    AND n_name = 'NATION_7')
          |SELECT ps_partkey,
          |  CAST(sum(CAST(ps_supplycost * ps_availqty AS DECIMAL(38,6))) AS DOUBLE) AS part_value
          |FROM ps_n GROUP BY ps_partkey
          |HAVING CAST(sum(CAST(ps_supplycost * ps_availqty AS DECIMAL(38,6))) AS DOUBLE) > (
          |  SELECT 1.5 * CAST(sum(CAST(ps_supplycost * ps_availqty AS DECIMAL(38,6))) AS DOUBLE)
          |         / count(DISTINCT ps_partkey) FROM ps_n)
          |ORDER BY part_value DESC, ps_partkey""".stripMargin) { (s, d) =>
      val psn = PartSupp.table(s, d)
        .join(t(s, d, "supplier"), col("ps_suppkey") === col("s_suppkey"))
        .join(t(s, d, "nation").filter(col("n_name") === "NATION_7"),
          col("s_nationkey") === col("n_nationkey"))
        .select("ps_partkey", "ps_supplycost", "ps_availqty")
      val grouped = psn.groupBy("ps_partkey")
        .agg(dsum(col("ps_supplycost") * col("ps_availqty")).as("part_value"))
      val cut = psn.agg((lit(1.5) *
        dsum(col("ps_supplycost") * col("ps_availqty")) /
        countDistinct(col("ps_partkey"))).as("__cut"))
      grouped.join(cut, col("part_value") > col("__cut"))
        .select("ps_partkey", "part_value")
        .orderBy(col("part_value").desc, col("ps_partkey"))
    },

    // Q16 — parts/supplier relationship: NOT IN over a non-null key →
    // LEFT ANTI join; count(DISTINCT supplier) per part attribute
    // triple. The original excludes comment-matching suppliers — the
    // corpus has no s_comment, so negative account balance stands in
    // (same shape: an uncorrelated exclusion subquery).
    QuerySpec.checked("h16_tpch_q16",
      PartSupp.oracleCte +
        """SELECT p_brand, p_type, p_size,
          |  CAST(count(DISTINCT ps_suppkey) AS BIGINT) AS supplier_cnt
          |FROM partsupp, part
          |WHERE p_partkey = ps_partkey
          |  AND p_brand <> 'Brand#5' AND p_type <> 'PROMO'
          |  AND p_size IN (1, 4, 9, 16, 25, 36, 49)
          |  AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
          |GROUP BY p_brand, p_type, p_size
          |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin) { (s, d) =>
      PartSupp.table(s, d)
        .join(t(s, d, "supplier").filter(col("s_acctbal") < 0.0)
          .select("s_suppkey"),
          col("ps_suppkey") === col("s_suppkey"), "left_anti")
        .join(t(s, d, "part").filter(col("p_brand") =!= "Brand#5" &&
          col("p_type") =!= "PROMO" &&
          col("p_size").isin(1, 4, 9, 16, 25, 36, 49)),
          col("p_partkey") === col("ps_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(countDistinct(col("ps_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
          col("p_size"))
    },

    // Q20 — potential part promotion: the nested IN chain re-expressed
    // as semi-joins, and the correlated half-of-shipped-quantity gate
    // as a grouped aggregate equi-joined on (part, supplier) — INNER,
    // matching the SQL semantics where an empty correlated sum yields
    // NULL and the comparison excludes the row. s_address doesn't
    // exist; s_suppkey makes the order total.
    QuerySpec.checked("h20_tpch_q20",
      PartSupp.oracleCte +
        """SELECT s_name, s_suppkey
          |FROM supplier, nation
          |WHERE s_suppkey IN (
          |    SELECT ps_suppkey FROM partsupp
          |    WHERE ps_partkey IN (SELECT p_partkey FROM part
          |                         WHERE p_name LIKE 'small%')
          |      AND ps_availqty > (
          |        SELECT 0.5 * CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE)
          |        FROM lineitem
          |        WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey
          |          AND l_shipdate >= TIMESTAMP '1997-01-01'
          |          AND l_shipdate < TIMESTAMP '1998-01-01'))
          |  AND s_nationkey = n_nationkey AND n_name = 'NATION_3'
          |ORDER BY s_name, s_suppkey""".stripMargin) { (s, d) =>
      val shipped = t(s, d, "lineitem")
        .filter(col("l_shipdate") >= ts("1997-01-01") &&
          col("l_shipdate") < ts("1998-01-01"))
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg((lit(0.5) * dsum(col("l_quantity"))).as("__half_qty"))
      val qualifying = PartSupp.table(s, d)
        .join(t(s, d, "part").filter(col("p_name").like("small%"))
          .select("p_partkey"),
          col("ps_partkey") === col("p_partkey"), "left_semi")
        .join(shipped, col("ps_partkey") === col("l_partkey") &&
          col("ps_suppkey") === col("l_suppkey"))
        .filter(col("ps_availqty") > col("__half_qty"))
        .select("ps_suppkey")
      t(s, d, "supplier")
        .join(qualifying, col("s_suppkey") === col("ps_suppkey"), "left_semi")
        .join(t(s, d, "nation").filter(col("n_name") === "NATION_3"),
          col("s_nationkey") === col("n_nationkey"))
        .select("s_name", "s_suppkey")
        .orderBy("s_name", "s_suppkey")
    }
  )
}
