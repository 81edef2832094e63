package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics and plan shape of the temporal joins. The planted fixture
  * covers the edge cases the fixed corpus can't guarantee to hit: a build
  * at the exact probe instant, ties on build time, probes with no match,
  * and window boundaries (build exactly windowSec before the probe is IN,
  * build at the probe instant is OUT). */
class TemporalJoinsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  //                        id,  key, time
  private def probes = Seq(
    (100L, 1L, ts(1000)), // after both builds of key 1
    (101L, 1L, ts(150)),  // between build 10 (t=100) and build 11 (t=200)
    (102L, 1L, ts(100)),  // exactly AT build 10 — at-or-before includes it
    (103L, 2L, ts(500)),  // key 2 has tied builds at t=400
    (104L, 3L, ts(500)),  // key 3 has no builds at all
    (105L, 2L, ts(300))   // before every key-2 build
  ).toDF("pid", "key", "t")

  private def builds = Seq(
    (10L, 1L, ts(100)),
    (11L, 1L, ts(200)),
    (20L, 2L, ts(400)), // tie on time with 21 — larger id must win
    (21L, 2L, ts(400))
  ).toDF("bid", "key", "t")

  test("asofJoin picks the latest at-or-before build, ties by id") {
    val got = TemporalJoins.asofJoin(probes, builds,
      probeKey = "key", probeTime = "t", buildKey = "key", buildTime = "t",
      payload = Seq("bid" -> "matched"), tieBreak = "bid",
      probeOut = Seq("pid"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(got == Map(100L -> 11L, 101L -> 10L, 102L -> 10L,
      103L -> 21L, 104L -> -1L, 105L -> -1L))
  }

  test("intervalCountJoin counts [t-w, t) exactly, zero for no match") {
    // window 300s: probe@1000 sees [700,1000) -> no key-1 build;
    // probe@150 sees [-150,150) -> build@100; probe@100 sees [-200,100)
    // -> nothing (the same-instant build is OUT of the half-open window);
    // probe@500 sees [200,500) -> both tied key-2 builds.
    val got = TemporalJoins.intervalCountJoin(probes, builds,
      probeKey = "key", probeTime = "t", buildKey = "key", buildTime = "t",
      windowSec = 300L, probeId = "pid", countName = "n")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(100L -> 0L, 101L -> 1L, 102L -> 0L,
      103L -> 2L, 104L -> 0L, 105L -> 0L))
  }

  test("window-boundary build exactly windowSec before the probe is IN") {
    val p = Seq((1L, 1L, ts(600))).toDF("pid", "key", "t")
    val b = Seq((5L, 1L, ts(300)), (6L, 1L, ts(299))).toDF("bid", "key", "t")
    val got = TemporalJoins.intervalCountJoin(p, b, "key", "t", "key", "t",
      windowSec = 300L, probeId = "pid", countName = "n").collect()
    assert(got.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 1L)))
  }

  test("neither operator plans a nested-loop or cartesian join") {
    val asof = TemporalJoins.asofJoin(probes, builds, "key", "t", "key", "t",
      Seq("bid" -> "matched"), "bid", Seq("pid"))
    val ivl = TemporalJoins.intervalCountJoin(probes, builds,
      "key", "t", "key", "t", 300L, "pid", "n")
    for (df <- Seq(asof, ivl)) {
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
      assert(!plan.contains("CartesianProduct"), plan)
    }
    // the as-of is join-free by construction: one shuffle, one window
    assert(!asof.queryExecution.executedPlan.toString.contains("Join"))
    // so is the gap-fill resample (union + window — never a
    // tick×observation join, which is what makes it scale)
    val rs = TemporalJoins.resampleForwardFill(
      probes.select($"key".as("user_id"), $"t".as("ts"),
        $"pid".cast("double").as("value")))
    assert(!rs.queryExecution.executedPlan.toString.contains("Join"))
  }

  test("SQL null semantics: null keys/times never match, probes survive") {
    val noTime: Option[java.sql.Timestamp] = None
    val p = Seq(
      (1L, Some(1L), Some(ts(500))),
      (2L, None: Option[Long], Some(ts(500))), // null key
      (3L, Some(1L), noTime)                   // null time
    ).toDF("pid", "key", "t")
    val b = Seq(
      (10L, Some(1L), Some(ts(400))),
      (11L, None: Option[Long], Some(ts(400))), // null key matches nothing
      (12L, Some(1L), noTime)                   // null time matches nothing
    ).toDF("bid", "key", "t")

    val asof = TemporalJoins.asofJoin(p, b, "key", "t", "key", "t",
      Seq("bid" -> "matched"), "bid", Seq("pid"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(asof == Map(1L -> 10L, 2L -> -1L, 3L -> -1L))

    val ivl = TemporalJoins.intervalCountJoin(p, b, "key", "t", "key", "t",
      windowSec = 300L, probeId = "pid", countName = "n")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ivl == Map(1L -> 1L, 2L -> 0L, 3L -> 0L))
  }

  test("fuzz: random data with dense ties matches the brute-force joins") {
    // Tiny key/time domains force the edge cases on purpose: same-instant
    // probe/build pairs, tied build times, empty keys, and window
    // boundaries landing exactly on bucket edges.
    val rnd = new scala.util.Random(4242)
    val p = Seq.tabulate(300)(i =>
      (i.toLong, rnd.nextInt(8).toLong, ts(rnd.nextInt(50) * 100L)))
      .toDF("pid", "key", "t")
    val b = Seq.tabulate(300)(i =>
      (i.toLong, rnd.nextInt(8).toLong, ts(rnd.nextInt(50) * 100L)))
      .toDF("bid", "key", "t")

    val asofGot = TemporalJoins.asofJoin(p, b, "key", "t", "key", "t",
      Seq("bid" -> "matched"), "bid", Seq("pid"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    val wRn = org.apache.spark.sql.expressions.Window
      .partitionBy($"pid").orderBy($"bt".desc, $"bid".desc)
    val asofWant = p.join(
      b.select($"bid", $"key".as("bk"), $"t".as("bt")),
      $"bk" === $"key" && $"bt" <= $"t", "left")
      .withColumn("rn", row_number().over(wRn)).where($"rn" === 1)
      .collect().map(r => r.getAs[Long]("pid") ->
        (if (r.isNullAt(r.fieldIndex("bid"))) -1L
         else r.getAs[Long]("bid"))).toMap
    assert(asofGot == asofWant)

    val w = 700L // deliberately NOT aligned with the 100 s time grid
    val ivlGot = TemporalJoins.intervalCountJoin(p, b, "key", "t", "key",
      "t", windowSec = w, probeId = "pid", countName = "n")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ivlWant = p.join(
      b.select($"bid", $"key".as("bk"), $"t".as("bt")),
      $"bk" === $"key" &&
        $"bt" >= $"t" - expr(s"INTERVAL $w SECOND") && $"bt" < $"t", "left")
      .groupBy($"pid").agg(count($"bid").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ivlGot == ivlWant)
  }

  test("resampleForwardFill: lattice, fill, leading nulls, tick-on-event") {
    // key 1: events at 00:30 (v=1), 07:15 (v=2) → lattice from
    //   trunc(00:30) = 00:00 stepping 6h, capped at t1 = 07:15 →
    //   ticks {00:00, 06:00}; 00:00 precedes the first observation
    //   (null), 06:00 fills from 00:30 (1.0)
    // key 2: one event exactly on its own truncation point → tick AT
    //   the event carries its value (observation sorts before tick)
    def t(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    val ev = Seq(
      (1L, t(0, 30), 1.0), (1L, t(7, 15), 2.0),
      (2L, t(6, 0), 9.0),
      (2L, t(6, 0), 4.0) // same-instant duplicate → max collapses to 9.0
    ).toDF("user_id", "ts", "value")
    val got = TemporalJoins.resampleForwardFill(ev, every = "6 hours",
      truncUnit = "hour")
      .orderBy("user_id", "tick").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1),
        if (r.isNullAt(2)) null else r.getDouble(2)))
    assert(got.toSeq == Seq(
      (1L, t(0, 0), null), // lattice starts before the first observation
      (1L, t(6, 0), 1.0),
      (2L, t(6, 0), 9.0))) // tick exactly on the (collapsed) observation
  }

  test("resampleForwardFill: a NULL observation resets the fill to NULL") {
    // ASOF semantics (the j14 oracle's): the tick carries the most
    // recent OBSERVATION, so a genuinely-NULL value must surface as
    // NULL — not be skipped in favor of the prior non-null value.
    def t(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    val ev = Seq(
      (3L, t(0, 30), Some(1.0)),
      (3L, t(5, 0), None: Option[Double]), // most recent at tick 06:00
      (3L, t(11, 0), Some(3.0))
    ).toDF("user_id", "ts", "value")
    val got = TemporalJoins.resampleForwardFill(ev, every = "6 hours",
      truncUnit = "hour")
      .orderBy("user_id", "tick").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1),
        if (r.isNullAt(2)) null else r.getDouble(2)))
    assert(got.toSeq == Seq(
      (3L, t(0, 0), null),  // before the first observation
      (3L, t(6, 0), null))) // 05:00's NULL observation, NOT 00:30's 1.0
  }

  test("corpus query j14 matches a brute-force per-tick lookup") {
    val dir = "/root/testdata/sf0.001"
    val ev = graft.Tables.table(spark, dir, "events")
      .where(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts")).agg(max(col("value")).as("value"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getDouble(2)))
      .groupBy(_._1)
    val got = TemporalJoins.resampleForwardFill(
      graft.Tables.table(spark, dir, "events")
        .where(col("event_type") === "purchase"), every = "6 hours")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1),
        if (r.isNullAt(2)) null else r.getDouble(2)))
    assert(got.nonEmpty)
    got.foreach { case (u, tick, v) =>
      val atOrBefore = ev(u).filter(!_._2.after(tick))
      val want =
        if (atOrBefore.isEmpty) null
        else atOrBefore.maxBy(_._2.getTime)._3
      assert(v == want, s"user $u tick $tick: got $v want $want")
    }
  }

  test("corpus query j12 matches the brute-force inequality join") {
    val d = TestSpark.sf
    val fast = graft.SparkEntry.queries("j12_asof_join")(spark, d).collect()
    val ev = graft.Tables.table(spark, d, "events")
    val a = ev.where($"event_type" === "click").select(
      $"event_id".as("a_id"), $"user_id".as("a_user"), $"ts".as("a_ts"))
    val b = ev.where($"event_type" === "view").select(
      $"event_id".as("b_id"), $"user_id".as("b_user"), $"ts".as("b_ts"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"a_id").orderBy($"b_ts".desc, $"b_id".desc)
    val slow = a.join(b, $"b_user" === $"a_user" && $"b_ts" <= $"a_ts", "left")
      .withColumn("rn", row_number().over(w)).where($"rn" === 1)
      .select($"a_id", $"a_user", $"b_id").orderBy($"a_id").collect()
    assert(fast.length == slow.length)
    fast.zip(slow).foreach { case (f, s) =>
      assert(f.getLong(0) == s.getLong(0))
      assert(f.getLong(1) == s.getLong(1))
      assert(f.isNullAt(2) == s.isNullAt(2))
      if (!f.isNullAt(2)) assert(f.getLong(2) == s.getLong(2))
    }
  }
}
