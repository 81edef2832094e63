package graft.operators

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins — as-of and interval (range) joins, operators neither
  * stock Spark nor the inherited SQL surface has as primitives (the
  * reference engine, Huawei-Spark/Spark-SQL-on-HBase, stops at equi/theta
  * joins: HBaseSQLQuerySuite.scala join coverage). Naively both are
  * inequality joins, which Spark plans as BroadcastNestedLoopJoin — an
  * O(|probe|·|build|) per-key cartesian that dies long before 100 TB.
  * Each operator here is re-expressed so the heavy lifting is ONE hash
  * shuffle and the per-row work is constant:
  *
  *  - [[asofJoin]]: union probe+build rows on a (key, time) axis and let a
  *    single window pass carry the most recent build payload forward —
  *    linear in |probe|+|build|, no pairwise expansion at all;
  *  - [[intervalCountJoin]]: fixed-width time buckets turn the interval
  *    predicate into an equi-join with exactly two candidate buckets per
  *    probe row, then an exact residual filter — pairwise work is bounded
  *    by matches actually inside the window, never the cross product.
  */
object TemporalJoins {

  /** As-of join: for each probe row, the payload of the most recent build
    * row with the same key and `buildTime <= probeTime` (same-instant
    * builds count as "before"; ties on buildTime resolve toward the
    * larger `tieBreak`, making the result deterministic). Probes with no
    * qualifying build get null payload columns — left-join semantics,
    * including over NULLs: a null key or time on either side never
    * matches, exactly as SQL join equality/inequality would decide.
    *
    * Shape: both inputs are tagged and unioned, then one window per key
    * ordered by (time, side, tieBreak) runs `last(payload) IGNORE NULLS`
    * over a growing frame — Spark evaluates that incrementally, so the
    * cost is one shuffle on the key plus a per-partition sort. At cluster
    * scale the shuffle is keyed by user/entity id (high cardinality), and
    * no operator ever materializes a probe×build pair.
    *
    * @param payload build columns to attach, as (buildCol -> outputName) —
    *                renaming at the source keeps self-joins unambiguous.
    * @param probeOut probe columns to carry into the result.
    */
  def asofJoin(
      probe: DataFrame, build: DataFrame,
      probeKey: String, probeTime: String,
      buildKey: String, buildTime: String,
      payload: Seq[(String, String)], tieBreak: String,
      probeOut: Seq[String]): DataFrame = {
    val payloadStruct = struct(payload.map { case (src, _) => build(src) }: _*)
    val payloadType = build.select(payloadStruct).schema.head.dataType
    val tbType = build.schema(tieBreak).dataType
    val probeFields = probeOut.map(c => probe.schema(c))

    // SQL join equality never matches NULL: a null-key build can match
    // nothing (dropped), a null-key probe keeps null payload (it lands in
    // the null window partition, which now holds no builds).
    val buildSide = build
      .where(build(buildKey).isNotNull && build(buildTime).isNotNull)
      .select(
      Seq(build(buildKey).as("__k"), build(buildTime).as("__t"),
        lit(0).as("__side"), build(tieBreak).as("__tb"),
        payloadStruct.as("__p")) ++
        probeFields.map(f => lit(null).cast(f.dataType).as(f.name)): _*)
    val probeSide = probe.select(
      Seq(probe(probeKey).as("__k"), probe(probeTime).as("__t"),
        lit(1).as("__side"), lit(null).cast(tbType).as("__tb"),
        lit(null).cast(payloadType).as("__p")) ++
        probeOut.map(probe(_)): _*)

    // Build rows sort before probe rows at an equal timestamp (__side
    // 0 < 1) so "at-or-before" includes same-instant builds; among equal
    // (time, side) the unique tieBreak makes the row order — and hence
    // last() — deterministic.
    val w = Window.partitionBy("__k")
      .orderBy(col("__t").asc, col("__side").asc, col("__tb").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    buildSide.unionByName(probeSide)
      .withColumn("__last", last(col("__p"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select(probeOut.map(col) ++
        // getField resolves by exact name (a dotted source column would
        // misparse through the string path)
        payload.map { case (src, out) => col("__last").getField(src).as(out) }: _*)
  }

  /** Interval-count join: for each probe row, how many build rows share
    * its key and fall in `[probeTime - windowSec, probeTime)`. Probes with
    * no qualifying build count 0 — left-join semantics.
    *
    * The window width doubles as the bucket width: a build row lands in
    * exactly one bucket, a probe row qualifies builds from exactly two
    * consecutive buckets, so the equi-join on (key, bucket) expands each
    * probe row 2× — constant, independent of data volume — and the exact
    * interval is enforced as a residual on the joined pairs. All time
    * arithmetic is integer microseconds (`div`, not double division:
    * epoch-micros exceed a double's exact-integer range).
    *
    * @param probeId unique probe column the counts are keyed by.
    */
  def intervalCountJoin(
      probe: DataFrame, build: DataFrame,
      probeKey: String, probeTime: String,
      buildKey: String, buildTime: String,
      windowSec: Long, probeId: String, countName: String): DataFrame = {
    require(windowSec > 0, s"windowSec must be positive, got $windowSec")
    val w = windowSec * 1000000L // bucket width in microseconds
    val buildSide = build.select(
      build(buildKey).as("__k"), unix_micros(build(buildTime)).as("__bt"))
      .withColumn("__bbucket", expr(s"__bt div ${w}L"))
    // explode_outer: a null-time probe keeps its row (null bucket joins
    // nothing) and still reports count 0 — left-join semantics
    val probeSide = probe.select(col(probeId), col(probeKey).as("__pk"),
      unix_micros(col(probeTime)).as("__pt"))
      .withColumn("__bucket",
        explode_outer(sequence(expr(s"(__pt - ${w}L) div ${w}L"),
          expr(s"__pt div ${w}L"))))

    probeSide.join(buildSide,
      probeSide("__bucket") === buildSide("__bbucket") &&
        probeSide("__pk") === buildSide("__k") &&
        buildSide("__bt") >= probeSide("__pt") - lit(w) &&
        buildSide("__bt") < probeSide("__pt"),
      "left")
      .groupBy(col(probeId))
      .agg(count(col("__bt")).as(countName))
  }

  /** Time-series resample with forward fill (gap-fill): one row per
    * `every` tick on each key's own [trunc(min ts), max ts] lattice,
    * carrying the value of the key's most recent observation at-or-
    * before the tick (NULL before the first observation — the lattice
    * starts at the truncated minimum, which can precede it).
    *
    * Shape: per-key bounds (one agg), `sequence`-exploded ticks, then
    * the as-of union trick — observations and ticks union into one
    * stream, a per-key window runs `last(value) IGNORE NULLS` over a
    * growing frame, and ticks keep the fill. One shuffle on the key,
    * no tick×observation join ever materializes, and tick counts are
    * bounded by each key's own time span — the operator distributes by
    * key at any corpus size. Same-instant observations are collapsed
    * (max) first so the fill is deterministic. */
  def resampleForwardFill(events: DataFrame, every: String = "1 hour",
      truncUnit: String = "hour", keyCol: String = "user_id",
      tsCol: String = "ts", valCol: String = "value"): DataFrame = {
    val ev = events
      .where(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .groupBy(col(keyCol), col(tsCol))
      .agg(max(col(valCol)).as(valCol))
    val ticks = ev.groupBy(col(keyCol))
      .agg(date_trunc(truncUnit, min(col(tsCol))).as("__t0"),
        max(col(tsCol)).as("__t1"))
      .select(col(keyCol),
        explode(sequence(col("__t0"), col("__t1"),
          expr(s"INTERVAL $every"))).as("__tick"))
    // observations sort before ticks at an equal instant (__side 0 < 1):
    // a tick exactly on an observation carries that observation's value.
    // The value rides in a STRUCT (non-null for every observation row,
    // null for tick rows) so `last IGNORE NULLS` tracks the most recent
    // OBSERVATION, not the most recent non-null value — a genuinely-NULL
    // observation resets the fill to NULL, exactly as the ASOF-join
    // restatement (the oracle) yields NULL for that tick.
    val tagged = ev.select(col(keyCol), col(tsCol).as("__t"),
        struct(col(valCol).cast("double").as("v")).as("__o"), lit(0).as("__side"))
      .unionByName(ticks.select(col(keyCol), col("__tick").as("__t"),
        lit(null).cast("struct<v:double>").as("__o"), lit(1).as("__side")))
    val w = Window.partitionBy(keyCol)
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("__ff", last(col("__o"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select(col(keyCol), col("__t").as("tick"),
        col("__ff").getField("v").as(valCol))
  }

  // ── declared queries ──────────────────────────────────────────────────

  private def events(s: SparkSession, dir: String, kind: String): DataFrame =
    Tables.table(s, dir, "events").where(col("event_type") === kind)

  val specs: Seq[QuerySpec] = Seq(

    // For each click, the most recent view by the same user at-or-before
    // the click. The oracle states the same semantics as the inequality
    // join Spark must never be allowed to plan (rn=1 over ts DESC).
    QuerySpec.checked("j12_asof_join",
      """SELECT event_id, user_id, prior_view_id FROM (
        |  SELECT a.event_id, a.user_id, b.event_id AS prior_view_id,
        |         row_number() OVER (PARTITION BY a.event_id
        |                            ORDER BY b.ts DESC, b.event_id DESC) AS rn
        |  FROM events a LEFT JOIN events b
        |    ON b.user_id = a.user_id AND b.event_type = 'view'
        |   AND b.ts <= a.ts
        |  WHERE a.event_type = 'click'
        |) WHERE rn = 1 ORDER BY event_id""") { (s, d) =>
      asofJoin(
        probe = events(s, d, "click"), build = events(s, d, "view"),
        probeKey = "user_id", probeTime = "ts",
        buildKey = "user_id", buildTime = "ts",
        payload = Seq("event_id" -> "prior_view_id"), tieBreak = "event_id",
        probeOut = Seq("event_id", "user_id"))
        .orderBy("event_id")
    },

    // For each click, how many views the same user made in the hour
    // before it (exclusive of the click instant).
    QuerySpec.checked("j13_range_join",
      """SELECT a.event_id, count(b.event_id) AS n_prior_views
        |FROM events a LEFT JOIN events b
        |  ON b.user_id = a.user_id AND b.event_type = 'view'
        | AND b.ts >= a.ts - INTERVAL 1 HOUR AND b.ts < a.ts
        |WHERE a.event_type = 'click'
        |GROUP BY a.event_id ORDER BY a.event_id""") { (s, d) =>
      intervalCountJoin(
        probe = events(s, d, "click"), build = events(s, d, "view"),
        probeKey = "user_id", probeTime = "ts",
        buildKey = "user_id", buildTime = "ts",
        windowSec = 3600L, probeId = "event_id", countName = "n_prior_views")
        .orderBy("event_id")
    },

    // Time-series resample + forward fill on each user's purchase
    // stream (6-hour lattice from the truncated first observation).
    // The oracle restates the same semantics with generate_series +
    // ASOF LEFT JOIN; the filled value is an exact stored double (no
    // arithmetic), so it hash-matches. Same-instant observations
    // collapse to max() on BOTH sides before filling.
    QuerySpec.checked("j14_resample_gapfill",
      """WITH e AS (
        |  SELECT user_id, ts, max(value) AS value FROM events
        |  WHERE event_type = 'purchase' GROUP BY 1, 2
        |),
        |b AS (
        |  SELECT user_id, date_trunc('hour', min(ts)) AS t0, max(ts) AS t1
        |  FROM e GROUP BY 1
        |),
        |ticks AS (
        |  SELECT user_id, unnest(generate_series(t0, t1, INTERVAL 6 HOUR)) AS tick
        |  FROM b
        |)
        |SELECT t.user_id, t.tick, e.value
        |FROM ticks t ASOF LEFT JOIN e
        |  ON t.user_id = e.user_id AND t.tick >= e.ts
        |ORDER BY t.user_id, t.tick""") { (s, d) =>
      resampleForwardFill(events(s, d, "purchase"), every = "6 hours",
        truncUnit = "hour")
        .orderBy("user_id", "tick")
    }
  )
}
