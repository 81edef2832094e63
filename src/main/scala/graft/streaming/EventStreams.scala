package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming surface over the `events` table shape
  * (event_id, ts, user_id, event_type, value, props). The reference has
  * no streaming (SURVEY §2.11); this is the engine-extension scope built
  * on watermarks + windowed aggregation + arbitrary stateful ops. Every
  * transform also works on a batch DataFrame of the same schema — the
  * batch forms are what the DuckDB oracle checks (ev1/ev2 in
  * PipelineOps); these wrappers add the streaming-only pieces
  * (watermark, output mode, state timeouts).
  */
object EventStreams {

  /** events schema with `ts` as stored on disk — corpora have carried
    * int64 NANOS (Spark reads it as Long under nanosAsLong), µs
    * TIMESTAMP, and µs TIMESTAMP_NTZ across driver generations, so the
    * stream schema mirrors whatever the parquet footer declares. */
  def rawSchema(tsType: DataType): StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", tsType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** File-based event stream. Accepts a directory of event parquet files
    * or a single file (streamed via a glob on its parent — readStream
    * only takes directories). The on-disk `ts` encoding is probed from
    * the footer with a batch read and normalized to a session-TZ
    * timestamp exactly like the batch reader (QuerySpec.Tables.table),
    * so every streaming transform sees the same event times the batch
    * forms (and the DuckDB oracle) see. */
  def eventStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val f = new java.io.File(dir)
    // an empty source directory (producers arrive later — the normal
    // file-stream bootstrap) has no footer to probe; assume the current
    // corpus encoding (µs TIMESTAMP) rather than failing construction.
    // ONLY the cannot-infer-schema case falls back — a corrupt footer
    // or permission error must surface here, not resurface mid-stream
    // as a misdecoded batch.
    val tsType =
      try spark.read.parquet(dir).schema("ts").dataType
      catch { case _: org.apache.spark.sql.AnalysisException => TimestampType }
    val reader = spark.readStream.schema(rawSchema(tsType))
    val src =
      if (f.isFile) reader.option("pathGlobFilter", f.getName).parquet(f.getParent)
      else reader.parquet(dir)
    tsType match {
      // int64 nanos: integer `div` (not `/`) stays exact above 2^53
      case LongType => src.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      // µs without a timezone: identity under the UTC session, retyped
      case TimestampNTZType => src.withColumn("ts", col("ts").cast(TimestampType))
      case _ => src
    }
  }

  /** Tumbling-window counts/sums per event type with a watermark —
    * late data beyond `lateness` is dropped deterministically. */
  def tumblingAgg(events: DataFrame, window_ : String = "1 hour",
      lateness: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("ws"), col("event_type"), col("cnt"), col("sum_value"))

  /** Sliding-window rates (1h window, 15m slide). */
  def slidingAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour", "15 minutes"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("ws"), col("cnt"))

  /** Streaming exact dedup: drop events whose `idCols` were already
    * seen, with state bounded by the watermark — the streaming form of
    * the corpus exact-dedup (Dedup.dropExactDuplicates). State size is
    * O(events inside the lateness horizon), not O(stream history), so
    * it runs forever at any rate. */
  def dedupEvents(events: DataFrame, lateness: String = "2 hours",
      idCols: Seq[String] = Seq("event_id")): DataFrame =
    events
      .withWatermark("ts", lateness)
      .dropDuplicatesWithinWatermark(idCols)

  /** Session windows per user with a 30-minute gap. */
  def sessionAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("session_value"))
      .select(col("session_window.start").as("ws"),
        col("session_window.end").as("we"), col("user_id"),
        col("n_events"), col("session_value"))

  /** Stream ingest into a graftkv table (the reference's real-time put
    * path, S9, fed from a stream): each micro-batch appends through the
    * connector's ordered write, so every batch lands as sorted,
    * disjoint segments and is immediately queryable with full pruning.
    * Appends across batches may overlap in key space — the scan falls
    * back to UnknownPartitioning until `KvCommands.compact` restores
    * disjointness (same contract as batch appends). */
  def streamIntoKv(events: DataFrame, kvPath: String, keys: Seq[String],
      checkpoint: String,
      autoCompactDepth: Int = 0,
      maintainDerived: Boolean = false): org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.write.format("graftkv")
          .option("key", keys.mkString(","))
          .mode("append")
          .save(kvPath)
        // depth check is metadata-only (cheap per batch); the rewrite,
        // when it fires, touches only the overlapping segment groups
        if (autoCompactDepth > 0) {
          graft.connector.KvCommands.autoCompact(batch.sparkSession, kvPath,
            autoCompactDepth)
          ()
        }
        // the dashboard pipeline: each ingested micro-batch re-
        // watermarks the table's secondary indexes and materialized
        // views via their CDC-incremental refresh — cost scales with
        // the batch's delta, never the table, so derived state stays
        // query-fresh at ingest rate (failures degrade to staleness:
        // an unrefreshed index/view is simply invisible to the
        // rewrites until the next successful refresh)
        if (maintainDerived) {
          val s = batch.sparkSession
          // degrade-to-staleness must stay OBSERVABLE: a permanently
          // failing refresh otherwise serves an ever-staler fallback
          // with no trace of why the rewrites stopped firing
          def logged(kind: String, name: String)(body: => Unit): Unit =
            try body catch {
              case scala.util.control.NonFatal(e) =>
                org.slf4j.LoggerFactory.getLogger(getClass).warn(
                  s"maintainDerived: $kind '$name' on $kvPath failed to " +
                    s"refresh (stays stale until the next success): $e")
            }
          graft.connector.KvIndex.list(kvPath).foreach { d =>
            logged("index", d.name)(
              graft.connector.KvIndex.refresh(s, kvPath, d.name))
          }
          graft.connector.KvMatView.list(kvPath).foreach { d =>
            logged("materialized view", d.name)(
              graft.connector.KvMatView.refresh(s, kvPath, d.name))
          }
        }
      }
      .start()

  /** Stream-stream event-time interval join: pairs each left event with
    * the right-side events of the same user from the preceding
    * `windowSec` (half-open — the left instant itself excluded). The
    * explicit time-range condition is what lets Spark EXPIRE join state
    * as the watermark advances: state stays O(events inside window +
    * lateness), not O(stream history), so the join runs forever at any
    * rate. Inner-join matches emit as they arrive (no watermark hold).
    * The batch form of the same semantics is
    * [[graft.operators.TemporalJoins.intervalCountJoin]] — the spec
    * asserts the two agree pair-for-pair. */
  def intervalJoin(left: DataFrame, right: DataFrame,
      windowSec: Long = 3600L, lateness: String = "2 hours"): DataFrame = {
    val l = left.withWatermark("ts", lateness).select(
      col("event_id").as("l_id"), col("user_id").as("l_user"),
      col("ts").as("l_ts"))
    val r = right.withWatermark("ts", lateness).select(
      col("event_id").as("r_id"), col("user_id").as("r_user"),
      col("ts").as("r_ts"))
    l.join(r, expr(s"""r_user = l_user
      AND r_ts >= l_ts - INTERVAL $windowSec SECOND
      AND r_ts < l_ts"""))
  }

  final case class GapObs(user_id: Long, ts: java.sql.Timestamp, value: Double)
  final case class GapTick(user_id: Long, tick: java.sql.Timestamp,
      value: Option[Double])
  /** Per-key gap-fill state: the lattice origin, the next tick to
    * finalize, the fill value carried across ticks, the key's max
    * observed event time (the lattice cap, matching the batch
    * operator's per-key [t0, t1]), and the not-yet-finalized
    * observations. Buffer size is bounded by the key's events inside
    * the watermark horizon — never stream history. */
  private[streaming] final case class GapFillState(originMicros: Long,
      nextTickMicros: Long, lastValue: Option[Double],
      maxSeenMicros: Long, buffer: List[(Long, Double)])

  /** STREAMING gap-fill — the streaming form of
    * [[graft.operators.TemporalJoins.resampleForwardFill]]: one row per
    * `everySeconds` tick on each key's own [trunc(first ts, hour),
    * max ts] lattice, carrying the most recent observation
    * at-or-before the tick (None before the first). A tick emits only
    * once the WATERMARK passes it — every on-time observation ≤ the
    * tick has then arrived, so the fill is final (Append output; late
    * data beyond `lateness` is dropped, the standard watermark
    * contract). Event-time timeouts advance quiet keys: a key with no
    * new events still emits its remaining ticks as the global
    * watermark sweeps past them. State per key is O(1) fields + the
    * in-horizon observation buffer, so the operator runs forever at
    * any rate; EventStreamsSpec pins streaming ≡ batch over the
    * finalized prefix. */
  def resampleStream(events: Dataset[GapObs], everySeconds: Long = 21600L,
      lateness: String = "2 hours"): Dataset[GapTick] = {
    import events.sparkSession.implicits._
    val step = everySeconds * 1000000L
    def micros(t: java.sql.Timestamp): Long =
      t.getTime * 1000L + (t.getNanos / 1000) % 1000L
    def truncHour(m: Long): Long = m - math.floorMod(m, 3600000000L)
    def toTs(m: Long): java.sql.Timestamp = {
      val t = new java.sql.Timestamp(math.floorDiv(m, 1000L))
      t.setNanos((math.floorMod(m, 1000000L) * 1000L).toInt)
      t
    }
    events
      .withWatermark("ts", lateness)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[GapFillState, GapTick](OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, batch: Iterator[GapObs], state: GroupState[GapFillState]) =>
          val obs = batch.map(e => micros(e.ts) -> e.value).toList
          var st = state.getOption.getOrElse(
            GapFillState(0L, Long.MinValue, None, Long.MinValue, Nil))
          if (obs.nonEmpty) {
            val mn = obs.iterator.map(_._1).min
            val mx = obs.iterator.map(_._1).max
            if (st.maxSeenMicros == Long.MinValue) {
              val o = truncHour(mn)
              st = GapFillState(o, o, None, mx, obs)
            } else {
              // the origin may still move DOWN while nothing finalized
              // (an earlier on-time observation arrived out of order);
              // once a tick emitted, anything before it is late data
              var o = st.originMicros
              var nt = st.nextTickMicros
              if (nt == o && truncHour(mn) < o) { o = truncHour(mn); nt = o }
              st = st.copy(originMicros = o, nextTickMicros = nt,
                maxSeenMicros = math.max(st.maxSeenMicros, mx),
                buffer = st.buffer ++ obs)
            }
          }
          val out = scala.collection.mutable.ArrayBuffer.empty[GapTick]
          if (st.maxSeenMicros != Long.MinValue) {
            val wm = state.getCurrentWatermarkMs() * 1000L
            // same-instant observations collapse to max (the batch
            // operator's determinism rule); sort once per invocation
            var buf = st.buffer.groupBy(_._1)
              .map { case (t, vs) => t -> vs.iterator.map(_._2).max }
              .toList.sortBy(_._1)
            var nt = st.nextTickMicros
            var lastV = st.lastValue
            // STRICTLY-passed ticks only: an on-time observation with
            // ts == nt is not droppable while nt == wm (the watermark
            // admits ts >= wm), so emitting that tick now could miss an
            // observation a later batch still delivers
            while (nt < wm && nt <= st.maxSeenMicros) {
              val (ready, rest) = buf.partition(_._1 <= nt)
              if (ready.nonEmpty) lastV = Some(ready.last._2)
              buf = rest
              out += GapTick(user, toTs(nt), lastV)
              nt += step
            }
            st = st.copy(nextTickMicros = nt, lastValue = lastV, buffer = buf)
            state.update(st)
            // wake this key when the watermark passes its next tick,
            // even if no further events arrive for it
            if (nt <= st.maxSeenMicros)
              state.setTimeoutTimestamp(math.floorDiv(nt, 1000L))
          } else state.update(st)
          out.iterator
      }
  }

  final case class UserEvent(user_id: Long, event_type: String, value: Double)
  final case class UserRunning(user_id: Long, n_events: Long, total_value: Double)

  /** Arbitrary stateful processing: running per-user totals via
    * flatMapGroupsWithState (the custom-state path the built-in windows
    * can't express). */
  def runningUserTotals(events: Dataset[UserEvent]): Dataset[UserRunning] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[UserRunning, UserRunning](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (user: Long, batch: Iterator[UserEvent], state: GroupState[UserRunning]) =>
          val prev = state.getOption.getOrElse(UserRunning(user, 0L, 0.0))
          var n = prev.n_events; var tot = prev.total_value
          batch.foreach { e => n += 1; tot += e.value }
          val next = UserRunning(user, n, tot)
          state.update(next)
          Iterator.single(next)
      }
  }
}
