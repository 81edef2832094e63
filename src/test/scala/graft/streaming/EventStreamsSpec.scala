package graft.streaming

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Drives the streaming surface end-to-end with the memory sink: a batch
  * of events parquet flows through readStream → watermark → windowed agg
  * → memory table, and the result must equal the same aggregation run in
  * batch mode. */
class EventStreamsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def runToMemory(df: org.apache.spark.sql.DataFrame, name: String,
      mode: String = "append"): org.apache.spark.sql.DataFrame = {
    val q = df.writeStream.outputMode(mode).format("memory").queryName(name)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    spark.table(name)
  }

  // update mode: with the corpus arriving as one micro-batch, every
  // window is emitted with its final value, so streaming == batch exactly
  // (append mode would hold windows back until the watermark passes them)
  test("streaming tumbling agg equals batch tumbling agg") {
    val stream = EventStreams.eventStream(spark, s"${TestSpark.sf}/events.parquet")
    val got = runToMemory(EventStreams.tumblingAgg(stream), "t_tumbling", "update")
      .collect().map(_.toSeq).toSet
    val batch = EventStreams.tumblingAgg(Tables.table(spark, TestSpark.sf, "events"))
      .collect().map(_.toSeq).toSet
    assert(got.nonEmpty)
    assert(got == batch)
  }

  test("streaming sliding agg equals batch sliding agg") {
    val stream = EventStreams.eventStream(spark, s"${TestSpark.sf}/events.parquet")
    val got = runToMemory(EventStreams.slidingAgg(stream), "t_sliding", "update")
      .collect().map(_.toSeq).toSet
    val batch = EventStreams.slidingAgg(Tables.table(spark, TestSpark.sf, "events"))
      .collect().map(_.toSeq).toSet
    assert(got.nonEmpty)
    assert(got == batch)
  }

  test("session windows produce per-user sessions") {
    // session windows only support append mode; the trailing no-data
    // micro-batch advances the watermark and flushes finalized sessions
    val stream = EventStreams.eventStream(spark, s"${TestSpark.sf}/events.parquet")
    val got = runToMemory(EventStreams.sessionAgg(stream), "t_sessions", "append")
    assert(got.count() > 0)
    assert(got.filter(col("we") <= col("ws")).count() == 0)
  }

  test("stream ingest lands in a graftkv table, queryable with pruning") {
    val stream = EventStreams.eventStream(spark, s"${TestSpark.sf}/events.parquet")
    val dir = java.nio.file.Files.createTempDirectory("kv_stream")
    val kvPath = s"$dir/events_kv"
    val q = EventStreams.streamIntoKv(
      stream.select("event_id", "ts", "user_id", "event_type", "value"),
      kvPath, Seq("user_id", "event_id"), s"$dir/ckpt")
    q.processAllAvailable()
    q.stop()
    val back = graft.connector.KvCommands.table(spark, kvPath)
    val expected = Tables.table(spark, TestSpark.sf, "events").count()
    assert(back.count() == expected)
    // point filter on the ingested table goes through the pruned kv scan
    val one = back.filter(col("user_id") === 7L)
    assert(one.count() ==
      Tables.table(spark, TestSpark.sf, "events").filter(col("user_id") === 7L).count())
  }

  test("streaming dedup drops replayed events, state bounded by watermark") {
    val dir = java.nio.file.Files.createTempDirectory("dedup_stream")
    // the same event file fed twice = an at-least-once replay
    val src = Tables.table(spark, TestSpark.sf, "events")
      .select("event_id", "ts", "user_id", "event_type", "value")
    src.write.mode("overwrite").parquet(s"$dir/in")
    src.write.mode("append").parquet(s"$dir/in")
    val stream = spark.readStream
      .schema(src.schema)
      .parquet(s"$dir/in")
    val q = EventStreams.dedupEvents(stream)
      .writeStream.outputMode("append").format("memory").queryName("t_dedup")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.table("t_dedup").count()
    assert(got == src.count(),
      s"replayed duplicates must be dropped exactly once (got $got)")
  }

  test("stream ingest with auto-compaction keeps overlap depth bounded") {
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val dir = java.nio.file.Files.createTempDirectory("kv_stream_ac")
    val kvPath = s"$dir/t"
    val q = EventStreams.streamIntoKv(
      input.toDF().toDF("k", "v"), kvPath, Seq("k"), s"$dir/ckpt",
      autoCompactDepth = 2)
    // 6 batches over the SAME keys: each batch is an upsert of all 50
    // rows (Put semantics), and without compaction each batch adds an
    // overlapping run (depth would reach ~6)
    for (b <- 0 until 6) {
      input.addData((0L until 50L).map(k => (k, s"b$b-$k")): _*)
      q.processAllAvailable()
    }
    q.stop()
    val t = graft.connector.KvCommands.table(spark, kvPath)
    assert(t.count() == 50, "re-ingested keys upsert, not duplicate")
    assert(t.filter(col("k") === 7L).head().getString(1) == "b5-7",
      "the LAST batch's value must win")
    val depth = graft.connector.KvCommands.overlapDepth(kvPath)
    assert(depth <= 3, s"auto-compaction should bound read amplification, got $depth")
  }

  test("maintainDerived keeps indexes and matviews query-fresh per batch") {
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long, Long)]
    val dir = java.nio.file.Files.createTempDirectory("kv_stream_md")
    val kvPath = s"$dir/t"
    // seed the table + derived state before streaming
    spark.range(200).selectExpr("id AS k", "id % 5 AS g", "id AS x")
      .write.format("graftkv").option("key", "k").mode("overwrite").save(kvPath)
    graft.connector.KvIndex.create(spark, kvPath, "ig", Seq("g"))
    graft.connector.KvMatView.create(spark, kvPath, "mv", Seq("g"), Seq("x"),
      minMaxCols = Seq("x")) // append-only ingest: the pure tighten path
    val q = EventStreams.streamIntoKv(
      input.toDF().toDF("k", "g", "x"), kvPath, Seq("k"), s"$dir/ckpt",
      maintainDerived = true)
    for (b <- 1 to 3) {
      input.addData((0L until 40L).map(i => (1000L * b + i, i % 5, i)): _*)
      q.processAllAvailable()
      // every batch commit re-watermarks BOTH derived structures
      assert(graft.connector.KvIndex.get(kvPath, "ig")
        .exists(graft.connector.KvIndex.inSync(kvPath, _)), s"index stale after batch $b")
      assert(graft.connector.KvMatView.get(kvPath, "mv")
        .exists(graft.connector.KvMatView.inSync(kvPath, _)), s"view stale after batch $b")
    }
    q.stop()
    // and the maintained view matches a recompute over the final table
    val t = graft.connector.KvCommands.table(spark, kvPath)
    val recomputed = t.groupBy("g").agg(count(lit(1)).as("cnt"),
      sum("x").as("sum_x"), min("x").as("min_x"), max("x").as("max_x"))
      .orderBy("g").collect().toSeq
    val stored = graft.connector.KvMatView.read(spark, kvPath, "mv")
      .select(col("g"), col("cnt"), col("sum_x"), col("min_x"), col("max_x"))
      .orderBy("g").collect().toSeq
    assert(stored == recomputed)
  }

  test("stream-stream interval join equals the batch interval join") {
    val src = s"${TestSpark.sf}/events.parquet"
    val clicks = EventStreams.eventStream(spark, src)
      .where(col("event_type") === "click")
    val views = EventStreams.eventStream(spark, src)
      .where(col("event_type") === "view")
    val got = runToMemory(EventStreams.intervalJoin(clicks, views),
      "t_ssjoin", "append")
      .collect().map(r => (r.getAs[Long]("l_id"), r.getAs[Long]("r_id"))).toSet

    val ev = Tables.table(spark, TestSpark.sf, "events")
    val a = ev.where($"event_type" === "click")
      .select($"event_id".as("a_id"), $"user_id".as("a_user"), $"ts".as("a_ts"))
    val b = ev.where($"event_type" === "view")
      .select($"event_id".as("b_id"), $"user_id".as("b_user"), $"ts".as("b_ts"))
    val want = a.join(b, $"b_user" === $"a_user" &&
        $"b_ts" >= $"a_ts" - expr("INTERVAL 1 HOUR") && $"b_ts" < $"a_ts")
      .collect().map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
    assert(got.nonEmpty)
    assert(got == want)

    // the batch operator (TemporalJoins.intervalCountJoin) agrees per-click
    val counts = graft.operators.TemporalJoins.intervalCountJoin(
      ev.where($"event_type" === "click"), ev.where($"event_type" === "view"),
      "user_id", "ts", "user_id", "ts", 3600L, "event_id", "n")
      .where($"n" > 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val gotCounts = got.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    assert(gotCounts == counts)
  }

  test("native streaming sink: writeStream.format(graftkv), epoch-idempotent") {
    val dir = java.nio.file.Files.createTempDirectory("kv_sink")
    val kvPath = s"$dir/events_kv"
    val stream = EventStreams.eventStream(spark, s"${TestSpark.sf}/events.parquet")
      .select("event_id", "ts", "user_id", "event_type", "value")
    val q = stream.writeStream.format("graftkv")
      .option("key", "user_id,event_id")
      .option("checkpointLocation", s"$dir/ckpt")
      .start(kvPath)
    q.processAllAvailable()
    q.stop()
    val back = graft.connector.KvCommands.table(spark, kvPath)
    val src = Tables.table(spark, TestSpark.sf, "events")
    assert(back.count() == src.count())
    assert(back.filter(col("user_id") === 7L).count() ==
      src.filter(col("user_id") === 7L).count())

    // epoch replay: re-offering a committed epoch with NEW (duplicate)
    // files must not double-append — the marker routes it to a sweep
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.unsafe.types.UTF8String
    val path2 = s"$dir/replay_kv"
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "k BIGINT, v STRING")
    val sw = new graft.connector.GraftKvStreamingWrite(
      path2, schema, Seq("k"), graft.store.RowCodec.Binary, "q1")
    def epochMsg(): org.apache.spark.sql.connector.write.WriterCommitMessage = {
      val w = new graft.connector.GraftKvStreamingWriterFactory(
        path2, schema, Seq("k"), graft.store.RowCodec.Binary, 0L)
        .createWriter(0, 0L, 5L)
      Seq(1L -> "a", 2L -> "b").foreach { case (k, v) =>
        w.write(InternalRow(k, UTF8String.fromString(v)))
      }
      w.commit()
    }
    sw.commit(5L, Array(epochMsg()))
    assert(graft.connector.KvCommands.table(spark, path2).count() == 2)
    sw.commit(5L, Array(epochMsg())) // the replay
    assert(graft.connector.KvCommands.table(spark, path2).count() == 2,
      "replayed epoch must not double-append")
  }

  test("buffered put writer: the later chunk wins a re-put key") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.unsafe.types.UTF8String
    val path = java.nio.file.Files.createTempDirectory("kv_chunk")
      .toString + "/t"
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "k BIGINT, v STRING")
    val w = new graft.connector.GraftKvBufferedPutWriter(
      path, schema, Seq("k"), graft.store.RowCodec.Binary, 1L, 0, 0L)
    w.write(InternalRow(42L, UTF8String.fromString("old")))
    // force at least one chunk flush between the two versions of key 42
    (0 until (1 << 16)).foreach(i =>
      w.write(InternalRow(1000L + i, UTF8String.fromString("f"))))
    w.write(InternalRow(42L, UTF8String.fromString("new")))
    val msg = w.commit()
    new graft.connector.GraftKvStreamingWrite(
      path, schema, Seq("k"), graft.store.RowCodec.Binary, "q2")
      .commit(0L, Array(msg))
    val got = graft.connector.KvCommands.table(spark, path)
      .filter(col("k") === 42L).head().getString(1)
    assert(got == "new", s"cross-chunk last-write-wins broken: got $got")
  }

  test("streaming gap-fill equals the batch resample over the finalized prefix") {
    implicit val sqlCtx = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // user 1: three observations spanning two 6h ticks + one exactly ON
    // a tick; user 2: a single observation AFTER its truncated origin
    // (leading None fill); user 99 is a far-future flush that advances
    // the watermark past every real tick WITHOUT emitting its own
    val u1 = Seq(
      EventStreams.GapObs(1L, ts("2024-01-01 01:00:00"), 1.0),
      EventStreams.GapObs(1L, ts("2024-01-01 03:30:00"), 2.0),
      EventStreams.GapObs(1L, ts("2024-01-01 13:00:00"), 3.0))
    val u2 = Seq(EventStreams.GapObs(2L, ts("2024-01-01 00:30:00"), 9.0))
    val flush = EventStreams.GapObs(99L, ts("2024-01-04 00:00:00"), 0.0)

    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[EventStreams.GapObs]
    val q = EventStreams.resampleStream(input.toDS(), everySeconds = 21600L)
      .writeStream.outputMode("append").format("memory").queryName("t_gapfill")
      .start()
    try {
      input.addData(u1.head, u2.head) // first lattice points
      q.processAllAvailable()
      input.addData(u1(1), u1(2)) // later observations, wm still behind
      q.processAllAvailable()
      input.addData(flush) // watermark sweeps past every real tick
      q.processAllAvailable()
      // timeouts fire on the NEXT trigger after the watermark advances
      input.addData(EventStreams.GapObs(99L, ts("2024-01-04 01:00:00"), 0.0))
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("t_gapfill").as[EventStreams.GapTick].collect()
      .filter(_.user_id != 99L)
      .map(t => (t.user_id, t.tick, t.value)).sortBy(x => (x._1, x._2.getTime))
    // the batch operator over the same observations (flush excluded) —
    // the watermark passed every real tick, so streaming must equal the
    // FULL batch result
    val batch = graft.operators.TemporalJoins.resampleForwardFill(
      (u1 ++ u2).toDF(), every = "6 hours")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .sortBy(x => (x._1, x._2.getTime))
    assert(got.toSeq == batch.toSeq,
      s"streaming ${got.toSeq} != batch ${batch.toSeq}")
    // spot-check the semantics the fixture plants
    assert(got.toSeq == Seq(
      (1L, ts("2024-01-01 01:00:00"), Some(1.0)),
      (1L, ts("2024-01-01 07:00:00"), Some(2.0)),
      (1L, ts("2024-01-01 13:00:00"), Some(3.0)),
      (2L, ts("2024-01-01 00:00:00"), None)))
  }

  test("flatMapGroupsWithState keeps running per-user totals") {
    val events = Seq(
      EventStreams.UserEvent(1L, "click", 1.0),
      EventStreams.UserEvent(1L, "click", 2.5),
      EventStreams.UserEvent(2L, "view", 4.0)
    ).toDS()
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[EventStreams.UserEvent]
    input.addData(events.collect().toSeq: _*)
    val q = EventStreams.runningUserTotals(input.toDS())
      .writeStream.outputMode("update").format("memory").queryName("t_state")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val byUser = spark.table("t_state").as[EventStreams.UserRunning]
      .collect().map(u => u.user_id -> u).toMap
    assert(byUser(1L).n_events == 2 && math.abs(byUser(1L).total_value - 3.5) < 1e-9)
    assert(byUser(2L).n_events == 1 && byUser(2L).total_value == 4.0)
  }
}
