package graft

import java.sql.Timestamp
import graft.streaming.Streams
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamsSpec extends SparkSpec {
  import spark.implicits._

  def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("windowedValueAgg over a memory stream matches the batch twin") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val df = mem.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val q = Streams.windowedValueAgg(df)
      .writeStream.format("memory").queryName("win_agg")
      .outputMode("append").start()
    try {
      mem.addData(
        (1L, ts("2024-01-01 10:05:00"), 1L, "click", 10.0),
        (2L, ts("2024-01-01 10:40:00"), 1L, "click", 20.0),
        (3L, ts("2024-01-01 11:10:00"), 2L, "view", 5.0))
      q.processAllAvailable()
      // advance watermark far enough to close the 10:00 and 11:00 windows
      mem.addData((4L, ts("2024-01-01 13:00:00"), 3L, "view", 1.0))
      q.processAllAvailable()
      val rows = spark.table("win_agg")
        .select("event_type", "n", "total_value").as[(String, Long, Double)]
        .collect().toSet
      assert(rows.contains(("click", 2L, 30.0)))
      assert(rows.contains(("view", 1L, 5.0)))
    } finally q.stop()
  }

  test("ivmMaintainStream: streamed CDC merge equals the batch IVM gate") {
    implicit val sqlCtx = spark.sqlContext
    // the batch gate's own carve-out: base = id%10 != 7, delta =
    // inserts (id%10 == 7, +1) + retractions (id%10 == 3, -1)
    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"),
        Det.fmtDate(to_date(col("ts"))).as("day"),
        floor(col("value") * 100).cast("long").as("cents"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val base = ev.filter(_._1 % 10 != 7)
      .map(t => (t._2, t._3, t._4, 1L))
    val delta = ev.filter(_._1 % 10 == 7).map(t => (t._2, t._3, t._4, 1L)) ++
      ev.filter(_._1 % 10 == 3).map(t => (t._2, t._3, t._4, -1L))
    val mem = MemoryStream[(Long, String, Long, Long)]
    val df = mem.toDF().toDF("user_id", "day", "cents", "mult")
    val q = Streams.ivmMaintainStream(df)
      .writeStream.format("memory").queryName("ivm_view")
      .outputMode("complete").start()
    try {
      // base state in one batch, then the delta split across TWO
      // micro-batches (merge must be slicing-independent)
      mem.addData(base.toSeq: _*); q.processAllAvailable()
      val (d1, d2) = delta.splitAt(delta.length / 2)
      mem.addData(d1.toSeq: _*); q.processAllAvailable()
      mem.addData(d2.toSeq: _*); q.processAllAvailable()
      val streamed = spark.table("ivm_view")
        .filter(col("n") > 0)
        .select("user_id", "day", "n", "sum_cents")
        .as[(Long, String, Long, Long)].collect().sorted.toSeq
      val batch = graft.queries.IvmQueries.qIvmAgg.run(spark, sfDir)
        .as[(Long, String, Long, Long)].collect().sorted.toSeq
      assert(streamed === batch)
    } finally q.stop()
  }

  test("movementDetector emits >threshold moves with state across batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val df = mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
    val q = Streams.movementDetector(spark, df, 0.5)
      .writeStream.format("memory").queryName("moves")
      .outputMode("append").start()
    try {
      mem.addData((1L, ts("2024-01-01 10:00:00"), 1L, "odds", 2.0))
      q.processAllAvailable()
      // second batch: state (2.0) must survive the batch boundary
      mem.addData((2L, ts("2024-01-01 10:10:00"), 1L, "odds", 4.0),
        (3L, ts("2024-01-01 10:20:00"), 1L, "odds", 4.1))
      q.processAllAvailable()
      val moves = spark.table("moves")
        .select("prev_value", "value", "rel_change")
        .as[(Double, Double, Double)].collect().toSeq
      assert(moves === Seq((2.0, 4.0, 1.0))) // 4.1 vs 4.0 is below threshold
    } finally q.stop()
  }

  test("movementDetector: a 100k-event hot key in ONE micro-batch completes (skew bound)") {
    // The documented per-(key, batch) buffer bound (Streams.scala SKEW
    // BOUND) as a hard invariant: one pathological key emitting 1e5 events
    // in a single micro-batch must sort, fold, and emit without blowing the
    // task. Values alternate 1.0/3.0 → both directions exceed the 0.5
    // threshold (+2.0 and -0.667), so the expected output size is pinned.
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val df = mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
    val q = Streams.movementDetector(spark, df, 0.5)
      .writeStream.format("memory").queryName("hot_moves")
      .outputMode("append").start()
    try {
      val n = 100000
      val base = ts("2024-01-01 00:00:00").getTime
      val events = (0 until n).map(i =>
        (i.toLong, new Timestamp(base + i * 1000L), 7L, "odds",
          if (i % 2 == 0) 1.0 else 3.0))
      mem.addData(events)
      q.processAllAvailable()
      val moves = spark.table("hot_moves")
      // n-1 transitions, all above threshold; first event has no prev
      assert(moves.count() === (n - 1).toLong)
      // in-key event-time order held end to end: prev of event i is i-1
      val sample = moves.filter(col("ts") === new Timestamp(base + 99999L * 1000L))
        .select("prev_value", "value").as[(Double, Double)].head()
      assert(sample === ((1.0, 3.0)))
    } finally q.stop()
  }

  test("session_window stream matches the batch sessionize boundaries") {
    // the streaming formulation of Windows.sessionize: same 30-min gap
    // semantics, session start + event count must agree (session_window's
    // `end` is last_event + gap by definition, so it is not compared)
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val df = mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
    val q = df.withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("n_events"))
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    val rows = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "click", 1.0),
      (2L, ts("2024-01-01 10:10:00"), 1L, "click", 1.0),
      (3L, ts("2024-01-01 11:30:00"), 1L, "click", 1.0),
      (4L, ts("2024-01-01 10:05:00"), 2L, "view", 1.0))
    try {
      mem.addData(rows: _*)
      q.processAllAvailable()
      mem.addData((99L, ts("2024-01-02 00:00:00"), 9L, "view", 1.0))
      q.processAllAvailable()
      val streamed = spark.table("sessions")
        .filter(col("user_id") < 9)
        .select(col("user_id"), col("session_start"), col("n_events"))
        .as[(Long, Timestamp, Long)].collect().toSet
      val batch = graft.operators.Windows.sessionize(
          rows.toDF("event_id", "ts", "user_id", "event_type", "value"),
          "user_id", "ts", "event_id", "value", gapMinutes = 30)
        .select(col("user_id"),
          to_timestamp(col("session_start")).as("session_start"),
          col("n_events"))
        .as[(Long, Timestamp, Long)].collect().toSet
      assert(streamed === batch)
      assert(batch.size === 3) // (1: 10:00 x2), (1: 11:30), (2: 10:05)
    } finally q.stop()
  }

  test("session_window with a dynamic gap matches batch sessionizeKeyedGap") {
    // the streaming formulation of Windows.sessionizeKeyedGap: the gap is an
    // EXPRESSION of the key (user 1 → 5 min, others → 60 min), so one stream
    // sessionizes every entity class at its own cadence. Boundary-exact rows
    // are avoided (batch splits on diff > gap, session_window on ≥).
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val df = mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
    // session_window requires CalendarIntervalType (ANSI interval literals
    // resolve to DayTimeIntervalType and are rejected) — cast from string
    val gapExpr = when(col("user_id") === 1L,
      expr("cast('5 minutes' as interval)"))
      .otherwise(expr("cast('60 minutes' as interval)"))
    val q = Streams.sessionizeKeyedGap(df, "user_id", gapExpr)
      .select(col("user_id"), col("session_start"), col("n_events"))
      .writeStream.format("memory").queryName("keyed_sessions")
      .outputMode("append").start()
    val rows = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "click", 1.0),
      (2L, ts("2024-01-01 10:10:00"), 1L, "click", 1.0), // >5 min → new
      (3L, ts("2024-01-01 10:00:00"), 2L, "click", 1.0),
      (4L, ts("2024-01-01 10:50:00"), 2L, "click", 1.0)) // ≤60 min → same
    try {
      mem.addData(rows: _*)
      q.processAllAvailable()
      mem.addData((99L, ts("2024-01-02 00:00:00"), 9L, "view", 1.0))
      q.processAllAvailable()
      val streamed = spark.table("keyed_sessions")
        .filter(col("user_id") < 9)
        .select(col("user_id"), col("session_start"), col("n_events"))
        .as[(Long, Timestamp, Long)].collect().toSet
      val batch = graft.operators.Windows.sessionizeKeyedGap(
          rows.toDF("event_id", "ts", "user_id", "event_type", "value"),
          "user_id", "ts", "event_id", "value",
          Seq((1L, 5)).toDF("user_id", "gap_minutes"), "gap_minutes",
          defaultGapMinutes = 60)
        .select(col("user_id"),
          to_timestamp(col("session_start")).as("session_start"),
          col("n_events"))
        .as[(Long, Timestamp, Long)].collect().toSet
      assert(streamed === batch)
      assert(batch.size === 3) // user 1 splits (5-min gap); user 2 holds
    } finally q.stop()
  }

  test("slidingMovementAlert flags >threshold ranges in overlapping windows") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val df = mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
    val q = Streams.slidingMovementAlert(df, threshold = 0.5)
      .writeStream.format("memory").queryName("slide_alerts")
      .outputMode("append").start()
    try {
      mem.addData(
        (1L, ts("2024-01-01 10:00:00"), 1L, "odds", 2.0),
        (2L, ts("2024-01-01 10:30:00"), 1L, "odds", 4.0), // 100% move
        (3L, ts("2024-01-01 10:05:00"), 2L, "odds", 3.0),
        (4L, ts("2024-01-01 10:35:00"), 2L, "odds", 3.1)) // 3% — quiet
      q.processAllAvailable()
      mem.addData((9L, ts("2024-01-01 14:00:00"), 9L, "odds", 1.0)) // close windows
      q.processAllAvailable()
      val alerts = spark.table("slide_alerts")
        .select("user_id").as[Long].collect().toSet
      assert(alerts === Set(1L)) // only the 100% mover alerts
    } finally q.stop()
  }

  test("eventsFileStream reads the parquet events dir as a stream") {
    // the file source needs a directory; stage the events file into one
    val dir = java.nio.file.Files.createTempDirectory("evstream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      dir.resolve("events.parquet"))
    val stream = Streams.eventsFileStream(spark, dir.toString)
    assert(stream.isStreaming)
    val q = Streams.windowedValueAgg(stream)
      .writeStream.format("memory").queryName("file_agg")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try {
      q.awaitTermination(60000)
      // watermark semantics: append mode only emits CLOSED windows; the
      // final window(s) of a finite file stream stay open, so we check the
      // batch twin covers strictly more rows
      val streamed = spark.table("file_agg").count()
      val batch = Streams.windowedValueAgg(
        Tables.events(spark, "/root/testdata/sf0.001")).count()
      assert(streamed > 0 && streamed <= batch)
    } finally q.stop()
  }

  test("same-millisecond events order by getNanos in movementDetector and jobStateMachine") {
    implicit val sqlCtx = spark.sqlContext
    // two events in the SAME millisecond, 250µs apart — getTime alone
    // cannot order them; getNanos must break the tie deterministically
    def microTs(base: String, micros: Int): Timestamp = {
      val t = new Timestamp(ts(base).getTime)
      t.setNanos(micros * 1000); t
    }
    val memM = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val qm = Streams.movementDetector(spark,
        memM.toDF().toDF("event_id", "ts", "user_id", "event_type", "value"), 0.1)
      .writeStream.format("memory").queryName("micro_moves")
      .outputMode("append").start()
    try {
      memM.addData(
        (2L, microTs("2024-01-01 10:00:00", 750), 1L, "odds", 8.0),  // later µs
        (1L, microTs("2024-01-01 10:00:00", 500), 1L, "odds", 2.0))  // earlier µs
      qm.processAllAvailable()
      val moves = spark.table("micro_moves")
        .select("prev_value", "value").as[(Double, Double)].collect().toSeq
      // 2.0 (earlier µs) must be prev of 8.0 — one +3.0 move, never 8.0→2.0
      assert(moves === Seq((2.0, 8.0)))
    } finally qm.stop()
    val memJ = MemoryStream[(String, String, Timestamp, Timestamp)]
    val qj = Streams.jobStateMachine(spark,
        memJ.toDF().toDF("id", "status", "event_ts", "scheduled_for"))
      .writeStream.format("memory").queryName("micro_jobs")
      .outputMode("append").start()
    try {
      val sched = ts("2024-01-01 11:00:00")
      memJ.addData(
        ("j1", "completed", microTs("2024-01-01 10:00:00", 900), sched), // later µs
        ("j1", "pending",   microTs("2024-01-01 10:00:00", 100), sched)) // earlier µs
      qj.processAllAvailable()
      val states = spark.table("micro_jobs")
        .select("status").as[String].collect().toSeq
      // pending (earlier µs) transitions first, completed absorbs — the
      // millis-only sort could process completed first and emit only it
      assert(states === Seq("pending", "completed"))
    } finally qj.stop()
  }

  test("jobStateMachine: terminal states absorb, late transitions ignored") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, String, Timestamp, Timestamp)]
    val df = mem.toDF().toDF("id", "status", "scheduled_for", "event_ts")
    val q = Streams.jobStateMachine(spark, df)
      .writeStream.format("memory").queryName("job_states")
      .outputMode("append").start()
    try {
      mem.addData(
        ("j1", "pending", ts("2024-01-01 10:00:00"), ts("2024-01-01 09:00:00")),
        ("j2", "pending", ts("2024-01-01 10:00:00"), ts("2024-01-01 09:00:00")))
      q.processAllAvailable()
      mem.addData(
        ("j1", "completed", ts("2024-01-01 10:00:00"), ts("2024-01-01 10:05:00")),
        // attempt to flip a completed job back — must be ignored
        ("j1", "pending", ts("2024-01-01 10:00:00"), ts("2024-01-01 10:06:00")))
      q.processAllAvailable()
      val last = spark.table("job_states")
        .groupBy("id").agg(last_value(col("status")).as("s"))
      val j1 = spark.table("job_states").filter(col("id") === "j1")
        .select("status").as[String].collect().toSeq
      assert(j1 === Seq("pending", "completed"))
    } finally q.stop()
  }

  test("decontaminateStream flags exactly the docs batch contamination flags") {
    implicit val sqlCtx = spark.sqlContext
    val run = (1 to 20).map(i => s"tok$i").mkString(" ")
    val corpus = Seq(
      (1L, ts("2024-01-01 10:00:00"), s"intro words here $run trailing text"),
      (2L, ts("2024-01-01 10:01:00"), run),
      (3L, ts("2024-01-01 10:02:00"),
        "entirely unrelated words " + (1 to 20).map(i => s"other$i").mkString(" ")))
    val benchDf = Seq((100L, run)).toDF("bench_id", "btext")
    val benchGrams = benchDf
      .select(explode(operators.Dedup.gramHashes(col("btext"), 13)).as("g"))
      .distinct()
    val mem = MemoryStream[(Long, Timestamp, String)]
    val q = Streams.decontaminateStream(
        mem.toDF().toDF("doc_id", "ts", "text"), benchGrams)
      .writeStream.format("memory").queryName("contaminated")
      .outputMode("append").start()
    try {
      mem.addData(corpus: _*)
      q.processAllAvailable()
      val streamed = spark.table("contaminated")
        .select("doc_id").as[Long].collect().toSet
      val batch = operators.Dedup.contaminationPairs(
          corpus.toDF("doc_id", "ts", "text"), "doc_id", "text",
          benchDf, "bench_id", "btext", n = 13)
        .select("doc_id").as[Long].collect().toSet
      assert(streamed === batch)
      assert(streamed === Set(1L, 2L)) // doc 3 shares no gram
    } finally q.stop()
  }

  test("incrementalDedupStream passes exactly the batch survivors") {
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq((10L, "alpha beta gamma"), (11L, "delta epsilon"))
      .toDF("doc_id", "text")
    val incoming = Seq(
      (20L, ts("2024-01-01 10:00:00"), "alpha  beta gamma"), // known → dropped
      (21L, ts("2024-01-01 10:01:00"), "zeta eta"),          // survives
      (22L, ts("2024-01-01 10:02:00"), "zeta eta"),          // in-batch dup → dropped
      (23L, ts("2024-01-01 10:03:00"), "theta iota"))        // survives
    val corpusFps = corpus.select(
      functions.TextFeatures.fingerprint(col("text")).as("__fp")).distinct()
    val mem = MemoryStream[(Long, Timestamp, String)]
    val q = Streams.incrementalDedupStream(
        mem.toDF().toDF("doc_id", "ts", "text"), corpusFps, "ts", "text",
        "1 hour")
      .writeStream.format("memory").queryName("inc_dedup")
      .outputMode("append").start()
    try {
      mem.addData(incoming: _*)
      q.processAllAvailable()
      val streamed = spark.table("inc_dedup")
        .select("doc_id").as[Long].collect().toSet
      // batch twin: survivors are the not-known, not-duplicate incoming docs
      val batch = operators.Dedup.incrementalExact(
          incoming.toDF("doc_id", "ts", "text"), corpus, "doc_id", "text")
        .filter(!col("is_known") && !col("is_duplicate"))
        .select("doc_id").as[Long].collect().toSet
      assert(streamed === batch)
      assert(streamed === Set(21L, 23L))
    } finally q.stop()
  }

  test("eventPairsStream: stream-stream join matches the batch twin exactly") {
    implicit val sqlCtx = spark.sqlContext
    // (event_id, ts, user_id, event_type) — pairs must respect the strict
    // lower bound, the 30-min upper bound (inclusive), and the user key
    // batch 1 = first two rows (watermark advances to 10:10-30min=09:40);
    // batch 2 = the rest, all ≥09:40 so nothing is late
    val rows = Seq(
      (1L, ts("2024-01-01 10:00:00"), 7L, "view"),
      (2L, ts("2024-01-01 10:10:00"), 7L, "purchase"),  // pairs with 1 in-batch
      (3L, ts("2024-01-01 10:30:00"), 7L, "purchase"),  // pairs with 1 ACROSS batches (boundary, inclusive)
      (4L, ts("2024-01-01 10:31:00"), 7L, "view"),
      (5L, ts("2024-01-01 11:30:00"), 7L, "purchase"),  // >30min after 4 → no pair
      (6L, ts("2024-01-01 10:00:00"), 8L, "purchase"),  // same instant as 7's view
      (7L, ts("2024-01-01 10:00:00"), 8L, "view"),      // same ts as 6 → strict > excludes
      (8L, ts("2024-01-01 10:20:00"), 8L, "purchase"))  // pairs with 7
    def asEvents(df: org.apache.spark.sql.DataFrame) =
      df.toDF("event_id", "ts", "user_id", "event_type")
    val mem = MemoryStream[(Long, Timestamp, Long, String)]
    val q = Streams.eventPairsStream(asEvents(mem.toDF()), "view",
        "purchase", horizonMinutes = 30)
      .writeStream.format("memory").queryName("ev_pairs")
      .outputMode("append").start()
    try {
      // two micro-batches: pairs must form across the batch boundary
      mem.addData(rows.take(2): _*)
      q.processAllAvailable()
      mem.addData(rows.drop(2): _*)
      q.processAllAvailable()
      val streamed = spark.table("ev_pairs")
        .select("user_id", "l_id", "r_id", "gap_us")
        .as[(Long, Long, Long, Long)].collect().toSet
      val batch = Streams.eventPairsStream(asEvents(rows.toDF()), "view",
          "purchase", horizonMinutes = 30)
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(streamed === batch)
      assert(streamed === Set(
        (7L, 1L, 2L, 600000000L),
        (7L, 1L, 3L, 1800000000L),
        (8L, 7L, 8L, 1200000000L)))
    } finally q.stop()
  }

  test("eventPairsStream left_outer: unmatched views emit nulls after the horizon closes") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Long, String)]
    def asEvents(df: org.apache.spark.sql.DataFrame) =
      df.toDF("event_id", "ts", "user_id", "event_type")
    val q = Streams.eventPairsStream(asEvents(mem.toDF()), "view",
        "purchase", horizonMinutes = 30, joinType = "left_outer")
      .writeStream.format("memory").queryName("ev_pairs_lo")
      .outputMode("append").start()
    try {
      mem.addData(
        (1L, ts("2024-01-01 10:00:00"), 7L, "view"),      // converts
        (2L, ts("2024-01-01 10:10:00"), 7L, "purchase"),
        (3L, ts("2024-01-01 10:05:00"), 9L, "view"))      // never converts
      q.processAllAvailable()
      // advance BOTH sides' watermarks far past 10:35 so user 9's window
      // closes; the unmatched row emits in a subsequent batch
      mem.addData(
        (90L, ts("2024-01-01 13:00:00"), 100L, "view"),
        (91L, ts("2024-01-01 13:00:00"), 101L, "purchase"))
      q.processAllAvailable()
      mem.addData(
        (92L, ts("2024-01-01 16:00:00"), 100L, "view"),
        (93L, ts("2024-01-01 16:00:00"), 101L, "purchase"))
      q.processAllAvailable()
      val got = spark.table("ev_pairs_lo")
        .filter(col("user_id").isin(7L, 9L))
        .select("user_id", "l_id", "r_id")
        .as[(Long, Long, Option[Long])].collect().toSet
      assert(got === Set((7L, 1L, Some(2L)), (9L, 3L, None)))
      // stream ≡ batch: the identical function body on a batch frame (the
      // q_event_pairs_outer registered twin) yields the same rows for the
      // users whose horizon the stream has closed
      val batch = Streams.eventPairsStream(
          asEvents(Seq(
            (1L, ts("2024-01-01 10:00:00"), 7L, "view"),
            (2L, ts("2024-01-01 10:10:00"), 7L, "purchase"),
            (3L, ts("2024-01-01 10:05:00"), 9L, "view")).toDF()),
          "view", "purchase", horizonMinutes = 30, joinType = "left_outer")
        .select("user_id", "l_id", "r_id")
        .as[(Long, Long, Option[Long])].collect().toSet
      assert(got === batch)
    } finally q.stop()
  }

  test("nearDupCandidateStream flags exactly the batch band collisions") {
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq(
      (10L, "the quick brown fox jumps over the lazy dog again and again"),
      (11L, "entirely different corpus content about databases and planning"))
      .toDF("doc_id", "text")
    val incoming = Seq(
      (20L, ts("2024-01-01 10:00:00"),
        "the quick brown fox jumps over the lazy dog again and again"), // exact copy → all bands collide
      (21L, ts("2024-01-01 10:01:00"),
        "completely unrelated text with no overlap whatsoever in shingles"))
    val corpusBands = operators.Dedup.corpusBandTable(corpus, "doc_id", "text")
    val mem = MemoryStream[(Long, Timestamp, String)]
    val q = Streams.nearDupCandidateStream(
        mem.toDF().toDF("doc_id", "ts", "text"), corpusBands,
        "ts", "doc_id", "text")
      .writeStream.format("memory").queryName("neardup_cand")
      .outputMode("append").start()
    try {
      mem.addData(incoming: _*)
      q.processAllAvailable()
      val streamed = spark.table("neardup_cand")
        .as[(Long, Long)].collect().toSet
      // batch twin: the same band tables joined statically
      val incomingBands = operators.Dedup.corpusBandTable(
          incoming.toDF("doc_id", "ts", "text"), "doc_id", "text")
        .withColumnRenamed("id_corpus", "id_new")
      val batch = incomingBands.join(corpusBands, Seq("band", "bucket"))
        .select(col("id_new"), col("id_corpus"))
        .distinct().as[(Long, Long)].collect().toSet
      assert(streamed === batch)
      assert(streamed.contains((20L, 10L)), "exact copy must collide")
      assert(!streamed.exists(_._1 == 21L), "unrelated doc must not collide")
    } finally q.stop()
  }

  test("curationIngestStream: gates, dedups, and scrubs like the batch composition") {
    implicit val sqlCtx = spark.sqlContext
    val good = "the quick brown fox jumps over the lazy dog while the other " +
      "animals watch from the shade of a very old tree near the river bank"
    val corpus = Seq((10L, good + " one more closing sentence for the corpus"))
      .toDF("doc_id", "text")
    val incoming = Seq(
      (20L, ts("2024-01-01 10:00:00"), good + " with an extra tail", "en"),
      (21L, ts("2024-01-01 10:01:00"), "zxqv kjhg wwnn", "en"),            // low quality
      (22L, ts("2024-01-01 10:02:00"), good + " with an extra tail", "de"), // wrong lang
      (23L, ts("2024-01-01 10:03:00"),
        good + " one more closing sentence for the corpus", "en"),          // known → dropped
      (24L, ts("2024-01-01 10:04:00"), good + " with an extra tail", "en"), // in-batch dup
      (25L, ts("2024-01-01 10:05:00"),
        good + " and you can mail a.b@example.com about it", "en"))         // survives, scrubbed
    val corpusFps = corpus.select(
      functions.TextFeatures.fingerprint(col("text")).as("__fp")).distinct()
    val mem = MemoryStream[(Long, Timestamp, String, String)]
    val q = Streams.curationIngestStream(
        mem.toDF().toDF("doc_id", "ts", "text", "lang"), corpusFps,
        "ts", "text", "lang", watermark = "1 hour")
      .writeStream.format("memory").queryName("curated_ingest")
      .outputMode("append").start()
    try {
      mem.addData(incoming: _*)
      q.processAllAvailable()
      val streamed = spark.table("curated_ingest")
        .select("doc_id", "text").as[(Long, String)].collect().toMap
      // batch composition of the same stages
      val inc = incoming.toDF("doc_id", "ts", "text", "lang")
      val gated = inc
        .filter(functions.TextFeatures.qualityScoreFast(col("text")) >= 0.75)
        .filter(functions.TextFeatures.langIdFast(col("text")) === col("lang"))
      val batch = operators.Dedup.incrementalExact(gated, corpus, "doc_id", "text")
        .filter(!col("is_known") && !col("is_duplicate"))
        .withColumn("text", functions.Redact.scrub(col("text")))
        .select("doc_id", "text").as[(Long, String)].collect().toMap
      assert(streamed === batch)
      assert(streamed.keySet === Set(20L, 25L))
      assert(streamed(25L).contains("<EMAIL>") && !streamed(25L).contains("@"))
    } finally q.stop()
  }

  test("piiScrubStream redacts identically to the batch scrub, stateless") {
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq(
      (1L, ts("2024-01-01 10:00:00"), "mail me at a.b@example.com today"),
      (2L, ts("2024-01-01 10:01:00"), "call 415-555-0117 or 555-0123"),
      (3L, ts("2024-01-01 10:02:00"), "nothing sensitive here"))
    val mem = MemoryStream[(Long, Timestamp, String)]
    val q = Streams.piiScrubStream(mem.toDF().toDF("doc_id", "ts", "text"))
      .writeStream.format("memory").queryName("scrubbed")
      .outputMode("append").start()
    try {
      mem.addData(rows: _*)
      q.processAllAvailable()
      val out = spark.table("scrubbed")
        .select("doc_id", "n_emails", "n_phones", "text")
        .as[(Long, Long, Long, String)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      assert(out(1L) === ((1L, 0L, "mail me at <EMAIL> today")))
      assert(out(2L) === ((0L, 2L, "call <PHONE> or <PHONE>")))
      assert(out(3L) === ((0L, 0L, "nothing sensitive here")))
      // stateless: no state store operators in the executed plan
      assert(!q.lastProgress.toString.contains("stateOperators\" : [ {"))
    } finally q.stop()
  }

  test("streamingDedup keeps first arrival per fingerprint across batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String)]
    val df = mem.toDF().toDF("doc_id", "ts", "text")
    val q = Streams.streamingDedup(df, "ts", "text", "1 hour")
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    try {
      mem.addData(
        (1L, ts("2024-01-01 10:00:00"), "the quick brown fox"),
        (2L, ts("2024-01-01 10:01:00"), "a different document"))
      q.processAllAvailable()
      // batch 2: a case/whitespace-perturbed duplicate of doc 1 (same
      // fingerprint) within the watermark — dropped; one new doc — kept
      mem.addData(
        (3L, ts("2024-01-01 10:10:00"), "  THE QUICK  BROWN FOX "),
        (4L, ts("2024-01-01 10:11:00"), "yet another document"))
      q.processAllAvailable()
      val kept = spark.table("dedup_stream")
        .select("doc_id").as[Long].collect().toSet
      assert(kept === Set(1L, 2L, 4L))
    } finally q.stop()
  }

  test("funnelStream advances per-user state across batches, matches batch twin") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String, Long)]
    val df = mem.toDF().toDF("user_id", "ts", "event_type", "event_id")
    val steps = Seq("signup", "view", "purchase")
    val q = Streams.funnelStream(spark, df, steps)
      .writeStream.format("memory").queryName("funnel_stream")
      .outputMode("append").start()
    try {
      // batch 1: user 1 signs up and views; user 2's purchase arrives
      // BEFORE any signup (must not advance); user 3 signs up
      mem.addData(
        (1L, ts("2024-01-01 10:00:00"), "signup", 1L),
        (1L, ts("2024-01-01 10:05:00"), "view", 2L),
        (2L, ts("2024-01-01 10:00:00"), "purchase", 3L),
        (3L, ts("2024-01-01 10:00:00"), "signup", 4L))
      q.processAllAvailable()
      // batch 2: user 1 purchases (state step=2 must survive the batch
      // boundary); user 2 signs up (starts at step 1)
      mem.addData(
        (1L, ts("2024-01-01 11:00:00"), "purchase", 5L),
        (2L, ts("2024-01-01 11:00:00"), "signup", 6L))
      q.processAllAvailable()
      val adv = spark.table("funnel_stream")
        .select("user_id", "step", "step_name")
        .as[(Long, Long, String)].collect().toSeq
      // per-step reach counts == batch funnelSteps on the union of batches
      val streamCounts = adv.groupBy(_._2).view.mapValues(_.size).toMap
      val all = Seq(
        (1L, ts("2024-01-01 10:00:00"), "signup", 1L),
        (1L, ts("2024-01-01 10:05:00"), "view", 2L),
        (2L, ts("2024-01-01 10:00:00"), "purchase", 3L),
        (3L, ts("2024-01-01 10:00:00"), "signup", 4L),
        (1L, ts("2024-01-01 11:00:00"), "purchase", 5L),
        (2L, ts("2024-01-01 11:00:00"), "signup", 6L))
        .toDF("user_id", "ts", "event_type", "event_id")
      val batch = graft.operators.Funnel.funnelSteps(all, "user_id", "ts",
        "event_type", "event_id", steps)
        .as[(Long, String, Long)].collect()
        .map(r => r._1 -> r._3).toMap
      assert(streamCounts.getOrElse(1L, 0) === batch(1L).toInt) // 3 signups
      assert(streamCounts.getOrElse(2L, 0) === batch(2L).toInt) // 1 view
      assert(streamCounts.getOrElse(3L, 0) === batch(3L).toInt) // 1 purchase
      // user 2's early purchase never advanced it past step 1
      assert(adv.filter(_._1 == 2L).map(_._3) === Seq("signup"))
    } finally q.stop()
  }

  test("funnelStream orders same-millisecond events by microsecond, not event_id") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String, Long)]
    val df = mem.toDF().toDF("user_id", "ts", "event_type", "event_id")
    val steps = Seq("signup", "view")
    val q = Streams.funnelStream(spark, df, steps)
      .writeStream.format("memory").queryName("funnel_stream_us")
      .outputMode("append").start()
    try {
      // two events in the SAME millisecond: the signup is 800µs EARLIER
      // but carries the LARGER event_id — the batch (ts, event_id) order
      // puts signup first, so the funnel must reach step 2. A
      // millisecond-resolution sort would order by event_id and see
      // view-before-signup (reach stops at 0).
      val t0 = ts("2024-01-01 10:00:00")
      val signupTs = new Timestamp(t0.getTime); signupTs.setNanos(100000)
      val viewTs = new Timestamp(t0.getTime); viewTs.setNanos(900000)
      mem.addData(
        (1L, viewTs, "view", 1L),
        (1L, signupTs, "signup", 2L))
      q.processAllAvailable()
      val adv = spark.table("funnel_stream_us")
        .select("user_id", "step", "step_name")
        .as[(Long, Long, String)].collect().toSeq.sortBy(_._2)
      assert(adv === Seq((1L, 1L, "signup"), (1L, 2L, "view")))
      // and the batch twin agrees on the full-microsecond order
      val all = Seq((1L, viewTs, "view", 1L), (1L, signupTs, "signup", 2L))
        .toDF("user_id", "ts", "event_type", "event_id")
      val batch = graft.operators.Funnel.funnelSteps(all, "user_id", "ts",
        "event_type", "event_id", steps)
        .as[(Long, String, Long)].collect().map(r => r._1 -> r._3).toMap
      assert(batch(1L) === 1L && batch(2L) === 1L)
    } finally q.stop()
  }

  test("dailyDistinctStream: chained bitmap aggs equal exact distinct") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val df = mem.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val q = Streams.dailyDistinctStream(df)
      .writeStream.format("memory").queryName("daily_distinct")
      .outputMode("append").start()
    try {
      // day 1: user 1 twice (dedup), users 2, 65541 (same bucket-bit
      // region as 5 only if buckets collide — exercises bucketing)
      mem.addData(
        (1L, ts("2024-01-01 10:00:00"), 1L, "click", 1.0),
        (2L, ts("2024-01-01 11:00:00"), 1L, "click", 1.0),
        (3L, ts("2024-01-01 12:00:00"), 2L, "click", 1.0),
        (4L, ts("2024-01-01 13:00:00"), 65541L, "click", 1.0),
        (5L, ts("2024-01-01 14:00:00"), 7L, "view", 1.0))
      q.processAllAvailable()
      // next-day late-watermark event closes day 1
      mem.addData((6L, ts("2024-01-02 09:00:00"), 9L, "click", 1.0))
      q.processAllAvailable()
      val rows = spark.table("daily_distinct")
        .select("event_type", "n_users").as[(String, Long)]
        .collect().toSet
      assert(rows.contains(("click", 3L)))
      assert(rows.contains(("view", 1L)))
      // batch twin: the same function body on a batch frame
      val batch = Streams.dailyDistinctStream(
        Seq((1L, ts("2024-01-01 10:00:00"), 1L, "click", 1.0),
          (2L, ts("2024-01-01 11:00:00"), 1L, "click", 1.0),
          (3L, ts("2024-01-01 12:00:00"), 2L, "click", 1.0),
          (4L, ts("2024-01-01 13:00:00"), 65541L, "click", 1.0),
          (5L, ts("2024-01-01 14:00:00"), 7L, "view", 1.0))
          .toDF("event_id", "ts", "user_id", "event_type", "value"))
        .select("event_type", "n_users").as[(String, Long)].collect().toSet
      assert(batch === Set(("click", 3L), ("view", 1L)))
    } finally q.stop()
  }

  test("quantileSketchStream: micro-batch slicing invisible — stream " +
      "equals batch bit-exact; small group is the exact order statistic") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val df = mem.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val q = Streams.quantileSketchStream(df, k = 64)
      .writeStream.format("memory").queryName("qsk_stream")
      .outputMode("append").start()
    val day1 = (0 until 10).map(i =>
      (i.toLong, ts(f"2024-01-01 10:${i}%02d:00"), i.toLong, "click",
        (i + 1).toDouble))
    try {
      // deliver in two slices — the sketch must not notice
      mem.addData(day1.take(4): _*); q.processAllAvailable()
      mem.addData(day1.drop(4): _*); q.processAllAvailable()
      mem.addData((99L, ts("2024-01-02 09:00:00"), 9L, "click", 1.0))
      q.processAllAvailable()
      val rows = spark.table("qsk_stream")
        .select("event_type", "n", "k_eff", "p50_est", "p90_est")
        .as[(String, Long, Long, Long, Long)].collect().toSet
      // 10 rows < k: sample = group; values 1..10 (micros ×1e6);
      // idx50 = (9·50) div 100 + 1 = 5 → 5e6; idx90 = 9·90 div 100+1=9
      assert(rows === Set(("click", 10L, 10L, 5000000L, 9000000L)))
      // batch twin of the same function body, same data one frame
      val batch = Streams.quantileSketchStream(
          day1.toDF("event_id", "ts", "user_id", "event_type", "value"),
          k = 64)
        .select("event_type", "n", "k_eff", "p50_est", "p90_est")
        .as[(String, Long, Long, Long, Long)].collect().toSet
      assert(batch === rows)
    } finally q.stop()
  }

  test("entropyMonitorStream: collapse day scores 0, batch run bit-exact") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val df = mem.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val q = Streams.entropyMonitorStream(df)
      .writeStream.format("memory").queryName("ent_mon")
      .outputMode("append").start()
    try {
      // day 1: values spread over 4 buckets; day 2: stuck constant
      val day1 = Seq(
        (1L, ts("2024-01-01 10:00:00"), 1L, "click", 10.0),
        (2L, ts("2024-01-01 11:00:00"), 2L, "click", 60.0),
        (3L, ts("2024-01-01 12:00:00"), 3L, "click", 110.0),
        (4L, ts("2024-01-01 13:00:00"), 4L, "click", 160.0))
      val day2 = Seq(
        (5L, ts("2024-01-02 10:00:00"), 5L, "click", 42.0),
        (6L, ts("2024-01-02 11:00:00"), 6L, "click", 42.0),
        (7L, ts("2024-01-02 12:00:00"), 7L, "click", 42.0))
      mem.addData(day1: _*)
      q.processAllAvailable()
      mem.addData(day2: _*)
      q.processAllAvailable()
      mem.addData((9L, ts("2024-01-03 09:00:00"), 9L, "view", 1.0))
      q.processAllAvailable()
      val streamed = spark.table("ent_mon")
        .as[(Timestamp, String, Long, Long, Long)].collect().toSet
      val batch = Streams.entropyMonitorStream(
        (day1 ++ day2).toDF("event_id", "ts", "user_id", "event_type",
          "value")).as[(Timestamp, String, Long, Long, Long)]
        .collect().toSet
      assert(batch.subsetOf(streamed))
      val byDay = streamed.map(r => r._1 -> ((r._4, r._5))).toMap
      // 4 events in 4 distinct buckets: ent = lg64(4) = 128 exactly
      assert(byDay(ts("2024-01-01 00:00:00")) === ((4L, 128L)))
      // constant day: one bucket, entropy 0
      assert(byDay(ts("2024-01-02 00:00:00")) === ((1L, 0L)))
    } finally q.stop()
  }

  test("psiDriftStream: per-day PSI matches the batch run bit-for-bit") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val df = mem.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val ref = Seq("click" -> 3L, "view" -> 3L) // balanced reference
    val q = Streams.psiDriftStream(df, "event_type", ref)
      .writeStream.format("memory").queryName("psi_drift")
      .outputMode("append").start()
    try {
      // day 1 matches the reference mix; day 2 is all clicks (shifted)
      val day1 = Seq(
        (1L, ts("2024-01-01 10:00:00"), 1L, "click", 1.0),
        (2L, ts("2024-01-01 11:00:00"), 2L, "view", 1.0),
        (3L, ts("2024-01-01 12:00:00"), 3L, "click", 1.0),
        (4L, ts("2024-01-01 13:00:00"), 4L, "view", 1.0))
      val day2 = Seq(
        (5L, ts("2024-01-02 10:00:00"), 5L, "click", 1.0),
        (6L, ts("2024-01-02 11:00:00"), 6L, "click", 1.0),
        (7L, ts("2024-01-02 12:00:00"), 7L, "click", 1.0),
        (8L, ts("2024-01-02 13:00:00"), 8L, "click", 1.0))
      mem.addData(day1: _*)
      q.processAllAvailable()
      mem.addData(day2: _*)
      q.processAllAvailable()
      mem.addData((9L, ts("2024-01-03 09:00:00"), 9L, "view", 1.0))
      q.processAllAvailable()
      val streamed = spark.table("psi_drift")
        .select("day_start", "n_events", "psi64")
        .as[(Timestamp, Long, Long)].collect().toSet
      // batch oracle: the same function body on a batch frame
      val batch = Streams.psiDriftStream(
        (day1 ++ day2).toDF("event_id", "ts", "user_id", "event_type",
          "value"), "event_type", ref)
        .as[(Timestamp, Long, Long)].collect().toSet
      assert(batch.subsetOf(streamed))
      val psiByDay = streamed.map(r => r._1 -> r._3).toMap
      // balanced day scores 0; the all-click day is strictly positive
      assert(psiByDay(ts("2024-01-01 00:00:00")) === 0L)
      assert(psiByDay(ts("2024-01-02 00:00:00")) > 0L)
    } finally q.stop()
  }

  test("scd2EnrichStream: events pick the version valid at event time") {
    implicit val sqlCtx = spark.sqlContext
    // dimension history for key 1: "old" until 12:00, then "new"
    val changes = Seq(
      (1L, Timestamp.valueOf("2024-01-01 08:00:00"), 10L, "old"),
      (1L, Timestamp.valueOf("2024-01-01 12:00:00"), 11L, "new"))
      .toDF("k", "ts", "id", "v")
    val dim = graft.operators.Joins.scd2History(
      changes, Seq("k"), "ts", "id", "v")
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val df = mem.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val q = Streams.scd2EnrichStream(df, "user_id", dim, "k", "v")
      .select("event_id", "dim_value")
      .writeStream.format("memory").queryName("scd2_enrich")
      .outputMode("append").start()
    try {
      mem.addData(
        (1L, ts("2024-01-01 07:00:00"), 1L, "click", 1.0), // pre-history
        (2L, ts("2024-01-01 09:00:00"), 1L, "click", 1.0)) // old era
      q.processAllAvailable()
      mem.addData(
        (3L, ts("2024-01-01 12:00:00"), 1L, "click", 1.0), // boundary→new
        (4L, ts("2024-01-01 18:00:00"), 1L, "click", 1.0), // new era
        (5L, ts("2024-01-01 18:00:00"), 2L, "click", 1.0)) // unknown key
      q.processAllAvailable()
      val out = spark.table("scd2_enrich").collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) null else r.getString(1))).toMap
      assert(out === Map(1L -> null, 2L -> "old", 3L -> "new",
        4L -> "new", 5L -> null))
    } finally q.stop()
  }

  test("topKPerKeyStream: admitted minus evicted equals the batch top-k") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val df = mem.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val q = Streams.topKPerKeyStream(spark, df, k = 2)
      .writeStream.format("memory").queryName("topk_stream")
      .outputMode("append").start()
    try {
      mem.addData(
        (1L, ts("2024-01-01 10:00:00"), 1L, "click", 5.0),
        (2L, ts("2024-01-01 10:01:00"), 1L, "click", 3.0),
        (3L, ts("2024-01-01 10:02:00"), 1L, "click", 9.0)) // evicts 2
      q.processAllAvailable()
      // state must survive the batch boundary: 7.0 evicts 5.0 (id 1)
      mem.addData(
        (4L, ts("2024-01-01 10:03:00"), 1L, "click", 7.0),
        (5L, ts("2024-01-01 10:04:00"), 1L, "click", 1.0), // no admit
        (6L, ts("2024-01-01 10:05:00"), 1L, "view", 2.0))
      q.processAllAvailable()
      val admits = spark.table("topk_stream")
        .select("event_type", "event_id", "evicted_id")
        .collect()
        .map(r => (r.getString(0), r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getLong(2))))
      val clickAdmits = admits.filter(_._1 == "click")
      assert(clickAdmits.map(_._2).toSeq === Seq(1L, 2L, 3L, 4L))
      val surviving = clickAdmits.map(_._2).toSet --
        clickAdmits.flatMap(_._3).toSet
      // batch top-2 by value: ids 3 (9.0) and 4 (7.0)
      assert(surviving === Set(3L, 4L))
      assert(admits.filter(_._1 == "view").map(_._2).toSeq === Seq(6L))
    } finally q.stop()
  }
}
