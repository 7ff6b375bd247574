package graft

import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.Streams

/** MICRO-BATCH SLICING fuzzer for the stateful streaming families — the
  * round-9 verdict's ask #6. The existing stream≡batch pins deliver fixed
  * two-slice batches; this spec draws RANDOM slicings (random batch
  * boundaries, random within-watermark disorder including full
  * permutations where the algebra permits) and asserts stream ≡ batch for
  * every draw, per family:
  *
  *  - IVM delta-merge ([[Streams.ivmMaintainStream]]): additive bag
  *    semantics — ANY permutation into ANY number of micro-batches must
  *    land on the same view state (retractions may precede their inserts
  *    mid-stream; only the final state is contractual).
  *  - streaming quantile sketch ([[Streams.quantileSketchStream]]):
  *    union-take-k merge is associative/commutative, so with every event
  *    inside the 30-minute watermark span, ANY permutation + slicing must
  *    emit bit-identical estimates on window close.
  *  - stream-stream event pairs ([[Streams.eventPairsStream]]): the
  *    interval join buffers per-key state within the horizon; with all
  *    real rows inside the watermark span, ANY permutation + slicing must
  *    produce exactly the batch twin's pair set.
  *
  * Lateness discipline: real rows span < the 30-minute watermark, so the
  * watermark (max event ts − 30 min) never passes ANY real row no matter
  * the arrival order — every draw is adversarial but nothing is
  * legitimately droppable, which is what makes equality the contract
  * rather than a probabilistic hope. Windowed families are flushed by TWO
  * far-future sentinel batches (the watermark computed from batch k is
  * applied while processing batch k+1).
  */
class FuzzSliceSpec extends SparkSpec {
  import spark.implicits._

  private val DrawsPerFamily = 100

  /** Run draws as N concurrent streaming queries: a draw's cost is
    * micro-batch COMMIT latency (state-store checkpointing), not CPU, so
    * overlapping queries cuts the suite's wall-clock ~Nx without changing
    * any draw's semantics (queries are fully independent: own MemoryStream,
    * own memory-sink table, own state dir). */
  private def runDraws(label: String, n: Int = DrawsPerFamily)(
      body: Int => Unit): Int = {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    implicit val ec: ExecutionContext =
      ExecutionContext.fromExecutor(pool)
    try {
      val done = Await.result(
        Future.sequence((1 to n).map(d => Future { body(d); 1 })),
        45.minutes)
      done.sum
    } finally pool.shutdown()
  }

  private var priorShufflePartitions: String = _

  override def beforeAll(): Unit = {
    super.beforeAll()
    // per-draw data is ~40-80 rows; 32 shuffle/state-store partitions per
    // micro-batch would be pure scheduling overhead across 300 queries.
    // (State-store partition count binds at query START, so setting it
    // here covers every draw; batch twins are unaffected semantically.)
    priorShufflePartitions = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
  }

  override def afterAll(): Unit = {
    // restore whatever SparkSpec configured (r9 advisor: a hardcoded "32"
    // here silently re-encoded the wrong default for the shared session)
    spark.conf.set("spark.sql.shuffle.partitions", priorShufflePartitions)
    super.afterAll()
  }

  private def ts(s: String) = Timestamp.valueOf(s)

  /** Random permutation, then random cut into 1..maxBatches chunks. */
  private def randomSlices[T](rows: Seq[T], r: java.util.Random,
      maxBatches: Int, permute: Boolean): Seq[Seq[T]] = {
    val perm =
      if (permute)
        scala.util.Random.javaRandomToRandom(r).shuffle(rows)
      else rows
    val n = 1 + r.nextInt(maxBatches)
    val cuts = Seq.fill(n - 1)(r.nextInt(perm.size + 1)).sorted
    ((0 +: cuts) :+ perm.size).sliding(2).collect {
      case Seq(a, b) if b > a => perm.slice(a, b)
    }.toSeq
  }

  test(s"IVM delta-merge: $DrawsPerFamily random permutations+slicings " +
      "all land on the batch view state") {
    implicit val sqlCtx = spark.sqlContext
    val checked = runDraws("ivm") { draw =>
      val r = new java.util.Random(9000L + draw)
      // ~60 CDC rows over 8 users x 3 days; ~25% retractions
      val rows = (1 to 60).map { i =>
        val mult = if (r.nextInt(4) == 0) -1L else 1L
        (r.nextInt(8).toLong, s"2024-01-0${1 + r.nextInt(3)}",
          (1L + r.nextInt(9999)), mult)
      }
      val expected = Streams.ivmMaintainStream(
          rows.toDF("user_id", "day", "cents", "mult"))
        .select("user_id", "day", "n", "sum_cents")
        .as[(Long, String, Long, Long)].collect().sorted.toSeq
      val mem = MemoryStream[(Long, String, Long, Long)]
      val qn = s"fz_ivm_$draw"
      val q = Streams.ivmMaintainStream(
          mem.toDF().toDF("user_id", "day", "cents", "mult"))
        .writeStream.format("memory").queryName(qn)
        .outputMode("complete").start()
      try {
        randomSlices(rows, r, maxBatches = 6, permute = true).foreach {
          chunk => mem.addData(chunk: _*); q.processAllAvailable()
        }
        val got = spark.table(qn)
          .select("user_id", "day", "n", "sum_cents")
          .as[(Long, String, Long, Long)].collect().sorted.toSeq
        assert(got === expected, s"draw=$draw: IVM state != batch view")
      } finally q.stop()
    }
    assert(checked === DrawsPerFamily)
  }

  test(s"quantile sketch: $DrawsPerFamily random permutations+slicings " +
      "emit bit-identical estimates to the batch twin") {
    implicit val sqlCtx = spark.sqlContext
    // all real rows inside one 25-minute span (< the 30-min watermark):
    // ANY arrival order is within-watermark disorder by construction
    val base = ts("2024-01-01 10:00:00").getTime
    val checked = runDraws("qsk") { draw =>
      val r = new java.util.Random(9500L + draw)
      val types = Seq("click", "view", "buy")
      val rows = (1 to 80).map { i =>
        (i.toLong, new Timestamp(base + r.nextInt(25 * 60) * 1000L),
          r.nextInt(9).toLong, types(r.nextInt(3)),
          (1 + r.nextInt(99999)) / 100.0)
      }
      val expected = Streams.quantileSketchStream(
          rows.toDF("event_id", "ts", "user_id", "event_type", "value"),
          k = 16)
        .select("event_type", "n", "k_eff", "p50_est", "p90_est")
        .as[(String, Long, Long, Long, Long)].collect().sorted.toSeq
      val mem = MemoryStream[(Long, Timestamp, Long, String, Double)]
      val qn = s"fz_qsk_$draw"
      val q = Streams.quantileSketchStream(
          mem.toDF().toDF("event_id", "ts", "user_id", "event_type",
            "value"), k = 16)
        .writeStream.format("memory").queryName(qn)
        .outputMode("append").start()
      try {
        randomSlices(rows, r, maxBatches = 5, permute = true).foreach {
          chunk => mem.addData(chunk: _*); q.processAllAvailable()
        }
        // two flush batches close the day-1 window
        mem.addData((9001L, ts("2024-01-02 12:00:00"), 1L, "zz", 1.0))
        q.processAllAvailable()
        mem.addData((9002L, ts("2024-01-03 12:00:00"), 1L, "zz", 1.0))
        q.processAllAvailable()
        val got = spark.table(qn)
          .filter(col("day_start") === ts("2024-01-01 00:00:00"))
          .select("event_type", "n", "k_eff", "p50_est", "p90_est")
          .as[(String, Long, Long, Long, Long)].collect().sorted.toSeq
        assert(got === expected, s"draw=$draw: sketch != batch twin")
      } finally q.stop()
    }
    assert(checked === DrawsPerFamily)
  }

  private val DrawsSmall = 50

  test(s"daily distinct (chained stateful aggs): $DrawsSmall random " +
      "permutations+slicings equal the batch twin") {
    implicit val sqlCtx = spark.sqlContext
    // two CHAINED event-time aggregations share the watermark: rows span
    // 25 min < the 30-min watermark, so any permutation is tolerable
    // disorder for BOTH stateful operators
    val base = ts("2024-01-01 10:00:00").getTime
    val checked = runDraws("daily_distinct", DrawsSmall) { draw =>
      val r = new java.util.Random(9700L + draw)
      val types = Seq("click", "view")
      // user ids straddle bitmap bucket boundaries (bucket = id >> 15)
      val rows = (1 to 60).map { i =>
        (i.toLong, new Timestamp(base + r.nextInt(25 * 60) * 1000L),
          (r.nextInt(4) * 32768 + r.nextInt(6)).toLong,
          types(r.nextInt(2)), 1.0)
      }
      val expected = Streams.dailyDistinctStream(
          rows.toDF("event_id", "ts", "user_id", "event_type", "value"))
        .select("event_type", "n_users")
        .as[(String, Long)].collect().sorted.toSeq
      val mem = MemoryStream[(Long, Timestamp, Long, String, Double)]
      val qn = s"fz_dd_$draw"
      val q = Streams.dailyDistinctStream(
          mem.toDF().toDF("event_id", "ts", "user_id", "event_type",
            "value"))
        .writeStream.format("memory").queryName(qn)
        .outputMode("append").start()
      try {
        randomSlices(rows, r, maxBatches = 4, permute = true).foreach {
          chunk => mem.addData(chunk: _*); q.processAllAvailable()
        }
        mem.addData((9001L, ts("2024-01-02 12:00:00"), 1L, "zz", 1.0))
        q.processAllAvailable()
        mem.addData((9002L, ts("2024-01-03 12:00:00"), 1L, "zz", 1.0))
        q.processAllAvailable()
        val got = spark.table(qn)
          .filter(col("day_start") === ts("2024-01-01 00:00:00"))
          .select("event_type", "n_users")
          .as[(String, Long)].collect().sorted.toSeq
        assert(got === expected, s"draw=$draw: distinct != batch twin")
      } finally q.stop()
    }
    assert(checked === DrawsSmall)
  }

  test(s"keyed-gap sessionization: $DrawsSmall random " +
      "permutations+slicings equal the batch twin") {
    implicit val sqlCtx = spark.sqlContext
    // rows span 8 min < the 10-min watermark → full-permutation safe;
    // the gap is an expression of the key (even users 1 min, odd 3 min)
    val base = ts("2024-01-01 10:00:00").getTime
    val gapExpr = when(col("user_id") % 2 === 0,
      expr("cast('1 minutes' as interval)"))
      .otherwise(expr("cast('3 minutes' as interval)"))
    val checked = runDraws("sessions", DrawsSmall) { draw =>
      val r = new java.util.Random(9800L + draw)
      val rows = (1 to 50).map { i =>
        (i.toLong, new Timestamp(base + r.nextInt(8 * 60) * 1000L),
          r.nextInt(5).toLong, "click",
          (1 + r.nextInt(9999)) / 100.0)
      }
      def shape(df: DataFrame) =
        Streams.sessionizeKeyedGap(
          df.toDF("event_id", "ts", "user_id", "event_type", "value"),
          "user_id", gapExpr)
      val expected = shape(rows.toDF())
        .select("user_id", "session_start", "n_events", "total_value")
        .as[(Long, Timestamp, Long, Double)].collect().sorted.toSeq
      val mem = MemoryStream[(Long, Timestamp, Long, String, Double)]
      val qn = s"fz_sess_$draw"
      val q = shape(mem.toDF())
        .writeStream.format("memory").queryName(qn)
        .outputMode("append").start()
      try {
        randomSlices(rows, r, maxBatches = 4, permute = true).foreach {
          chunk => mem.addData(chunk: _*); q.processAllAvailable()
        }
        mem.addData((9001L, ts("2024-01-01 16:00:00"), 999L, "zz", 1.0))
        q.processAllAvailable()
        mem.addData((9002L, ts("2024-01-01 20:00:00"), 999L, "zz", 1.0))
        q.processAllAvailable()
        val got = spark.table(qn)
          .filter(col("user_id") < 999L)
          .select("user_id", "session_start", "n_events", "total_value")
          .as[(Long, Timestamp, Long, Double)].collect().sorted.toSeq
        assert(got === expected, s"draw=$draw: sessions != batch twin")
      } finally q.stop()
    }
    assert(checked === DrawsSmall)
  }

  test(s"funnel: $DrawsPerFamily random in-order slicings with " +
      "intra-batch shuffles equal the batch twin") {
    implicit val sqlCtx = spark.sqlContext
    // funnelStream's contract is order-of-arrival ACROSS batches (state is
    // one int per user; no watermark buffer), so the legal disorder here is
    // different: chunks must respect the (ts, nanos, event_id) total order
    // the operator sorts by WITHIN a batch, while rows inside a chunk may
    // arrive in any permutation (the operator re-sorts them). Random cut
    // points + full intra-chunk shuffles per draw.
    val base = ts("2024-01-01 10:00:00").getTime
    val steps = Seq("signup", "view", "purchase")
    val checked = runDraws("funnel") { draw =>
      val r = new java.util.Random(10100L + draw)
      val types = steps :+ "other"
      val rows = (1 to 60).map { i =>
        (r.nextInt(8).toLong,
          new Timestamp(base + r.nextInt(25 * 60) * 1000L),
          types(r.nextInt(4)), i.toLong)
      }
      def asEvents(df: DataFrame) =
        df.toDF("user_id", "ts", "event_type", "event_id")
      // batch twin: same flatMapGroupsWithState code on a batch frame —
      // one group pass over all rows in the (ts, nanos, id) sort order
      val expected = Streams.funnelStream(spark, asEvents(rows.toDF()), steps)
        .select("user_id", "step", "step_name", "ts")
        .as[(Long, Long, String, Timestamp)].collect().sorted.toSeq
      val mem = MemoryStream[(Long, Timestamp, String, Long)]
      val qn = s"fz_funnel_$draw"
      val q = Streams.funnelStream(spark, asEvents(mem.toDF()), steps)
        .writeStream.format("memory").queryName(qn)
        .outputMode("append").start()
      try {
        val inOrder = rows.sortBy(e => (e._2.getTime, e._2.getNanos, e._4))
        randomSlices(inOrder, r, maxBatches = 6, permute = false).foreach {
          chunk =>
            val shuffled =
              scala.util.Random.javaRandomToRandom(r).shuffle(chunk)
            mem.addData(shuffled: _*); q.processAllAvailable()
        }
        val got = spark.table(qn)
          .select("user_id", "step", "step_name", "ts")
          .as[(Long, Long, String, Timestamp)].collect().sorted.toSeq
        assert(got === expected, s"draw=$draw: funnel advances != batch")
      } finally q.stop()
    }
    assert(checked === DrawsPerFamily)
  }

  test(s"per-key top-k: $DrawsPerFamily random permutations+slicings — " +
      "admitted minus evicted equals the exact top-k") {
    implicit val sqlCtx = spark.sqlContext
    // the running top-k under the (value desc, id asc) TOTAL order is
    // order-independent as a SET (the admission sequence is not), so full
    // permutation + slicing is legal disorder when comparing the
    // reconstruction admitted − evicted. Values are drawn from a small
    // grid to force ties through the event_id tie-break.
    val base = ts("2024-01-01 10:00:00").getTime
    val k = 3
    val checked = runDraws("topk") { draw =>
      val r = new java.util.Random(10200L + draw)
      val types = Seq("click", "view", "buy")
      val rows = (1 to 60).map { i =>
        (i.toLong, new Timestamp(base + r.nextInt(25 * 60) * 1000L),
          r.nextInt(6).toLong, types(r.nextInt(3)),
          (1 + r.nextInt(8)).toDouble)
      }
      // independent Scala oracle: exact per-type top-k under the operator's
      // total order
      val expected = rows.groupBy(_._4).view.mapValues(es =>
          es.sortBy(e => (-e._5, e._1)).take(k)
            .map(e => (e._1, e._5)).toSet)
        .toMap.toSeq.sortBy(_._1)
      val mem = MemoryStream[(Long, Timestamp, Long, String, Double)]
      val qn = s"fz_topk_$draw"
      val q = Streams.topKPerKeyStream(spark,
          mem.toDF().toDF("event_id", "ts", "user_id", "event_type",
            "value"), k)
        .writeStream.format("memory").queryName(qn)
        .outputMode("append").start()
      try {
        randomSlices(rows, r, maxBatches = 5, permute = true).foreach {
          chunk => mem.addData(chunk: _*); q.processAllAvailable()
        }
        val admits = spark.table(qn)
          .select("event_type", "event_id", "value", "evicted_id")
          .collect()
          .map(row => (row.getString(0), row.getLong(1), row.getDouble(2),
            if (row.isNullAt(3)) None else Some(row.getLong(3))))
        val got = admits.groupBy(_._1).view.mapValues { as =>
          val evicted = as.flatMap(_._4).toSet
          as.collect { case (_, id, v, _) if !evicted.contains(id) =>
            (id, v) }.toSet
        }.toMap.toSeq.sortBy(_._1)
        assert(got === expected, s"draw=$draw: reconstructed top-$k != oracle")
      } finally q.stop()
    }
    assert(checked === DrawsPerFamily)
  }

  test(s"dedup ingest: $DrawsPerFamily random permutations+slicings " +
      "emit exactly one survivor text per new fingerprint") {
    implicit val sqlCtx = spark.sqlContext
    // first-arrival-wins is order-DEPENDENT in which doc_id survives, but
    // order-INDEPENDENT in the surviving TEXT set (duplicate groups share
    // their text verbatim; all rows sit inside the 1-hour horizon, so
    // exactly one row per new fingerprint passes). Compare the emitted
    // text multiset against the batch incrementalExact survivors.
    val base = ts("2024-01-01 10:00:00").getTime
    val pool = (0 until 12).map(i => s"document body variant number $i " +
      "with enough shared words to be a stable fingerprint target")
    val corpus = pool.take(3).zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val checked = runDraws("dedup") { draw =>
      val r = new java.util.Random(10300L + draw)
      val rows = (1 to 40).map { i =>
        (100L + i, new Timestamp(base + r.nextInt(25 * 60) * 1000L),
          pool(r.nextInt(12)))
      }
      val corpusDf = corpus.toDF("doc_id", "text")
      val corpusFps = corpusDf.select(
        graft.functions.TextFeatures.fingerprint(col("text")).as("__fp"))
        .distinct()
      val expected = graft.operators.Dedup.incrementalExact(
          rows.toDF("doc_id", "ts", "text"), corpusDf, "doc_id", "text")
        .filter(!col("is_known") && !col("is_duplicate"))
        .select("text").as[String].collect().sorted.toSeq
      val mem = MemoryStream[(Long, Timestamp, String)]
      val qn = s"fz_dedup_$draw"
      val q = Streams.incrementalDedupStream(
          mem.toDF().toDF("doc_id", "ts", "text"), corpusFps, "ts", "text",
          "1 hour")
        .writeStream.format("memory").queryName(qn)
        .outputMode("append").start()
      try {
        randomSlices(rows, r, maxBatches = 5, permute = true).foreach {
          chunk => mem.addData(chunk: _*); q.processAllAvailable()
        }
        val got = spark.table(qn)
          .select("text").as[String].collect().sorted.toSeq
        assert(got === expected, s"draw=$draw: survivor texts != batch")
      } finally q.stop()
    }
    assert(checked === DrawsPerFamily)
  }

  test(s"curation ingest: $DrawsPerFamily random permutations+slicings " +
      "gate, dedup, and scrub to the batch composition") {
    implicit val sqlCtx = spark.sqlContext
    val base = ts("2024-01-01 10:00:00").getTime
    val good = "the quick brown fox jumps over the lazy dog while the " +
      "other animals watch from the shade of a very old tree by the river"
    val numbers = Seq("one", "two", "three", "four", "five", "six",
      "seven", "eight")
    val pool = numbers.map(n => s"$good chapter $n and you can mail " +
      s"a.b@example.com about it")
    val corpus = pool.take(2).zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val checked = runDraws("curation") { draw =>
      val r = new java.util.Random(10400L + draw)
      val rows = (1 to 40).map { i =>
        val roll = r.nextInt(10)
        val (text, lang) =
          if (roll == 0) ("zxqv kjhg wwnn", "en")          // low quality
          else if (roll == 1) (pool(r.nextInt(8)), "de")   // wrong lang
          else (pool(r.nextInt(8)), "en")                  // dup groups
        (100L + i, new Timestamp(base + r.nextInt(25 * 60) * 1000L),
          text, lang)
      }
      val corpusDf = corpus.toDF("doc_id", "text")
      val corpusFps = corpusDf.select(
        graft.functions.TextFeatures.fingerprint(col("text")).as("__fp"))
        .distinct()
      // batch composition of the same stages (the StreamsSpec twin)
      val inc = rows.toDF("doc_id", "ts", "text", "lang")
      val gated = inc
        .filter(graft.functions.TextFeatures
          .qualityScoreFast(col("text")) >= 0.75)
        .filter(graft.functions.TextFeatures
          .langIdFast(col("text")) === col("lang"))
      val expected = graft.operators.Dedup.incrementalExact(
          gated, corpusDf, "doc_id", "text")
        .filter(!col("is_known") && !col("is_duplicate"))
        .withColumn("text", graft.functions.Redact.scrub(col("text")))
        .select("text").as[String].collect().sorted.toSeq
      val mem = MemoryStream[(Long, Timestamp, String, String)]
      val qn = s"fz_cur_$draw"
      val q = Streams.curationIngestStream(
          mem.toDF().toDF("doc_id", "ts", "text", "lang"), corpusFps,
          "ts", "text", "lang", watermark = "1 hour")
        .writeStream.format("memory").queryName(qn)
        .outputMode("append").start()
      try {
        randomSlices(rows, r, maxBatches = 5, permute = true).foreach {
          chunk => mem.addData(chunk: _*); q.processAllAvailable()
        }
        val got = spark.table(qn)
          .select("text").as[String].collect().sorted.toSeq
        assert(got === expected, s"draw=$draw: curated texts != batch")
      } finally q.stop()
    }
    assert(checked === DrawsPerFamily)
  }

  test(s"event pairs: $DrawsPerFamily random permutations+slicings " +
      "produce exactly the batch pair set") {
    implicit val sqlCtx = spark.sqlContext
    val base = ts("2024-01-01 10:00:00").getTime
    val checked = runDraws("pairs") { draw =>
      val r = new java.util.Random(9900L + draw)
      // 40 events over 6 users in a 25-min span; horizon 30 min ≥ span,
      // so cross-chunk disorder is always within watermark
      val rows = (1 to 40).map { i =>
        (i.toLong, new Timestamp(base + r.nextInt(25 * 60) * 1000L),
          r.nextInt(6).toLong,
          if (r.nextBoolean()) "view" else "purchase")
      }
      def asEvents(df: DataFrame) =
        df.toDF("event_id", "ts", "user_id", "event_type")
      val expected = Streams.eventPairsStream(asEvents(rows.toDF()),
          "view", "purchase", horizonMinutes = 30)
        .select("user_id", "l_id", "r_id", "gap_us")
        .as[(Long, Long, Long, Long)].collect().sorted.toSeq
      val mem = MemoryStream[(Long, Timestamp, Long, String)]
      val qn = s"fz_pairs_$draw"
      val q = Streams.eventPairsStream(asEvents(mem.toDF()),
          "view", "purchase", horizonMinutes = 30)
        .writeStream.format("memory").queryName(qn)
        .outputMode("append").start()
      try {
        randomSlices(rows, r, maxBatches = 5, permute = true).foreach {
          chunk => mem.addData(chunk: _*); q.processAllAvailable()
        }
        // advance BOTH sides' watermarks far past the span (flush users
        // excluded from the comparison)
        mem.addData(
          (9001L, ts("2024-01-01 16:00:00"), 100L, "view"),
          (9002L, ts("2024-01-01 16:00:00"), 101L, "purchase"))
        q.processAllAvailable()
        mem.addData(
          (9003L, ts("2024-01-01 20:00:00"), 100L, "view"),
          (9004L, ts("2024-01-01 20:00:00"), 101L, "purchase"))
        q.processAllAvailable()
        val got = spark.table(qn)
          .filter(col("user_id") < 100L)
          .select("user_id", "l_id", "r_id", "gap_us")
          .as[(Long, Long, Long, Long)].collect().sorted.toSeq
        assert(got === expected, s"draw=$draw: pairs != batch twin")
      } finally q.stop()
    }
    assert(checked === DrawsPerFamily)
  }

  test(s"movement detector: $DrawsPerFamily random in-order slicings " +
      "with intra-batch shuffles equal the batch twin") {
    implicit val sqlCtx = spark.sqlContext
    // movementDetector's contract is order-of-arrival ACROSS batches
    // (state = last value per key), so the legal disorder is the funnel
    // discipline: chunks respect the (ts) total order (timestamps are
    // unique by construction — one per row index), rows inside a chunk
    // arrive in any permutation (the operator re-sorts them).
    val base = ts("2024-01-01 10:00:00").getTime
    val checked = runDraws("move") { draw =>
      val r = new java.util.Random(10300L + draw)
      val types = Seq("click", "view", "buy")
      val rows = (1 to 60).map { i =>
        (r.nextInt(5).toLong, types(r.nextInt(3)),
          new Timestamp(base + i * 1000L), (1 + r.nextInt(8)).toDouble)
      }
      def asEvents(df: DataFrame) =
        df.toDF("user_id", "event_type", "ts", "value")
      val expected = Streams.movementDetector(spark,
          asEvents(rows.toDF()), threshold = 0.5)
        .select(col("user_id"), col("event_type"), col("ts").cast("long"),
          col("prev_value"), col("value"), col("rel_change"))
        .as[(Long, String, Long, Double, Double, Double)]
        .collect().sorted.toSeq
      val mem = MemoryStream[(Long, String, Timestamp, Double)]
      val qn = s"fz_move_$draw"
      val q = Streams.movementDetector(spark, asEvents(mem.toDF()),
          threshold = 0.5)
        .writeStream.format("memory").queryName(qn)
        .outputMode("append").start()
      try {
        randomSlices(rows, r, maxBatches = 6, permute = false).foreach {
          chunk =>
            val shuffled =
              scala.util.Random.javaRandomToRandom(r).shuffle(chunk)
            mem.addData(shuffled: _*); q.processAllAvailable()
        }
        val got = spark.table(qn)
          .select(col("user_id"), col("event_type"), col("ts").cast("long"),
            col("prev_value"), col("value"), col("rel_change"))
          .as[(Long, String, Long, Double, Double, Double)]
          .collect().sorted.toSeq
        assert(got === expected, s"draw=$draw: movements != batch twin")
      } finally q.stop()
    }
    assert(checked === DrawsPerFamily)
  }

  test(s"job state machine: $DrawsPerFamily random in-order slicings " +
      "with intra-batch shuffles match an independent transition fold") {
    implicit val sqlCtx = spark.sqlContext
    // independent Scala oracle (not the operator on batch): per job id,
    // fold events in (event_ts) order — unique by construction — applying
    // terminal absorption: every event moves a non-terminal job to its
    // status and emits it; completed/failed/expired never transition.
    // scheduled_for sits days past the event span, so the event-time
    // timeout (scheduled_for + 45 min vs watermark) can never fire and
    // the contract under test is pure transition order.
    val base = ts("2024-01-01 10:00:00").getTime
    val sched = ts("2024-01-05 00:00:00")
    val statuses = Seq("pending", "pending", "completed", "failed")
    val checked = runDraws("jobs") { draw =>
      val r = new java.util.Random(10400L + draw)
      val rows = (1 to 60).map { i =>
        (s"job${r.nextInt(6)}", statuses(r.nextInt(4)), sched,
          new Timestamp(base + i * 1000L))
      }
      val expected = rows.groupBy(_._1).toSeq.flatMap { case (_, evs) =>
        val out = scala.collection.mutable.ArrayBuffer
          .empty[(String, String)]
        var cur: Option[String] = None
        evs.sortBy(_._4.getTime).foreach { ev =>
          if (!cur.exists(_ != "pending")) { cur = Some(ev._2); out += ((ev._1, ev._2)) }
        }
        out
      }.sorted
      def asJobs(df: DataFrame) =
        df.toDF("id", "status", "scheduled_for", "event_ts")
      val mem = MemoryStream[(String, String, Timestamp, Timestamp)]
      val qn = s"fz_jobs_$draw"
      val q = Streams.jobStateMachine(spark, asJobs(mem.toDF()))
        .writeStream.format("memory").queryName(qn)
        .outputMode("append").start()
      try {
        randomSlices(rows, r, maxBatches = 6, permute = false).foreach {
          chunk =>
            val shuffled =
              scala.util.Random.javaRandomToRandom(r).shuffle(chunk)
            mem.addData(shuffled: _*); q.processAllAvailable()
        }
        val got = spark.table(qn).select("id", "status")
          .as[(String, String)].collect().sorted.toSeq
        assert(got === expected, s"draw=$draw: transitions != oracle fold")
      } finally q.stop()
    }
    assert(checked === DrawsPerFamily)
  }

  test(s"sliding movement alert: $DrawsPerFamily random " +
      "permutations+slicings equal the batch twin") {
    implicit val sqlCtx = spark.sqlContext
    // windowed min/max aggregation: with all real rows inside the 25-min
    // span (< the 30-min watermark), ANY permutation + slicing is legal
    // disorder; two far-future sentinel batches close the open windows.
    val base = ts("2024-01-01 10:00:00").getTime
    val checked = runDraws("alert") { draw =>
      val r = new java.util.Random(10500L + draw)
      val types = Seq("click", "view", "buy")
      val rows = (1 to 60).map { i =>
        (i.toLong, new Timestamp(base + r.nextInt(25 * 60) * 1000L),
          r.nextInt(5).toLong, types(r.nextInt(3)),
          (1 + r.nextInt(8)).toDouble)
      }
      def asEvents(df: DataFrame) =
        df.toDF("event_id", "ts", "user_id", "event_type", "value")
      val expected = Streams.slidingMovementAlert(asEvents(rows.toDF()),
          threshold = 0.5)
        .select(col("window_start").cast("long"), col("user_id"),
          col("event_type"), col("min_v"), col("max_v"), col("n"))
        .as[(Long, Long, String, Double, Double, Long)]
        .collect().sorted.toSeq
      val mem = MemoryStream[(Long, Timestamp, Long, String, Double)]
      val qn = s"fz_alert_$draw"
      val q = Streams.slidingMovementAlert(asEvents(mem.toDF()),
          threshold = 0.5)
        .writeStream.format("memory").queryName(qn)
        .outputMode("append").start()
      try {
        randomSlices(rows, r, maxBatches = 5, permute = true).foreach {
          chunk => mem.addData(chunk: _*); q.processAllAvailable()
        }
        // sentinel user 999 advances the watermark twice; its own windows
        // are excluded from the comparison (min==max → filtered anyway,
        // but the id guard keeps the contract explicit)
        mem.addData((9001L, ts("2024-01-01 16:00:00"), 999L, "zz", 1.0))
        q.processAllAvailable()
        mem.addData((9002L, ts("2024-01-01 20:00:00"), 999L, "zz", 1.0))
        q.processAllAvailable()
        val got = spark.table(qn)
          .filter(col("user_id") =!= 999L)
          .select(col("window_start").cast("long"), col("user_id"),
            col("event_type"), col("min_v"), col("max_v"), col("n"))
          .as[(Long, Long, String, Double, Double, Long)]
          .collect().sorted.toSeq
        assert(got === expected, s"draw=$draw: alerts != batch twin")
      } finally q.stop()
    }
    assert(checked === DrawsPerFamily)
  }

  test(s"PSI drift: $DrawsPerFamily random permutations+slicings match " +
      "the batch PSI bit-for-bit") {
    implicit val sqlCtx = spark.sqlContext
    // chained stateful aggs ((window,bucket) counts -> per-window fold):
    // all rows in one 25-min span, so any permutation is within-watermark
    // disorder for both levels; two sentinel batches close the day
    val base = ts("2024-01-01 10:00:00").getTime
    val ref = Seq("click" -> 3L, "view" -> 3L, "purchase" -> 2L)
    val types = Seq("click", "view", "purchase", "signup") // signup ∉ ref
    val checked = runDraws("psi") { draw =>
      val r = new java.util.Random(14100L + draw)
      val rows = (1 to 50).map { i =>
        (i.toLong, new Timestamp(base + r.nextInt(25 * 60) * 1000L),
          r.nextInt(9).toLong, types(r.nextInt(4)), 1.0)
      }
      val expected = Streams.psiDriftStream(
          rows.toDF("event_id", "ts", "user_id", "event_type", "value"),
          "event_type", ref)
        .select("n_events", "psi64")
        .as[(Long, Long)].collect().sorted.toSeq
      val mem = MemoryStream[(Long, Timestamp, Long, String, Double)]
      val qn = s"fz_psi_$draw"
      val q = Streams.psiDriftStream(
          mem.toDF().toDF("event_id", "ts", "user_id", "event_type",
            "value"), "event_type", ref)
        .writeStream.format("memory").queryName(qn)
        .outputMode("append").start()
      try {
        randomSlices(rows, r, maxBatches = 5, permute = true).foreach {
          chunk => mem.addData(chunk: _*); q.processAllAvailable()
        }
        mem.addData((9001L, ts("2024-01-02 12:00:00"), 1L, "zz", 1.0))
        q.processAllAvailable()
        mem.addData((9002L, ts("2024-01-03 12:00:00"), 1L, "zz", 1.0))
        q.processAllAvailable()
        val got = spark.table(qn)
          .filter(col("day_start") === ts("2024-01-01 00:00:00"))
          .select("n_events", "psi64")
          .as[(Long, Long)].collect().sorted.toSeq
        assert(got === expected, s"draw=$draw: PSI != batch twin")
      } finally q.stop()
    }
    assert(checked === DrawsPerFamily)
  }

  test(s"entropy monitor: $DrawsPerFamily random permutations+slicings " +
      "match the batch entropy bit-for-bit") {
    implicit val sqlCtx = spark.sqlContext
    // same chained-agg discipline as PSI; values exercise the [0,19]
    // bucket clamp on both ends (negatives and >500)
    val base = ts("2024-01-01 10:00:00").getTime
    val types = Seq("click", "view")
    val checked = runDraws("entropy") { draw =>
      val r = new java.util.Random(14200L + draw)
      val rows = (1 to 50).map { i =>
        (i.toLong, new Timestamp(base + r.nextInt(25 * 60) * 1000L),
          r.nextInt(9).toLong, types(r.nextInt(2)),
          -50.0 + r.nextInt(650))
      }
      val expected = Streams.entropyMonitorStream(
          rows.toDF("event_id", "ts", "user_id", "event_type", "value"))
        .select("event_type", "n_events", "n_buckets", "ent_x64")
        .as[(String, Long, Long, Long)].collect().sorted.toSeq
      val mem = MemoryStream[(Long, Timestamp, Long, String, Double)]
      val qn = s"fz_ent_$draw"
      val q = Streams.entropyMonitorStream(
          mem.toDF().toDF("event_id", "ts", "user_id", "event_type",
            "value"))
        .writeStream.format("memory").queryName(qn)
        .outputMode("append").start()
      try {
        randomSlices(rows, r, maxBatches = 5, permute = true).foreach {
          chunk => mem.addData(chunk: _*); q.processAllAvailable()
        }
        mem.addData((9001L, ts("2024-01-02 12:00:00"), 1L, "zz", 1.0))
        q.processAllAvailable()
        mem.addData((9002L, ts("2024-01-03 12:00:00"), 1L, "zz", 1.0))
        q.processAllAvailable()
        val got = spark.table(qn)
          .filter(col("day_start") === ts("2024-01-01 00:00:00"))
          .select("event_type", "n_events", "n_buckets", "ent_x64")
          .as[(String, Long, Long, Long)].collect().sorted.toSeq
        assert(got === expected, s"draw=$draw: entropy != batch twin")
      } finally q.stop()
    }
    assert(checked === DrawsPerFamily)
  }

  test(s"near-dup candidates: $DrawsPerFamily random permutations+" +
      "slicings flag exactly the batch band collisions") {
    implicit val sqlCtx = spark.sqlContext
    // stream-static band join + within-horizon pair dedup: the emitted
    // (id_new, id_corpus) SET is order-independent (first arrival wins
    // WHICH band emits, not whether the pair emits)
    val base = ts("2024-01-01 10:00:00").getTime
    val corpusTexts = Seq(
      "the quick brown fox jumps over the lazy dog again and again today",
      "structured streaming keeps bounded state per key and evicts by "
        + "watermark which makes the join runnable forever",
      "entirely different corpus content about databases and planning")
    val variants = corpusTexts.flatMap(t => Seq(t, t + " tail",
      t.replace("the", "a"))) ++ Seq(
      "completely unrelated text with no overlap whatsoever in shingles",
      "another singleton document about cooking pasta with fresh basil")
    val checked = runDraws("neardup") { draw =>
      val r = new java.util.Random(14300L + draw)
      val corpus = corpusTexts.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val corpusBands = graft.operators.Dedup.corpusBandTable(
        corpus, "doc_id", "text")
      val rows = (1 to 30).map { i =>
        (100L + i, new Timestamp(base + r.nextInt(25 * 60) * 1000L),
          variants(r.nextInt(variants.size)))
      }
      val incomingBands = graft.operators.Dedup.corpusBandTable(
          rows.toDF("doc_id", "ts", "text"), "doc_id", "text")
        .withColumnRenamed("id_corpus", "id_new")
      val expected = incomingBands
        .join(corpusBands, Seq("band", "bucket"))
        .select(col("id_new"), col("id_corpus"))
        .distinct().as[(Long, Long)].collect().sorted.toSeq
      val mem = MemoryStream[(Long, Timestamp, String)]
      val qn = s"fz_nd_$draw"
      val q = Streams.nearDupCandidateStream(
          mem.toDF().toDF("doc_id", "ts", "text"), corpusBands,
          "ts", "doc_id", "text", watermark = "1 hour")
        .writeStream.format("memory").queryName(qn)
        .outputMode("append").start()
      try {
        randomSlices(rows, r, maxBatches = 5, permute = true).foreach {
          chunk => mem.addData(chunk: _*); q.processAllAvailable()
        }
        val got = spark.table(qn)
          .as[(Long, Long)].collect().sorted.toSeq
        assert(got === expected, s"draw=$draw: candidate pairs != batch")
      } finally q.stop()
    }
    assert(checked === DrawsPerFamily)
  }

  test(s"SCD2 enrich: $DrawsPerFamily random permutations+slicings " +
      "reproduce the as-of-event-time enrichment") {
    implicit val sqlCtx = spark.sqlContext
    // STATELESS stream-static broadcast interval join: slicing can't
    // change per-row results by construction — the pin guards exactly
    // that construction (a future stateful rewrite would fail here)
    val checked = runDraws("scd2") { draw =>
      val r = new java.util.Random(14400L + draw)
      // 3 keys x 2-3 versions; version boundaries at 08:00/12:00/15:00
      val changes = (for (k <- 0L to 2L) yield {
        val n = 2 + r.nextInt(2)
        (0 until n).map(v => (k,
          ts(s"2024-01-01 ${Seq("08", "12", "15")(v)}:00:00"),
          k * 10 + v, s"v${k}_$v"))
      }).flatten
      val dim = graft.operators.Joins.scd2History(
        changes.toDF("k", "ts", "id", "v"), Seq("k"), "ts", "id", "v")
        .localCheckpoint(true) // one deterministic dim per draw
      val base = ts("2024-01-01 06:00:00").getTime
      val rows = (1 to 40).map { i =>
        (i.toLong, new Timestamp(base + r.nextInt(12 * 3600) * 1000L),
          r.nextInt(4).toLong, "click", 1.0) // key 3 has no history
      }
      def enrich(df: DataFrame) =
        Streams.scd2EnrichStream(
          df.toDF("event_id", "ts", "user_id", "event_type", "value"),
          "user_id", dim, "k", "v")
      val expected = enrich(rows.toDF())
        .select("event_id", "dim_value")
        .as[(Long, Option[String])].collect().sorted.toSeq
      val mem = MemoryStream[(Long, Timestamp, Long, String, Double)]
      val qn = s"fz_scd2_$draw"
      val q = enrich(mem.toDF())
        .select("event_id", "dim_value")
        .writeStream.format("memory").queryName(qn)
        .outputMode("append").start()
      try {
        randomSlices(rows, r, maxBatches = 5, permute = true).foreach {
          chunk => mem.addData(chunk: _*); q.processAllAvailable()
        }
        val got = spark.table(qn)
          .as[(Long, Option[String])].collect().sorted.toSeq
        assert(got === expected, s"draw=$draw: enrichment != batch")
      } finally q.stop()
    }
    assert(checked === DrawsPerFamily)
  }
}
