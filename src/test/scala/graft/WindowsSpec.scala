package graft

import java.sql.Timestamp
import graft.operators.Windows
import org.apache.spark.sql.functions._

class WindowsSpec extends SparkSpec {
  import spark.implicits._

  def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("latestPerGroup breaks timestamp ties with the tiebreaker") {
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100L, 1.0),
      (2L, ts("2024-01-01 10:00:00"), 100L, 2.0), // same ts, higher id wins
      (3L, ts("2024-01-01 09:00:00"), 200L, 3.0))
      .toDF("event_id", "ts", "user_id", "value")
    val out = Windows.latestPerGroup(df, Seq("user_id"), "ts", "event_id")
      .orderBy("user_id").collect()
    assert(out.map(_.getAs[Long]("event_id")).toSeq === Seq(2L, 3L))
  }

  test("asOfJoin picks latest right row at/before left ts, per key") {
    val orders = Seq(
      (10L, 1L, ts("2024-01-05 00:00:00")),
      (11L, 1L, ts("2024-01-01 00:00:00")), // before any event → null
      (12L, 2L, ts("2024-01-03 00:00:00")),
      (13L, 3L, ts("2024-01-04 00:00:00"))) // user with no events → null
      .toDF("o_orderkey", "k", "o_orderdate")
    val events = Seq(
      (100L, 1L, ts("2024-01-02 00:00:00"), 10.0),
      (101L, 1L, ts("2024-01-04 00:00:00"), 20.0),
      (102L, 2L, ts("2024-01-03 00:00:00"), 30.0)) // equal ts → included (<=)
      .toDF("event_id", "k", "ts", "value")
    val out = Windows.asOfJoin(orders, events, "k", "o_orderdate", "ts",
      Seq("value", "event_id"), "event_id")
      .orderBy("o_orderkey").collect()
    assert(out.map(r => Option(r.getAs[java.lang.Double]("asof_value")).map(_.toDouble)).toSeq
      === Seq(Some(20.0), None, Some(30.0), None))
  }

  test("asOfJoin: a NULL attribute on the as-of row stays null (all-or-nothing)") {
    // the as-of quote (latest <= probe ts) has value = null; the older quote
    // has 10.0 — the output must carry the AS-OF row's null, never backfill
    // from an older row (attributes always come from the same right row)
    val probe = Seq((1L, 1L, ts("2024-01-05 00:00:00")))
      .toDF("o_orderkey", "k", "o_orderdate")
    val quotes = Seq(
      (100L, 1L, ts("2024-01-02 00:00:00"), Some(10.0)),
      (101L, 1L, ts("2024-01-04 00:00:00"), None: Option[Double]))
      .toDF("event_id", "k", "ts", "value")
    val r = Windows.asOfJoin(probe, quotes, "k", "o_orderdate", "ts",
      Seq("value", "event_id"), "event_id").head
    assert(r.isNullAt(r.fieldIndex("asof_value")),
      "null attribute backfilled from an older quote")
    assert(r.getAs[Long]("asof_event_id") === 101L)
  }

  test("asOfJoinKeys: composite key isolates families, sides may name keys differently") {
    // same customer, two event families: the as-of match must come from the
    // SAME family — a single-key join would leak family B's later quote
    // into family A's probe
    val probe = Seq(
      (10L, 1L, "A", ts("2024-01-05 00:00:00")),
      (11L, 1L, "B", ts("2024-01-05 00:00:00")),
      (12L, 1L, "C", ts("2024-01-05 00:00:00"))) // family with no quotes
      .toDF("o_orderkey", "cust", "fam", "o_orderdate")
    val quotes = Seq(
      (100L, 1L, "A", ts("2024-01-02 00:00:00"), 10.0),
      (101L, 1L, "B", ts("2024-01-04 00:00:00"), 20.0),
      (102L, 2L, "A", ts("2024-01-04 12:00:00"), 99.0)) // other customer
      .toDF("event_id", "user_id", "event_type", "ts", "value")
    val out = Windows.asOfJoinKeys(probe, quotes,
        Seq("cust" -> "user_id", "fam" -> "event_type"),
        "o_orderdate", "ts", Seq("value", "event_id"), "event_id")
      .orderBy("o_orderkey").collect()
    assert(out.map(r => Option(r.getAs[java.lang.Double]("asof_value"))
      .map(_.toDouble)).toSeq === Seq(Some(10.0), Some(20.0), None))
    // single-key delegate unchanged: asOfJoin(key) ≡ asOfJoinKeys(Seq(key->key))
    val single = Windows.asOfJoin(
      probe.withColumnRenamed("cust", "user_id"), quotes, "user_id",
      "o_orderdate", "ts", Seq("value", "event_id"), "event_id")
      .orderBy("o_orderkey").collect()
    // without the family key, every probe of customer 1 sees family B's
    // 2024-01-04 quote (the latest regardless of family)
    assert(single.map(_.getAs[Double]("asof_value")).toSeq
      === Seq(20.0, 20.0, 20.0))
  }

  test("firstLastPctChange: first/last by (ts, tiebreak)") {
    val df = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, 10.0),
      (2L, ts("2024-01-02 00:00:00"), 1L, 15.0),
      (3L, ts("2024-01-03 00:00:00"), 1L, 20.0))
      .toDF("event_id", "ts", "user_id", "value")
    val r = Windows.firstLastPctChange(df, Seq("user_id"), "ts", "event_id",
      "value").head
    assert(r.getAs[Double]("first_value") === 10.0)
    assert(r.getAs[Double]("last_value") === 20.0)
    assert(r.getAs[Double]("pct_change") === 100.0)
  }

  test("sessionizeKeyedGap: per-key gap splits where global gap would not") {
    // two keys, identical 10-minute event spacing; key 1 has a 5-min gap
    // (every event starts a session), key 2 a 60-min gap (one session),
    // key 3 is unconfigured and takes the 30-min default (one session)
    val events = (1 to 3).flatMap { k =>
      (0 until 4).map { i =>
        (k * 10L + i, ts(f"2024-01-01 10:${i * 10}%02d:00"), k.toLong, 1.0)
      }
    }.toDF("event_id", "ts", "user_id", "value")
    val gaps = Seq((1L, 5), (2L, 60)).toDF("user_id", "gap_minutes")
    val out = Windows.sessionizeKeyedGap(events, "user_id", "ts", "event_id",
      "value", gaps, "gap_minutes", defaultGapMinutes = 30)
    val perKey = out.groupBy("user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perKey === Map(1L -> 4L, 2L -> 1L, 3L -> 1L))
    // global-gap sessionize at 30 min cannot produce key 1's split
    val global = Windows.sessionize(events, "user_id", "ts", "event_id",
      "value", gapMinutes = 30)
    assert(global.filter(col("user_id") === 1).count() === 1L)
  }

  test("withLagMovement computes relative change per key") {
    val df = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, "a", 10.0),
      (2L, ts("2024-01-02 00:00:00"), 1L, "a", 12.0),
      (3L, ts("2024-01-01 00:00:00"), 1L, "b", 5.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = Windows.withLagMovement(df, Seq("user_id", "event_type"),
      "ts", "event_id", "value")
      .filter(col("rel_change").isNotNull).collect()
    assert(out.length === 1)
    assert(math.abs(out.head.getAs[Double]("rel_change") - 0.2) < 1e-12)
  }

  test("cohortRetention: two cohorts, offsets count returning users only") {
    // user 1 starts week of Jan 1 (Mon), active weeks 0 and 2
    // user 2 starts week of Jan 8, active weeks 0 and 1
    // user 3 starts week of Jan 1, active week 0 only
    val df = Seq(
      (1L, ts("2024-01-02 10:00:00")), (1L, ts("2024-01-03 10:00:00")),
      (1L, ts("2024-01-16 10:00:00")),
      (2L, ts("2024-01-09 10:00:00")), (2L, ts("2024-01-15 10:00:00")),
      (3L, ts("2024-01-04 10:00:00")))
      .toDF("user_id", "ts")
    val out = Windows.cohortRetention(df, "user_id", "ts")
      .orderBy("cohort_week", "week_offset")
      .as[(String, Long, Long)].collect()
    assert(out === Seq(
      ("2024-01-01", 0L, 2L), // users 1 and 3 in week 0
      ("2024-01-01", 2L, 1L), // user 1 returns at offset 2
      ("2024-01-08", 0L, 1L),
      ("2024-01-08", 1L, 1L)))
  }

  test("rollingRange: trailing frame includes boundary, excludes older") {
    val win = 3600000000L // 1 hour in us
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, 1.0),
      (1L, ts("2024-01-01 11:00:00"), 2L, 2.0), // exactly 1h later: inside
      (1L, ts("2024-01-01 12:00:01"), 3L, 4.0)) // 1h1s after #2: only itself
      .toDF("user_id", "ts", "event_id", "value")
    val out = Windows.rollingRange(df, "user_id", "ts", "event_id",
      "value", win).orderBy("event_id")
      .select("event_id", "n_win", "sum_win")
      .as[(Long, Long, Double)].collect()
    assert(out === Seq((1L, 1L, 1.0), (2L, 2L, 3.0), (3L, 1L, 4.0)))
  }

  test("intervalMerge: a long interval swallows later shorter ones") {
    // user 1: [10:00, +60m) swallows [10:10, +5m) AND [10:30, +5m);
    //         [11:30, +10m) starts a new island (11:30 > 11:00 end)
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, 60.0),
      (1L, ts("2024-01-01 10:10:00"), 2L, 5.0),
      (1L, ts("2024-01-01 10:30:00"), 3L, 5.0),
      (1L, ts("2024-01-01 11:30:00"), 4L, 10.0))
      .toDF("user_id", "ts", "event_id", "value")
    val out = Windows.intervalMerge(df, "user_id", "ts", "event_id",
        (col("value") * 60000000L).cast("long"))
      .select("island_id", "n_intervals").as[(Long, Long)].collect()
    assert(out.toSeq === Seq((1L, 3L), (2L, 1L)))
    // a lag-gap sessionizer would split after event 3 (gap 10:35→11:30 vs
    // the true island end 11:00) — the running-max-of-end must not
  }

  test("intervalMerge: exact end boundary does NOT merge (half-open)") {
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, 30.0),
      (1L, ts("2024-01-01 10:30:00"), 2L, 30.0)) // starts exactly at prev end
      .toDF("user_id", "ts", "event_id", "value")
    val out = Windows.intervalMerge(df, "user_id", "ts", "event_id",
        (col("value") * 60000000L).cast("long"))
      .select("island_id").as[Long].collect()
    assert(out.toSeq === Seq(1L, 2L))
  }

  test("lastTouchAttribution: horizon cutoff and preceding-only carry") {
    val horizon = 3600000000L // 1h
    val df = Seq(
      (1L, ts("2024-01-01 09:30:00"), 1L, "click"),
      (1L, ts("2024-01-01 10:00:00"), 2L, "purchase"), // ← click, 30m old
      (1L, ts("2024-01-01 13:00:00"), 3L, "purchase"), // click 3.5h old → none
      (2L, ts("2024-01-01 10:00:00"), 4L, "purchase"), // no prior touch → none
      (2L, ts("2024-01-01 10:30:00"), 5L, "view"),
      (2L, ts("2024-01-01 11:00:00"), 6L, "purchase")) // ← view
      .toDF("user_id", "ts", "event_id", "event_type")
    val out = Windows.lastTouchAttribution(df, "user_id", "ts", "event_id",
        "event_type", "purchase", horizon)
      .as[(String, Long)].collect().toMap
    assert(out === Map("click" -> 1L, "none" -> 2L, "view" -> 1L))
  }

  test("lastTouchAttribution: a purchase is never its own touch") {
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "purchase"),
      (1L, ts("2024-01-01 10:05:00"), 2L, "purchase"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val out = Windows.lastTouchAttribution(df, "user_id", "ts", "event_id",
        "event_type", "purchase", 3600000000L)
      .as[(String, Long)].collect().toMap
    assert(out === Map("none" -> 2L))
  }

  test("rollingRange: timestamp ties are peers — same frame for both rows") {
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, 1.0),
      (1L, ts("2024-01-01 10:00:00"), 2L, 2.0))
      .toDF("user_id", "ts", "event_id", "value")
    val out = Windows.rollingRange(df, "user_id", "ts", "event_id",
      "value", 1000000L).select("event_id", "n_win", "sum_win")
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    // RANGE frame: both peer rows see both rows
    assert(out === Seq((1L, 2L, 3.0), (2L, 2L, 3.0)))
  }
}
