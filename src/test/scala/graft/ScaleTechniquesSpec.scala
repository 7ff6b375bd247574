package graft

import graft.operators.Joins
import org.apache.spark.sql.functions._

/** Scale-technique demonstrations: bucketed co-located joins (shuffle-free)
  * and skew salting — the physical-design levers ARCHITECTURE.md commits to
  * for the 100 TB posture, proven at the plan level here. */
class ScaleTechniquesSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables join without a shuffle exchange") {
    // tables land in the default ./spark-warehouse (gitignored); the
    // warehouse dir is a static conf and the suite session is shared.
    // The metastore is per-JVM but the location persists — clear leftovers
    // from previous runs or CREATE fails with LOCATION_ALREADY_EXISTS.
    Seq("ev_bucketed", "cust_bucketed").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) {
        loc.listFiles().foreach(_.delete()); loc.delete()
      }
    }
    val ev = Tables.events(spark, sfDir)
    val cust = Tables.customer(spark, sfDir)
      .withColumnRenamed("c_custkey", "user_id")
    ev.write.mode("overwrite")
      .bucketBy(8, "user_id").sortBy("user_id")
      .saveAsTable("ev_bucketed")
    cust.write.mode("overwrite")
      .bucketBy(8, "user_id").sortBy("user_id")
      .saveAsTable("cust_bucketed")
    // disable auto-broadcast so the join would otherwise need a shuffle
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val joined = spark.table("ev_bucketed")
        .join(spark.table("cust_bucketed"), Seq("user_id"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n$plan")
      assert(joined.count() ===
        ev.join(cust, Seq("user_id")).count())
    }
  }

  private def withSQLConf[T](pairs: (String, String)*)(f: => T): T = {
    val olds = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("applyChanges: update replaces, delete drops, insert adds, rest pass") {
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "s", "v")
    val changes = Seq(
      (2L, "B", 99.0, false),  // update
      (3L, "c", 30.0, true),   // delete
      (9L, "new", 1.0, false)) // insert
      .toDF("k", "s", "v", "is_delete")
    val out = Joins.applyChanges(base, changes, "k", "is_delete")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2)))
      .toMap
    assert(out === Map(
      1L -> (("a", 10.0)),   // untouched base row passes through
      2L -> (("B", 99.0)),   // change wins wholesale
      9L -> (("new", 1.0)))) // inserted; 3 deleted
  }

  test("snapshotDiff: classes are exact incl. null-valued changes") {
    val a = Seq((1L, Some("x"), 1.0), (2L, Some("y"), 2.0),
      (3L, None, 3.0), (4L, Some("z"), 4.0))
      .toDF("k", "s", "v")
    val b = Seq((1L, Some("x"), 1.0),           // unchanged
      (2L, None, 2.0),                           // changed (y → null)
      (3L, None, 3.0),                           // unchanged (null ≡ null)
      (5L, Some("w"), 5.0))                      // added; 4 removed
      .toDF("k", "s", "v")
    val out = Joins.snapshotDiff(a, b, "k", Seq("s", "v"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out === Map(
      "added" -> ((1L, 5L, 5L)),
      "changed" -> ((1L, 2L, 2L)),
      "removed" -> ((1L, 4L, 4L)),
      "unchanged" -> ((2L, 1L, 3L))))
  }

  test("scd2History: change-collapse, interval chaining, high-date current row") {
    val ev = Seq(
      // key (1,"x"): 10.0 -> 10.0 (no change, collapsed) -> 20.0
      (1L, "x", "2024-01-01 10:00:00", 1L, 10.0),
      (1L, "x", "2024-01-01 11:00:00", 2L, 10.0),
      (1L, "x", "2024-01-01 12:00:00", 3L, 20.0),
      // key (2,"y"): single version, stays current
      (2L, "y", "2024-01-01 09:00:00", 4L, 5.0))
      .toDF("user_id", "event_type", "tss", "event_id", "value")
      .select(col("user_id"), col("event_type"),
        col("tss").cast("timestamp").as("ts"), col("event_id"), col("value"))
    val out = Joins.scd2History(ev, Seq("user_id", "event_type"), "ts",
      "event_id", "value")
      .orderBy("user_id", "valid_from")
      .as[(Long, String, Double, String, String, Boolean)].collect()
    assert(out === Seq(
      (1L, "x", 10.0, "2024-01-01 10:00:00.000000",
        "2024-01-01 12:00:00.000000", false),
      (1L, "x", 20.0, "2024-01-01 12:00:00.000000",
        "9999-12-31 00:00:00.000000", true),
      (2L, "y", 5.0, "2024-01-01 09:00:00.000000",
        "9999-12-31 00:00:00.000000", true)))
    // intervals chain: each closed valid_to equals the successor's
    // valid_from; exactly one current row per key
    assert(out.count(_._6) === 2)
  }

  test("scd2History: NULL-safe change detection opens/closes intervals") {
    val ev = Seq(
      // key (1,"x"): 10.0 -> NULL -> NULL (collapsed) -> 10.0
      (1L, "x", "2024-01-01 10:00:00", 1L, Some(10.0)),
      (1L, "x", "2024-01-01 11:00:00", 2L, None),
      (1L, "x", "2024-01-01 12:00:00", 3L, None),
      (1L, "x", "2024-01-01 13:00:00", 4L, Some(10.0)),
      // key (2,"y"): starts NULL — first row always opens an interval
      (2L, "y", "2024-01-01 09:00:00", 5L, None))
      .toDF("user_id", "event_type", "tss", "event_id", "value")
      .select(col("user_id"), col("event_type"),
        col("tss").cast("timestamp").as("ts"), col("event_id"), col("value"))
    val out = Joins.scd2History(ev, Seq("user_id", "event_type"), "ts",
      "event_id", "value")
      .orderBy("user_id", "valid_from")
      .as[(Long, String, Option[Double], String, String, Boolean)].collect()
    assert(out === Seq(
      (1L, "x", Some(10.0), "2024-01-01 10:00:00.000000",
        "2024-01-01 11:00:00.000000", false),
      (1L, "x", None, "2024-01-01 11:00:00.000000",
        "2024-01-01 13:00:00.000000", false),
      (1L, "x", Some(10.0), "2024-01-01 13:00:00.000000",
        "9999-12-31 00:00:00.000000", true),
      (2L, "y", None, "2024-01-01 09:00:00.000000",
        "9999-12-31 00:00:00.000000", true)))
  }

  test("overlapJoin: half-open intersection within the key, touching excluded") {
    val left = Seq((1L, "a", 0L, 5L), (1L, "b", 3L, 8L), (2L, "c", 0L, 10L))
      .toDF("k", "la", "ls", "le")
    val right = Seq((1L, "x", 4L, 6L), (1L, "y", 5L, 9L), (1L, "z", 8L, 12L),
      (2L, "w", 20L, 30L))
      .toDF("k", "ra", "rs", "re")
    val out = graft.operators.Joins.overlapJoin(left, right, Seq("k"),
        "ls", "le", "rs", "re")
      .select(col("la"), col("ra")).as[(String, String)].collect().toSet
    // a[0,5) ∩ x[4,6) ✓; a ∩ y[5,9) ✗ (touching, half-open);
    // b[3,8) ∩ x ✓, ∩ y ✓, ∩ z[8,12) ✗ (touching); key 2 never meets key 1
    assert(out === Set(("a", "x"), ("b", "x"), ("b", "y")))
  }

  test("saltedJoin equals the plain join and spreads the hot key") {
    // heavily skewed probe: 10k rows of key 1, a few of others
    val probe = (Seq.fill(10000)(1L) ++ Seq(2L, 3L)).zipWithIndex
      .toDF("k", "payload")
    val build = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val salted = Joins.saltedJoin(probe, build, "k", saltFactor = 8)
    val plain = probe.join(build, Seq("k"))
    assert(salted.count() === plain.count())
    assert(salted.select(sum(col("payload"))).head.getLong(0) ===
      plain.select(sum(col("payload"))).head.getLong(0))
    // the salted key space actually uses multiple salt values for the hot key
    val saltSpread = probe.filter(col("k") === 1)
      .withColumn("__salt", pmod(hash(probe.columns.map(col): _*), lit(8)))
      .select(countDistinct(col("__salt"))).head.getLong(0)
    assert(saltSpread > 1)
  }

  test("bloomSemiJoin equals the plain semi-join on real data") {
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_extendedprice"))
    val os = Tables.orders(spark, sfDir)
      .filter(col("o_totalprice") > 300000).select(col("o_orderkey"))
    val bloomed = Joins.bloomSemiJoin(li, os, "l_orderkey", "o_orderkey")
    val plain = li.join(os.withColumnRenamed("o_orderkey", "l_orderkey"),
      Seq("l_orderkey"), "left_semi")
    assert(bloomed.count() === plain.count())
    assert(bloomed.agg(sum(col("l_orderkey"))).head.getLong(0) ===
      plain.agg(sum(col("l_orderkey"))).head.getLong(0))
  }

  test("bloom prefilter prunes probe rows before the exact join") {
    // tiny build side: the bitmap rejects almost every foreign probe key
    // pre-join (expected fp ~ (k*|build|/m)^k ~ 1e-16 per probe here)
    val probe = (1L to 10000L).toDF("k")
    val build = Seq(42L, 99L).toDF("bk")
    assert(Joins.bloomSemiJoin(probe, build, "k", "bk").count() === 2L)
    // the bloom STAGE alone already prunes: its pass-set is a superset
    // of the 2 true matches but far below the 10k probe rows
    val passed = Joins.bloomPrefilter(probe, build, "k", "bk").count()
    assert(passed >= 2L && passed <= 10L)
  }

  test("bloomSemiJoin with all-matching build degrades to the plain result") {
    val probe = (1L to 500L).toDF("k")
    val build = (1L to 500L).toDF("bk")
    assert(Joins.bloomSemiJoin(probe, build, "k", "bk").count() === 500L)
  }
}
