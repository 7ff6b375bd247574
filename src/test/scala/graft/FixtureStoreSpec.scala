package graft

import graft.operators.{FixtureStore, Joins}
import graft.sources.Sources
import org.apache.spark.sql.functions._

class FixtureStoreSpec extends SparkSpec {
  import spark.implicits._

  test("N1 orchestrator: one payload frame fans out to warehouse tables") {
    val js = (phase: String, ts: String, price: Double) =>
      s"""{"fixture_id": 1, "collection_type": "$phase",
          "collected_at": "$ts",
          "data": {"odds_early": {"home_team": "A", "away_team": "B",
            "bookmakers": [{"key": "bk", "title": "BK", "markets": [
              {"key": "h2h", "outcomes": [
                {"name": "A", "price": $price},
                {"name": "Draw", "price": 3.0},
                {"name": "B", "price": 4.0}]}]}]}}}"""
    val payloads = spark.read.schema(Sources.payloadSchema)
      .json(Seq(
        js("early_odds", "2025-08-20T10:00:00+00:00", 2.0),
        js("final_data", "2025-08-22T14:00:00+00:00", 2.5)).toDS())
      .select(col("fixture_id"),
        to_timestamp(col("collected_at")).as("collected_at"),
        col("collection_type").as("collection_phase"),
        col("data.odds_early").as("event"))
    val tables = FixtureStore.derive(payloads)
    assert(tables("odds_history").count() === 2)
    assert(tables("fixtures").count() === 1)
    val latest = tables("odds_latest").collect()
    assert(latest.length === 1)
    assert(latest.head.getAs[Double]("home_odds") === 2.5) // newest snapshot
  }

  test("ST8: warehouse write partitions by date; retention drops old ones") {
    val tmp = java.nio.file.Files.createTempDirectory("wh").toString
    val df = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1.0),
      (2L, java.sql.Timestamp.valueOf("2024-01-15 10:00:00"), 2.0),
      (3L, java.sql.Timestamp.valueOf("2024-02-01 10:00:00"), 3.0))
      .toDF("id", "ts", "v")
    Sources.writeWarehouse(df, tmp, "ts", Seq("id"))
    val partsBefore = new java.io.File(tmp).listFiles()
      .count(_.getName.startsWith("__p_date="))
    assert(partsBefore === 3)
    val dropped = FixtureStore.dropExpiredPartitions(tmp,
      java.time.LocalDate.parse("2024-01-10"))
    assert(dropped === Seq("2024-01-01"))
    assert(spark.read.parquet(tmp).count() === 2) // partition pruned away
  }

  test("S5: ORC warehouse round-trips with partition pruning intact") {
    val tmp = java.nio.file.Files.createTempDirectory("whorc").toString
    val df = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1.0),
      (2L, java.sql.Timestamp.valueOf("2024-01-15 10:00:00"), 2.0),
      (3L, java.sql.Timestamp.valueOf("2024-01-15 11:00:00"), 3.0))
      .toDF("id", "ts", "v")
    Sources.writeWarehouse(df, tmp, "ts", Seq("id"), format = "orc")
    assert(new java.io.File(tmp, "__p_date=2024-01-15").listFiles()
      .exists(_.getName.endsWith(".orc")))
    val back = spark.read.orc(tmp)
    assert(back.count() === 3)
    // partition pruning: the date filter must reach the scan as a
    // PartitionFilter, not a post-scan predicate
    val pruned = back.filter(col("__p_date") ===
      java.sql.Date.valueOf("2024-01-15"))
    assert(pruned.select("id").as[Long].collect().sorted === Seq(2L, 3L))
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("__p_date"), "date filter did not prune partitions")
    // unsupported container rejected loudly
    intercept[IllegalArgumentException] {
      Sources.writeWarehouse(df, tmp, "ts", Seq("id"), format = "csv")
    }
  }

  test("compactWarehouse: small files collapse to one per partition, data intact") {
    val tmp = java.nio.file.Files.createTempDirectory("whc").toString
    val mk = (ids: Seq[Long]) => ids.map(i =>
      (i, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), i * 1.0))
      .toDF("id", "ts", "v")
    // three appends = at least three files in the one date partition
    // (streaming-ingest accumulation shape)
    Sources.writeWarehouse(mk(Seq(1L, 2L)), tmp, "ts", Seq("id"))
    Sources.writeWarehouse(mk(Seq(3L, 4L)), tmp, "ts", Seq("id"))
    Sources.writeWarehouse(mk(Seq(5L)), tmp, "ts", Seq("id"))
    def files() = new java.io.File(tmp, "__p_date=2024-01-01").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(files() >= 3)
    val before = spark.read.parquet(tmp).select("id", "v")
      .as[(Long, Double)].collect().toSet
    Sources.compactWarehouse(spark, tmp, Seq("id"))
    assert(files() === 1)
    val after = spark.read.parquet(tmp).select("id", "v")
      .as[(Long, Double)].collect().toSet
    assert(after === before)
  }

  test("compactWarehouse: re-run recovers a partition stranded at .bak by a mid-swap crash") {
    val tmp = java.nio.file.Files.createTempDirectory("whr").toString
    val rows = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1.0),
      (2L, java.sql.Timestamp.valueOf("2024-01-02 10:00:00"), 2.0))
      .toDF("id", "ts", "v")
    Sources.writeWarehouse(rows, tmp, "ts", Seq("id"))
    val before = spark.read.parquet(tmp).select("id", "v")
      .as[(Long, Double)].collect().toSet
    assert(before.size === 2)
    // simulate a crash INSIDE the two-rename window of day 1: the live dir
    // has been renamed aside to <tmp>/<partition>.bak and nothing replaced
    // it yet — the .bak is the ONLY copy of that partition
    val tmpRoot = new java.io.File(tmp + ".compact.tmp")
    assert(tmpRoot.mkdirs())
    val live = new java.io.File(tmp, "__p_date=2024-01-01")
    val bak = new java.io.File(tmpRoot, "__p_date=2024-01-01.bak")
    assert(live.renameTo(bak))
    assert(!live.exists())
    // the documented recovery is "re-run compaction": it must restore the
    // .bak BEFORE its Overwrite write deletes the tmp root
    Sources.compactWarehouse(spark, tmp, Seq("id"))
    val after = spark.read.parquet(tmp).select("id", "v")
      .as[(Long, Double)].collect().toSet
    assert(after === before)
    assert(!tmpRoot.exists())
  }

  test("J5 pure-range join via date bucketing") {
    val events = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-05 12:00:00")),
      (2L, java.sql.Timestamp.valueOf("2024-01-20 12:00:00")))
      .toDF("event_id", "ts")
    val anchors = Seq(
      ("w1", java.sql.Timestamp.valueOf("2024-01-04 00:00:00"),
        java.sql.Timestamp.valueOf("2024-01-06 23:59:59")),
      ("w2", java.sql.Timestamp.valueOf("2024-01-10 00:00:00"),
        java.sql.Timestamp.valueOf("2024-01-12 23:59:59")))
      .toDF("name", "start_ts", "end_ts")
    val out = Joins.bucketedRangeJoin(events, anchors, "ts",
      "start_ts", "end_ts")
      .select("event_id", "name").as[(Long, String)].collect().toSet
    assert(out === Set((1L, "w1")))
  }
}
