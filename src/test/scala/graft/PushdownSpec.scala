package graft

import org.apache.spark.sql.functions._

/** Plan-quality guardrails: filters and projections must reach the parquet
  * scan — a scan reading all columns for a 2-column projection, or
  * post-filtering what parquet could skip, is the kind of regression that
  * only shows up at 100 TB. */
class PushdownSpec extends SparkSpec {

  test("predicate and projection push down to the documents scan") {
    val q = Tables.documents(spark, sfDir)
      .filter(col("doc_id") < 100)
      .select("doc_id", "lang")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("LessThan(doc_id,100)"),
      s"filter not pushed:\n$plan")
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,lang:string>"),
      s"columns not pruned:\n$plan")
  }

  test("events loader prunes columns through the ns->us conversion") {
    val q = Tables.events(spark, sfDir)
      .filter(col("event_type") === "click")
      .select("event_id", "event_type")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("EqualTo(event_type,click)"),
      s"filter not pushed:\n$plan")
    // ts is converted in the loader but must NOT force a full-width read
    assert(!plan.contains("props"), s"unused props column read:\n$plan")
  }

  // The 100x read-cost story rests on pruning actually FIRING on the
  // warehouse layout, not just being available: these pin the plan text.
  test("warehouse read path: partition pruning + sort-col pushdown " +
      "fire in BOTH columnar containers (parquet, orc)") {
    for (fmt <- Seq("parquet", "orc")) {
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft_wh_$fmt").toString
      graft.sources.Sources.writeWarehouse(
        Tables.events(spark, sfDir), dir, "ts", Seq("user_id"), fmt)
      val q = spark.read.format(fmt).load(dir)
        .filter(col("__p_date") ===
          lit(java.sql.Date.valueOf("2024-01-10")) &&
          col("user_id") === 42L)
        .select("event_id", "user_id")
      val plan = q.queryExecution.executedPlan.toString
      // date predicate must prune at FILE LISTING time (PartitionFilters,
      // not a post-scan Filter) — the warehouse's replacement for the
      // reference's SQLite time index
      assert(plan.contains("PartitionFilters: [") &&
        !plan.replaceAll("\\s", "").contains("PartitionFilters:[]"),
        s"[$fmt] no partition filter:\n$plan")
      assert(plan.contains("__p_date"),
        s"[$fmt] partition filter not on __p_date:\n$plan")
      // the sort-col predicate must reach the container's row-group /
      // stripe stats (PushedFilters) — the replacement for the key index
      assert(plan.contains("PushedFilters: [") &&
        plan.contains("EqualTo(user_id,42)"),
        s"[$fmt] user_id predicate not pushed:\n$plan")
      // and the partition count actually selected must be 1 of many
      val scanLine = plan.linesIterator
        .find(_.contains("PartitionFilters")).getOrElse("")
      assert(!scanLine.isEmpty, s"[$fmt] no scan node found:\n$plan")
    }
  }

  test("bucketed table read path: single-key filter prunes to 1 of 8 " +
      "buckets (SelectedBucketsCount)") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_bucket_push").toString
    graft.sources.Sources.writeBucketedTable(
      Tables.events(spark, sfDir).select(col("user_id"), col("value")),
      "ev_pushdown_spec", s"$root/ev", 8, Seq("user_id"))
    // a bare filter avoids no Exchange, so autoBucketedScan would turn
    // the bucketed scan off entirely; force it on to prove the 1-of-8
    // file-listing prune a point-lookup job gets on the bucketed layout
    val key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "false")
      val plan = spark.table("ev_pushdown_spec")
        .filter(col("user_id") === 42L)
        .queryExecution.executedPlan.toString
      assert(plan.contains("SelectedBucketsCount: 1 out of 8"),
        s"bucket pruning did not fire:\n$plan")
    } finally {
      spark.conf.set(key, prev)
      spark.sql("DROP TABLE IF EXISTS ev_pushdown_spec")
    }
  }

  test("zonemap base scan reads only the two zone columns") {
    // the zonemap AUDIT numbers (files skipped, zero-loss) are gated by
    // q_zonemap_prune + LayoutSpec; this pins that the read path's base
    // scan is column-pruned to exactly the inputs the zone keys need
    val pts = Tables.documents(spark, sfDir).select(col("doc_id"),
      (col("doc_id") % 256).as("x"), (col("n_chars") % 256).as("y"))
    val q = graft.operators.Layout.zoneMapPrune(pts, "x", "y", "doc_id",
      bits = 8, fileBits = 4, xLo = 32, xHi = 63, yLo = 100, yHi = 140)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,n_chars:bigint>"),
      s"zonemap base scan not pruned to (doc_id, n_chars):\n$plan")
  }

  test("new expressions are SQL-callable and total on edge inputs") {
    // empty vector: all projections 0 → signature 0 for every table
    val sigs = spark.sql(
      "SELECT hyperplane_sigs(array(), 64, 6, 2) AS s").head.getSeq[Long](0)
    assert(sigs === Seq(0L, 0L))
    val d = spark.sql(
      "SELECT dot_float(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .head.getDouble(0)
    assert(d === 11.0)
    val st = spark.sql(
      "SELECT text_stats('the quick fox!') AS s").head.getStruct(0)
    assert(st.getAs[Long]("n_tokens") === 3L)
    assert(st.getAs[Long]("n_punct") === 1L)
    assert(st.getAs[Long]("stop_en") === 1L)
  }
}
