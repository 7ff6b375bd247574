package graft

import graft.sources.Sources
import org.apache.spark.sql.functions._

/** Pins the bucketed-table co-location contract: once two tables are
  * bucketed the same way on the join key, joins and aggregations on that
  * key plan with ZERO Exchange — the write-once-shuffle-never-again
  * posture for recurring pipelines over a 100 TB fact table. */
class BucketedTableSpec extends SparkSpec {
  import spark.implicits._

  private def withForcedSmj[A](body: => A): A = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    // disable broadcast so the co-location (not a broadcast) must remove
    // the shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body
    finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("same-bucketed tables join and aggregate with zero exchanges") {
    val root = java.nio.file.Files
      .createTempDirectory("bucketed").toString
    val docs = (0L until 1000L).map(i => (i, s"doc$i")).toDF("id", "name")
    val feats = (0L until 1000L).map(i => (i, i * 7 % 13)).toDF("id", "f")
    Sources.writeBucketedTable(docs, "b_docs", s"$root/docs", 8, Seq("id"))
    Sources.writeBucketedTable(feats, "b_feats", s"$root/feats", 8, Seq("id"))
    try withForcedSmj {
      val joined = spark.table("b_docs").join(spark.table("b_feats"), "id")
      val jPlan = joined.queryExecution.executedPlan.toString
      assert(jPlan.contains("SortMergeJoin"), jPlan)
      assert(!jPlan.contains("Exchange"),
        s"co-located bucketed join must not shuffle:\n$jPlan")
      assert(joined.count() === 1000L)

      val agg = spark.table("b_docs").groupBy(col("id")).agg(count(lit(1)))
      val aPlan = agg.queryExecution.executedPlan.toString
      assert(!aPlan.contains("Exchange"),
        s"aggregation on the bucket key must not shuffle:\n$aPlan")
      assert(agg.count() === 1000L)
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_docs")
      spark.sql("DROP TABLE IF EXISTS b_feats")
    }
  }

  test("q_bucketed_join: registered query joins with zero exchanges below the join") {
    val q = graft.queries.PipelineQueries.qBucketedJoin
    withForcedSmj {
      val df = q.run(spark, "/root/testdata/sf0.001")
      val plan = df.queryExecution.executedPlan.toString
      val joinAt = plan.indexOf("SortMergeJoin")
      assert(joinAt >= 0, s"expected a sort-merge join:\n$plan")
      // co-location: NO Exchange anywhere below the join — both sides are
      // bucketed scans already satisfying the hash distribution. The tree
      // prints top-down, so every Exchange must appear ABOVE the join line
      // (the agg/sort exchanges); none in the join subtree.
      assert(plan.lastIndexOf("Exchange") < joinAt,
        s"bucketed join sides must not shuffle:\n$plan")
      assert(plan.contains("Bucketed: true"), plan)
      assert(df.count() > 0)
    }
  }

  test("mis-matched bucket counts fall back to a shuffle (contract is real)") {
    val root = java.nio.file.Files
      .createTempDirectory("bucketed_mis").toString
    val a = (0L until 500L).map(i => (i, i)).toDF("id", "x")
    val b = (0L until 500L).map(i => (i, i)).toDF("id", "y")
    Sources.writeBucketedTable(a, "mb_a", s"$root/a", 8, Seq("id"))
    Sources.writeBucketedTable(b, "mb_b", s"$root/b", 4, Seq("id"))
    try withForcedSmj {
      val plan = spark.table("mb_a").join(spark.table("mb_b"), "id")
        .queryExecution.executedPlan.toString
      // one side must re-distribute (Spark may coalesce 8→4 bucket-wise or
      // exchange; either way the co-location guarantee is gone) — this
      // guards the FIRST test against vacuously passing
      assert(plan.contains("Exchange") || plan.contains("coalesced"), plan)
    } finally {
      spark.sql("DROP TABLE IF EXISTS mb_a")
      spark.sql("DROP TABLE IF EXISTS mb_b")
    }
  }
}
