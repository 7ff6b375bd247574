package graft

import graft.operators.Sharding
import org.apache.spark.sql.functions._

class ShardingSpec extends SparkSpec {
  import spark.implicits._

  test("rendezvousRoute: adding a shard only moves keys TO the new shard") {
    val keys = (0L until 500L).toDF("k")
    val a = Sharding.rendezvousRoute(keys, "k", 16)
      .withColumnRenamed("shard", "s16")
    val b = Sharding.rendezvousRoute(keys, "k", 17)
      .withColumnRenamed("shard", "s17")
    val moved = a.join(b, "k").filter(col("s16") =!= col("s17"))
      .select(col("s17")).as[Long].collect().toSeq
    assert(moved.nonEmpty, "the new shard should win some keys")
    assert(moved.forall(_ == 16L),
      "a reassigned key may only move to the NEW shard (HRW minimal movement)")
  }

  test("rendezvousRoute: every shard gets work (balance sanity)") {
    val keys = (0L until 2000L).toDF("k")
    val counts = Sharding.rendezvousRoute(keys, "k", 16)
      .groupBy(col("shard")).agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(counts.keySet === (0L until 16L).toSet)
    // md5 is uniform: expect 125/shard; allow a wide 3x band
    assert(counts.values.forall(n => n > 40 && n < 375), counts.toString)
  }

  test("rendezvousRoute: routing is a pure projection — zero exchanges") {
    val keys = (0L until 100L).toDF("k")
    val plan = Sharding.rendezvousRoute(keys, "k", 16)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("skewProfile: hand-checked ratios on a skewed key column") {
    // key 1 ×6, key 2 ×2, keys 3,4 ×1 → N=10, D=4
    val df = (Seq.fill(6)(1L) ++ Seq.fill(2)(2L) ++ Seq(3L, 4L)).toDF("k")
    val out = Sharding.skewProfile(df, "k", k = 3)
      .select("rank", "key", "cnt", "skew_x1000", "salt_factor")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // key 1: skew = 6·4·1000/10 = 2400, salt = ⌈24/10⌉ = 3
    // key 2: skew = 800, salt = 1; key 3 (smallest-key tie over 4): 400, 1
    assert(out === Seq(
      (1L, 1L, 6L, 2400L, 3L),
      (2L, 2L, 2L, 800L, 1L),
      (3L, 3L, 1L, 400L, 1L)))
  }

  test("joinSizeProfile predicts the exact equi-join cardinality") {
    val a = Seq(1L, 1L, 1L, 2L, 3L).toDF("k") // key 1 ×3, 2 ×1, 3 ×1
    val b = Seq(1L, 1L, 2L, 9L).toDF("k")     // key 1 ×2, 2 ×1, 9 ×1
    val r = Sharding.joinSizeProfile(a, "k", b, "k").collect()(0)
    val actual = a.join(b, Seq("k")).count()
    assert(r.getAs[Long]("est_rows") === actual) // 3·2 + 1·1 = 7
    assert(r.getAs[Long]("matched_keys") === 2L)
    assert(r.getAs[Long]("max_contrib") === 6L)
    assert(r.getAs[Long]("max_key") === 1L)
    assert(r.getAs[Long]("max_share_x1000") === 6000L / 7L)
  }
}
