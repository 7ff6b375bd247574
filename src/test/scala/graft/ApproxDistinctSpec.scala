package graft

import org.apache.spark.sql.functions._

/** Error bound for the HLL++ sketch behind q_approx_distinct. The sketch is
  * engine-internal (rows-only under the driver gate, correctly — sketch
  * contents are implementation-specific), but its ERROR is a contract:
  * approx_count_distinct(rsd = 0.01) must land within a few percent of the
  * exact count. Pinned here at two scale factors so a regression in the
  * sketch config (or an accidental rsd change) fails loudly. */
class ApproxDistinctSpec extends SparkSpec {
  import spark.implicits._

  private def relErrors(dir: String): Seq[(String, Long, Long, Double)] = {
    val ev = Tables.events(spark, dir)
    ev.groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id"), 0.01).as("approx"),
        countDistinct(col("user_id")).as("exact"))
      .collect()
      .map { r =>
        val (a, e) = (r.getLong(1), r.getLong(2))
        (r.getString(0), a, e, math.abs(a - e).toDouble / math.max(1L, e))
      }.toSeq
  }

  test("approx_count_distinct within 5% of exact per event_type (sf0.001 and sf0.01)") {
    Seq(sfDir, "/root/testdata/sf0.01").foreach { dir =>
      val errs = relErrors(dir)
      assert(errs.nonEmpty)
      errs.foreach { case (et, a, e, rel) =>
        info(f"$dir $et: approx=$a exact=$e rel=$rel%.4f")
        assert(rel <= 0.05, s"$dir/$et: approx $a vs exact $e (rel $rel)")
      }
    }
  }

  test("count_min_sketch estimates: never under, over by at most eps*N") {
    // The CMS guarantee is one-sided: estimate >= true count, and
    // estimate <= true + eps*N with probability 1-delta. Pinned on the
    // event_type frequency sketch (the heavy-hitters scale path — the
    // exact top-k form is oracle-gated by q_topk/q_multikey_agg).
    import org.apache.spark.util.sketch.CountMinSketch
    val ev = Tables.events(spark, "/root/testdata/sf0.01")
    val eps = 0.001
    val n = ev.count()
    val cms = ev.stat.countMinSketch(col("event_type"), eps, 0.01, seed = 42)
    val exact = ev.groupBy(col("event_type")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1))
    assert(exact.nonEmpty)
    exact.foreach { case (et, cnt) =>
      val est = cms.estimateCount(et)
      info(f"$et: est=$est exact=$cnt")
      assert(est >= cnt, s"$et: CMS under-counted ($est < $cnt)")
      assert(est <= cnt + (eps * n).toLong + 1,
        s"$et: CMS over by more than eps*N ($est vs $cnt + ${(eps * n).toLong})")
    }
  }

  test("q_heavy_hitters: complete above support, one-sided count error") {
    // End-to-end contract of the registry query (MG candidates + CMS
    // estimates): every key with true frequency >= support appears (no
    // false negatives — MG keeps all above-support keys, CMS never
    // under-counts, so the >= support*N cut cannot drop them), and each
    // reported estimate is within [true, true + eps*N].
    val d = "/root/testdata/sf0.01"
    val out = graft.queries.PipelineQueries.qHeavyHitters.run(spark, d)
      .as[(String, Long)].collect().toMap
    val ev = Tables.events(spark, d)
    val n = ev.count()
    val exact = ev.groupBy(col("event_type")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val heavy = exact.filter(_._2 >= (0.05 * n).toLong)
    assert(heavy.nonEmpty)
    heavy.foreach { case (k, cnt) =>
      assert(out.contains(k), s"heavy key $k missing from q_heavy_hitters")
      assert(out(k) >= cnt, s"$k: CMS under-counted (${out(k)} < $cnt)")
      assert(out(k) <= cnt + (1e-4 * n).toLong + 1,
        s"$k: estimate ${out(k)} over by more than eps*N vs $cnt")
    }
  }

  test("approx_percentile lands within ±1% RANK of the exact percentile") {
    // t-digest-style sketches bound RANK error, not value error: the approx
    // median must lie between the exact 49th and 51st percentiles. This is
    // the scale path of q_percentiles (which pins the exact form).
    val ev = Tables.events(spark, "/root/testdata/sf0.01")
    val rows = ev.groupBy(col("event_type"))
      .agg(approx_percentile(col("value"), lit(0.5), lit(10000)).as("approx"),
        percentile(col("value"), lit(0.49)).as("lo"),
        percentile(col("value"), lit(0.51)).as("hi"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a, lo, hi) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(a >= lo && a <= hi,
        s"${r.getString(0)}: approx median $a outside exact rank band [$lo, $hi]")
    }
  }
}
