package graft

import graft.queries.{Relational, WindowQueries}
import org.apache.spark.sql.functions._

/** Semantic cross-checks for the series/frontier analytics family: each
  * operator's non-obvious rewrite (linear skyline, non-recursive CUSUM,
  * five-sum Pearson) is re-derived in plain Scala from the collected
  * base data — an in-JVM oracle independent of both Spark's window
  * machinery and the DuckDB twin.
  */
class AnalyticsSpec extends SparkSpec {

  test("q_skyline: linear sort-filter skyline equals quadratic dominance") {
    val out = Relational.qSkyline.run(spark, sfDir)
      .collect().map(r => (r.getAs[Long]("p_partkey"),
        r.getAs[Int]("p_size"), r.getAs[Double]("p_retailprice")))

    val base = Tables.part(spark, sfDir)
      .select(col("p_partkey"), col("p_size"), col("p_retailprice"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    val expected = base.filter { p =>
      !base.exists(q => q._2 >= p._2 && q._3 <= p._3 &&
        (q._2 > p._2 || q._3 < p._3))
    }.sortBy(p => (-p._2, p._3, p._1))
    assert(out.toSeq === expected.toSeq)
    assert(out.nonEmpty)
    // frontier is strictly decreasing in price as size decreases
    out.sliding(2).foreach { case Array(a, b) =>
      assert(a._2 > b._2 && a._3 > b._3)
    case _ => ()
    }
  }

  test("q_changepoint: prefix identity equals the textbook CUSUM recursion") {
    val out = WindowQueries.qChangepoint.run(spark, sfDir)
      .collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[String]("day")) ->
        ((r.getAs[Long]("x"), r.getAs[Long]("s")))).toMap

    // re-derive: daily integer micros per type, then the recursion
    // S_i = max(0, S_{i-1} + (x_i - mu)) directly
    val daily = out.toSeq.map { case ((t, d), (x, _)) => (t, d, x) }
    daily.groupBy(_._1).foreach { case (typ, rows) =>
      val series = rows.sortBy(_._2)
      val mu = series.map(r => BigInt(r._3)).sum / series.size
      var s = BigInt(0)
      series.foreach { case (_, day, x) =>
        s = (s + (BigInt(x) - mu)).max(BigInt(0))
        assert(BigInt(out((typ, day))._2) === s, s"($typ, $day)")
      }
    }
    assert(out.size >= 30, "expected at least a month of series points")
  }

  test("q_theilsen: median pairwise slope matches a BigInt re-derivation") {
    val out = WindowQueries.qTheilSen.run(spark, sfDir)
      .collect().map(r => r.getAs[String]("event_type") ->
        ((r.getAs[Long]("n_pairs"), r.getAs[Long]("slope_micro")))).toMap

    val daily = dailyMicros()
    daily.groupBy(_._1).foreach { case (typ, rows) =>
      val s = rows.sortBy(_._2)
      val pairs = for {
        i <- s.indices; j <- (i + 1) until s.size
      } yield {
        val dx = BigInt(java.time.temporal.ChronoUnit.DAYS.between(
          java.time.LocalDate.parse(s(i)._2),
          java.time.LocalDate.parse(s(j)._2)))
        val dy = BigInt(s(j)._3) - BigInt(s(i)._3)
        val key = (dy * 1000000 + BigInt(1000000000) * dx) / dx
        (key, s(i)._2, s(j)._2)
      }
      val sorted = pairs.sortBy(p => (p._1, p._2, p._3))
      val med = sorted((sorted.size + 1) / 2 - 1)
      assert(out(typ)._1 === pairs.size.toLong)
      assert(BigInt(out(typ)._2) === med._1 - 1000000000, s"type $typ")
    }
  }

  test("q_rolling_median: lower median of the trailing 7 values") {
    val out = WindowQueries.qRollingMedian.run(spark, sfDir)
      .collect().map(r => (r.getAs[String]("event_type"),
        r.getAs[String]("day")) ->
        ((r.getAs[Long]("v"), r.getAs[Long]("med")))).toMap

    val daily = dailyMicros()
    daily.groupBy(_._1).foreach { case (typ, rows) =>
      val s = rows.sortBy(_._2)
      s.indices.foreach { i =>
        val win = s.slice(math.max(0, i - 6), i + 1).map(_._3).sorted
        val med = win((win.size + 1) / 2 - 1)
        assert(out((typ, s(i)._2)) === ((s(i)._3, med)),
          s"($typ, ${s(i)._2})")
      }
    }
    assert(out.size === daily.size)
  }

  test("q_dow_profile: per-mille weekday index, Monday-anchored") {
    val out = WindowQueries.qDowProfile.run(spark, sfDir)
      .collect().map(r => (r.getAs[String]("event_type"),
        r.getAs[Long]("dow")) ->
        ((r.getAs[Long]("n_days"), r.getAs[Long]("index_milli")))).toMap

    val daily = dailyMicros()
    daily.groupBy(_._1).foreach { case (typ, rows) =>
      val withDow = rows.map { case (_, day, x) =>
        // 1970-01-05 was a Monday
        val dow = java.time.temporal.ChronoUnit.DAYS.between(
          java.time.LocalDate.of(1970, 1, 5),
          java.time.LocalDate.parse(day)) % 7
        (dow, x)
      }
      val sAll = withDow.map(r => BigInt(r._2)).sum
      val cAll = BigInt(withDow.size)
      withDow.groupBy(_._1).foreach { case (dow, ds) =>
        val sDow = ds.map(r => BigInt(r._2)).sum
        val idx = (1000 * sDow * cAll) / (BigInt(ds.size) * sAll)
        assert(out((typ, dow)) === ((ds.size.toLong, idx.toLong)),
          s"($typ, $dow)")
      }
      // weekday numbering check: 2024-01-01 was a Monday → dow 0 exists
      assert(withDow.map(_._1).distinct.forall(d => d >= 0 && d <= 6))
    }
  }

  test("q_hampel: median/MAD flags match a direct re-derivation") {
    val out = WindowQueries.qHampel.run(spark, sfDir)
      .collect().map(r => (r.getAs[String]("event_type"),
        r.getAs[String]("day")) ->
        ((r.getAs[Long]("med"), r.getAs[Long]("mad"),
          r.getAs[Int]("is_outlier")))).toMap

    val daily = dailyMicros()
    daily.groupBy(_._1).foreach { case (typ, rows) =>
      val s = rows.sortBy(_._2)
      s.indices.foreach { i =>
        val win = s.slice(math.max(0, i - 6), i + 1).map(_._3)
        val med = win.sorted.apply((win.size + 1) / 2 - 1)
        val mad = win.map(v => math.abs(v - med)).sorted
          .apply((win.size + 1) / 2 - 1)
        val flag = if (math.abs(s(i)._3 - med) > 3L * mad) 1 else 0
        assert(out((typ, s(i)._2)) === ((med, mad, flag)),
          s"($typ, ${s(i)._2})")
      }
    }
    assert(out.size === daily.size)
  }

  /** (event_type, ISO day, exact micro volume) at sf0.001. */
  private def dailyMicros(): Seq[(String, String, Long)] =
    Tables.events(spark, sfDir)
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg((sum(col("value").cast(org.apache.spark.sql.types
          .DecimalType(27, 6))) * lit(1000000)).cast("long").as("x"))
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2)))

  test("q_autocorr: r matches an exact BigInt five-sum re-derivation") {
    val out = WindowQueries.qAutocorr.run(spark, sfDir)
      .collect().map(r => r.getAs[String]("event_type") ->
        ((r.getAs[Long]("n_pairs"), r.getAs[Double]("r")))).toMap

    val daily = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg((sum(col("value").cast(org.apache.spark.sql.types
          .DecimalType(27, 6))) * lit(1000000)).cast("long").as("x"))
      .collect().map(r => (r.getString(0), r.getDate(1).toString,
        r.getLong(2)))
    daily.groupBy(_._1).foreach { case (typ, rows) =>
      val xs = rows.sortBy(_._2).map(r => BigInt(r._3))
      val pairs = xs.zip(xs.tail)
      val n = BigInt(pairs.size)
      val sx = pairs.map(_._1).sum
      val sy = pairs.map(_._2).sum
      val sxy = pairs.map(p => p._1 * p._2).sum
      val sxx = pairs.map(p => p._1 * p._1).sum
      val syy = pairs.map(p => p._2 * p._2).sum
      val r = (n * sxy - sx * sy).toDouble /
        (math.sqrt((n * sxx - sx * sx).toDouble) *
         math.sqrt((n * syy - sy * sy).toDouble))
      val (gotN, gotR) = out(typ)
      assert(gotN === pairs.size.toLong)
      assert(gotR === r, s"type $typ")
      assert(gotR >= -1.0 && gotR <= 1.0)
    }
  }

  test("rocAuc: perfect, reversed, tied, and hand-mixed scores") {
    import spark.implicits._
    def auc(rows: Seq[(Long, Boolean)]): (Long, Long, Long, Long) =
      graft.operators.Analytics.rocAuc(
        rows.toDF("score", "label"), "score", "label")
        .as[(Long, Long, Long, Long)].head()
    // perfect separation
    assert(auc(Seq((10L, true), (9L, true), (1L, false), (2L, false)))
      === ((2L, 2L, 8L, 1000000L)))
    // perfectly reversed
    assert(auc(Seq((1L, true), (2L, true), (9L, false), (10L, false)))
      === ((2L, 2L, 0L, 0L)))
    // all tied: AUC exactly 1/2 (the tie credit)
    assert(auc(Seq((5L, true), (5L, false), (5L, true), (5L, false)))
      === ((2L, 2L, 4L, 500000L)))
    // hand-mixed: pos {3,1}, neg {2,2} →
    // pairs: (3>2)+(3>2)+(1<2)+(1<2) = 2 of 4 → AUC 0.5, u2 = 4
    assert(auc(Seq((3L, true), (1L, true), (2L, false), (2L, false)))
      === ((2L, 2L, 4L, 500000L)))
  }

  test("stlLite: additive identity and flat-series degeneracy") {
    import spark.implicits._
    // 14 flat days: trend = x, detrended = 0, seasonal = 0, resid = 0
    val flat = (1 to 14).map(i =>
      ("a", java.sql.Timestamp.valueOf(f"2024-01-$i%02d 12:00:00"), 5.0))
      .toDF("k", "ts", "v")
    val out = graft.operators.Analytics.stlLite(flat, "k", "ts", "v")
      .as[(String, String, Long, Long, Long, Long)].collect()
    assert(out.length === 14)
    assert(out.forall(r => r._3 === 5000000L && r._4 === 5000000L
      && r._5 === 0L && r._6 === 0L))
    // weekday-patterned series: x = trend + seasonal + resid exactly
    val pat = (1 to 28).map(i =>
      ("a", java.sql.Timestamp.valueOf(f"2024-01-$i%02d 12:00:00"),
        if (i % 7 == 0) 10.0 else 2.0)).toDF("k", "ts", "v")
    val out2 = graft.operators.Analytics.stlLite(pat, "k", "ts", "v")
      .as[(String, String, Long, Long, Long, Long)].collect()
    assert(out2.forall(r => r._3 === r._4 + r._5 + r._6))
    // the spiking DOW carries the most positive seasonal component
    val byDow = out2.groupBy(r => (java.time.LocalDate.parse(r._2)
      .toEpochDay - java.time.LocalDate.parse("1970-01-05").toEpochDay)
      % 7).map { case (dw, rs) => dw -> rs.head._5 }
    assert(byDow.maxBy(_._2)._2 > 0)
  }
}
