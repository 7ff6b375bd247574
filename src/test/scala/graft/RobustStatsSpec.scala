package graft

import graft.queries.{Relational, TextQueries}
import org.apache.spark.sql.functions._

/** Semantic cross-checks for the robust-stats query family: each query's
  * result at sf0.001 is re-derived in plain Scala from the collected base
  * table — an in-JVM oracle independent of both Spark's window machinery
  * and the DuckDB twin. */
class RobustStatsSpec extends SparkSpec {

  test("q_winsorize: cuts and clipped mean match a Scala re-derivation") {
    val out = Relational.qWinsorize.run(spark, sfDir)
      .collect().map(r => r.getAs[String]("l_returnflag") ->
        ((r.getAs[Long]("p_lo"), r.getAs[Long]("p_hi"),
          r.getAs[Double]("win_mean"), r.getAs[Long]("n_clipped")))).toMap

    val base = Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"), col("l_quantity"), col("l_orderkey"),
        col("l_linenumber"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2),
        r.getInt(3)))
    base.groupBy(_._1).foreach { case (flag, rows) =>
      val sorted = rows.sortBy(t => (t._2, t._3, t._4)).map(_._2)
      val n = sorted.length
      val lo = sorted(math.ceil(0.1 * n).toLong.toInt - 1)
      val hi = sorted(math.ceil(0.9 * n).toLong.toInt - 1)
      val clipped = sorted.map(q => math.min(math.max(q, lo), hi))
      val (gotLo, gotHi, gotMean, gotClipped) = out(flag)
      assert(gotLo === lo.toLong && gotHi === hi.toLong)
      assert(math.abs(gotMean - clipped.sum / n) < 1e-9)
      assert(gotClipped === sorted.count(q => q < lo || q > hi).toLong)
    }
  }

  test("q_mode_priority: modal priority per month with lexicographic ties") {
    val out = Relational.qModePriority.run(spark, sfDir)
      .collect().map(r => r.getAs[String]("month") ->
        ((r.getAs[String]("mode_priority"), r.getAs[Long]("n_orders")))).toMap

    val base = Tables.orders(spark, sfDir)
      .select(date_format(date_trunc("month", col("o_orderdate")),
        "yyyy-MM-dd").as("m"), col("o_orderpriority"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    base.groupBy(_._1).foreach { case (month, rows) =>
      val counts = rows.groupBy(_._2).view.mapValues(_.size.toLong).toSeq
      val (prio, n) = counts.minBy { case (p, c) => (-c, p) }
      assert(out(month) === ((prio, n)), s"month $month")
    }
    assert(out.size === base.map(_._1).distinct.size)
  }

  test("q_ntile_bins: equi-depth partition — sizes differ by <=1, edges monotone") {
    val rows = TextQueries.qNtileBins.run(spark, sfDir).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("bin"),
        r.getAs[Long]("n_docs"), r.getAs[Long]("min_chars"),
        r.getAs[Long]("max_chars")))
    val total = Tables.documents(spark, sfDir).count()
    assert(rows.map(_._3).sum === total)
    rows.groupBy(_._1).foreach { case (lang, bins) =>
      val sizes = bins.sortBy(_._2).map(_._3)
      assert(sizes.max - sizes.min <= 1, s"$lang sizes $sizes")
      // NTILE gives the remainder to the EARLY buckets
      assert(sizes.sorted.reverse.toSeq === sizes.toSeq, s"$lang order")
      val ordered = bins.sortBy(_._2)
      ordered.sliding(2).foreach {
        case Array(a, b) => assert(a._5 <= b._4 || a._5 <= b._5,
          s"$lang edges not monotone: $a then $b")
        case _ =>
      }
    }
  }
}
