package graft

import graft.operators.NaiveBayes
import graft.queries.InferenceQueries
import org.apache.spark.sql.functions._

/** In-JVM BigInt oracles for the BH-FDR and split-conformal gates —
  * independent of the DuckDB twins gating the same queries. */
class InferenceSpec extends SparkSpec {

  test("q_bh_fdr: exact BigInt re-derivation incl. step-up equivalence") {
    val out = InferenceQueries.qBhFdr.run(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7),
        r.getLong(8), r.getLong(9)))
    val cut = java.sql.Timestamp.valueOf("2024-01-16 00:00:00").getTime
    val rows = Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"), col("value")).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getDouble(2)))
    val hyp = rows.groupBy(_._1).toSeq.flatMap { case (uid, es) =>
      val nb = es.count(_._2 < cut).toLong
      val na = es.count(_._2 >= cut).toLong
      val kb = es.count(e => e._2 < cut && e._3 > 35.0).toLong
      val ka = es.count(e => e._2 >= cut && e._3 > 35.0).toLong
      val (k, n) = (kb + ka, nb + na)
      if (nb > 0 && na > 0 && k > 0 && k < n) {
        val num = BigInt(kb * na - ka * nb)
        val z2 = (num * num * n * 1000000L) /
          (BigInt(nb) * na * k * (n - k))
        val nl2p = (z2 * 64 / 1386294 - 64).toLong.max(0L)
        Some((uid, nb, na, kb, ka, z2.toLong, nl2p))
      } else None
    }
    val ranked = hyp.sortBy(h => (-h._7, h._1)).zipWithIndex
      .map { case (h, i) => (h, (i + 1).toLong) }
    val m = ranked.size.toLong
    val c = ranked.map { case (h, rk) =>
      (h, rk, h._7 - NaiveBayes.lg64Long(m) + NaiveBayes.lg64Long(rk)) }
    // suffix max of c over ranks >= rk, floored at 0
    val sufMax = c.scanRight(Long.MinValue)((x, acc) => math.max(x._3, acc))
    val expected = c.zip(sufMax.dropRight(1)).take(50).map {
      case ((h, rk, _), sm) =>
        val adj = math.max(0L, sm)
        val rej = if (adj >= NaiveBayes.lg64Long(5L)) 1L else 0L
        (rk, h._1, h._2, h._3, h._4, h._5, h._6, h._7, adj, rej)
    }
    assert(out.toSeq === expected)
    // step-up equivalence: reject-by-adjusted-p == reject-by-k*
    // (flags computed over the FULL table, compared on the output rows)
    val q64 = NaiveBayes.lg64Long(5L)
    val flags = c.map { case (h, rk, _) =>
      h._7 >= NaiveBayes.lg64Long(m) - NaiveBayes.lg64Long(rk) + q64 }
    val kStar = flags.zipWithIndex.filter(_._1).map(_._2 + 1)
      .sortBy(-_).headOption.getOrElse(0)
    val byKstar = c.take(50).map { case (_, rk, _) => rk <= kStar }
    assert(out.map(_._10 == 1L).toSeq === byKstar,
      "adjusted-p rejections must equal the step-up k* rule")
  }

  test("q_conformal: exact BigInt re-derivation + coverage guarantee") {
    val row = InferenceQueries.qConformal.run(spark, sfDir).collect()(0)
    val spend = Tables.orders(spark, sfDir).groupBy(col("o_custkey"))
      .agg(sum(floor(col("o_totalprice") * 100).cast("long")).as("y"))
    val base = Tables.customer(spark, sfDir)
      .join(spend, col("c_custkey") === col("o_custkey"))
      .select(col("c_custkey"), col("c_acctbal"), col("y"))
      .collect().map { r =>
        val id = r.getLong(0)
        val x = math.floor(r.getDouble(1) * 100).toLong
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest(s"conf:$id".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        def hv(c: Char) = if (c >= 'a') c - 'a' + 10 else c - '0'
        val b = (hv(md(0)) * 16 + hv(md(1))) % 10
        (id, x, r.getLong(2), b)
      }
    val tr = base.filter(_._4 < 6)
    val n = BigInt(tr.length)
    val sx = tr.map(t => BigInt(t._2)).sum
    val sy = tr.map(t => BigInt(t._3)).sum
    val sxy = tr.map(t => BigInt(t._2) * t._3).sum
    val sx2 = tr.map(t => BigInt(t._2) * t._2).sum
    val ns = n * sxy - sx * sy
    val ds = n * sx2 - sx * sx
    val (a, bb, cc) = (n * ds, n * ns, ns * sx - ds * sy)
    def rOf(x: Long, y: Long) = ((a * y - bb * x + cc).abs / a).toLong
    val cal = base.filter(t => t._4 == 6 || t._4 == 7)
      .map(t => rOf(t._2, t._3)).sorted
    val k = ((9L * (cal.length + 1L) + 9L) / 10L).toInt
    val qhat = cal(k - 1)
    val test = base.filter(_._4 >= 8).map(t => rOf(t._2, t._3))
    val covered = test.count(_ <= qhat).toLong
    assert(row.getAs[Long]("n_train") === tr.length.toLong)
    assert(row.getAs[Long]("n_cal") === cal.length.toLong)
    assert(row.getAs[Long]("k_rank") === k.toLong)
    assert(row.getAs[Long]("qhat_cents") === qhat)
    assert(row.getAs[Long]("n_test") === test.length.toLong)
    assert(row.getAs[Long]("covered") === covered)
    assert(row.getAs[Long]("coverage_ppm") ===
      covered * 1000000L / test.length)
    // the conformal guarantee: realized coverage near 1 - alpha = 0.9
    // (exchangeable splits; finite-sample wiggle ~ 3 s.e. allowed)
    val cov = row.getAs[Long]("coverage_ppm")
    val se3 = 3.0 * math.sqrt(0.9 * 0.1 / test.length) * 1e6
    assert(cov >= (900000 - se3).toLong - 1,
      s"coverage $cov below guarantee band")
  }

  test("q_cohen_kappa: exact BigInt re-derivation") {
    val row = InferenceQueries.qCohenKappa.run(spark, sfDir).collect()(0)
    val cells = Tables.documents(spark, sfDir).select(col("text"))
      .collect().map(_.getString(0).trim.toLowerCase.split("\\s+")
        .filter(_.nonEmpty)).filter(_.nonEmpty)
      .map { w =>
        val a = w.distinct.length.toLong * 1000 / w.length >= 500
        val b = w.map(_.length.toLong).sum * 10 / w.length >= 45
        (a, b)
      }
    val n11 = cells.count(c => c._1 && c._2).toLong
    val n10 = cells.count(c => c._1 && !c._2).toLong
    val n01 = cells.count(c => !c._1 && c._2).toLong
    val n00 = cells.count(c => !c._1 && !c._2).toLong
    val n = cells.length.toLong
    assert((row.getAs[Long]("n"), row.getAs[Long]("n00"),
      row.getAs[Long]("n01"), row.getAs[Long]("n10"),
      row.getAs[Long]("n11")) === ((n, n00, n01, n10, n11)))
    val num = BigInt(n) * (n00 + n11) -
      BigInt(n10 + n11) * (n01 + n11) - BigInt(n00 + n01) * (n00 + n10)
    val den = BigInt(n) * n -
      BigInt(n10 + n11) * (n01 + n11) - BigInt(n00 + n01) * (n00 + n10)
    val kappa = (if (num < 0) -1 else 1) * ((num.abs * 1000000) / den)
    assert(row.getAs[Long]("kappa_ppm") === kappa.toLong)
    // non-degenerate: some agreement beyond chance but not perfect
    assert(kappa > 0 && kappa < 900000)
  }

  test("q_bootstrap: exact md5 re-derivation + sampling sanity") {
    val out = InferenceQueries.qBootstrap.run(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val thresholds = Seq(103548857136060L, 207097714272121L,
      258872142840152L, 276130285696162L, 280444821410164L,
      281307728552965L, 281451546410098L, 281472091818260L)
    val rows = Tables.events(spark, sfDir)
      .select(col("event_id"), col("value")).collect()
      .map(r => (r.getLong(0), math.floor(r.getDouble(1) * 100).toLong))
    def fold(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      md.take(12).foldLeft(0L)((acc, c) =>
        acc * 16 + (if (c >= 'a') c - 'a' + 10 else c - '0'))
    }
    val expected = (0L until 64L).map { b =>
      val ws = rows.map { case (id, cents) =>
        val u = fold(s"pb:$b:$id")
        (thresholds.count(u >= _).toLong, cents)
      }
      val nEff = ws.map(_._1).sum
      (b, nEff, ws.map(t => t._1 * t._2).sum / nEff)
    }
    assert(out.toSeq === expected)
    // Poisson(1) sanity: replicate mass stays near n (5 sigma)
    val nRows = rows.length.toLong
    val tol = (5.0 * math.sqrt(nRows.toDouble)).toLong + 1
    out.foreach { case (b, nEff, _) =>
      assert(math.abs(nEff - nRows) <= tol, s"replicate $b mass $nEff") }
    // and the replicate means genuinely vary (it IS resampling)
    assert(out.map(_._3).distinct.length > 10)
  }
}
