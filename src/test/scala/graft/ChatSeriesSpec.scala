package graft

import graft.queries.{ChatQueries, SeriesQueries, TextQueries}
import org.apache.spark.sql.functions._

/** In-JVM Scala oracles for the chat-assembly, series-statistics, and
  * Kneser–Ney families — independent of both Spark's plan machinery and
  * the DuckDB twins (which gate the same queries at sf0.01/sf0.1). */
class ChatSeriesSpec extends SparkSpec {

  private def roleOf(t: String): String =
    if (Set("click", "view", "signup")(t)) "user" else "assistant"

  private def collectedEvents() = Tables.events(spark, sfDir)
    .select(col("user_id"), col("ts"), col("event_id"),
      col("event_type"), col("value"))
    .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2),
      r.getString(3), r.getDouble(4)))

  private def turnOf(eventType: String, value: Double): String = {
    val cents = math.floor(value * 100).toLong
    s"<|${roleOf(eventType)}|>$eventType@$cents"
  }

  test("q_chat_render: transcripts match a Scala re-assembly") {
    val out = ChatQueries.qChatRender.run(spark, sfDir)
      .collect().map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("n_turns"), r.getAs[String]("convo"),
          r.getAs[Long]("n_chars")))).toMap
    val base = collectedEvents()
    base.groupBy(_._1).foreach { case (uid, rows) =>
      val ordered = rows.sortBy(t => (t._2.getTime, t._3))
      val convo = ordered.map(t => turnOf(t._4, t._5)).mkString
      val (n, got, nc) = out(uid)
      assert(n === ordered.length.toLong, s"user $uid turns")
      assert(got === convo, s"user $uid transcript")
      assert(nc === convo.length.toLong)
    }
    assert(out.size === base.map(_._1).distinct.length)
  }

  test("q_chat_window: kept suffix is the MAXIMAL suffix within budget") {
    val out = ChatQueries.qChatWindow.run(spark, sfDir)
      .collect().map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("n_turns"), r.getAs[Long]("kept_turns"),
          r.getAs[Long]("dropped_turns"), r.getAs[Long]("kept_chars"),
          r.getAs[Long]("first_kept_event")))).toMap
    collectedEvents().groupBy(_._1).foreach { case (uid, rows) =>
      val ordered = rows.sortBy(t => (t._2.getTime, t._3))
      val lens = ordered.map(t => turnOf(t._4, t._5).length.toLong)
      // longest suffix within budget: walk from the end, stop at the
      // first overflow (suffix semantics — never skip-then-keep)
      var total = 0L; var kept = 0
      var i = lens.length - 1
      while (i >= 0 && total + lens(i) <= 512) { total += lens(i); kept += 1; i -= 1 }
      val (n, k, dr, kc, fke) = out(uid)
      assert(n === lens.length.toLong)
      assert(k === kept.toLong, s"user $uid kept")
      assert(dr === (lens.length - kept).toLong)
      assert(kc === total)
      assert(fke === ordered.drop(lens.length - kept).map(_._3).min)
      // maximality: adding one more turn would overflow
      if (kept < lens.length)
        assert(total + lens(lens.length - kept - 1) > 512)
    }
  }

  test("q_role_alt: violations match a Scala LAG re-derivation") {
    val out = ChatQueries.qRoleAlt.run(spark, sfDir)
      .collect().map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("violations"), r.getAs[Long]("strict_flag")))).toMap
    collectedEvents().groupBy(_._1).foreach { case (uid, rows) =>
      val roles = rows.sortBy(t => (t._2.getTime, t._3)).map(t => roleOf(t._4))
      val v = roles.sliding(2).count(p => p.length == 2 && p(0) == p(1))
      assert(out(uid) === ((v.toLong, if (v == 0) 1L else 0L)), s"user $uid")
    }
  }

  test("q_pref_pairs: extrema and margin gate match a Scala re-derivation") {
    val out = ChatQueries.qPrefPairs.run(spark, sfDir)
      .collect().map(r => (r.getAs[String]("lang"), r.getAs[String]("source")) ->
        ((r.getAs[Long]("chosen_id"), r.getAs[Long]("chosen_score"),
          r.getAs[Long]("rejected_id"), r.getAs[Long]("rejected_score"),
          r.getAs[Long]("margin")))).toMap
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("source"), col("text"))
      .collect().map { r =>
        val w = r.getString(3).trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
        (r.getLong(0), r.getString(1), r.getString(2), w)
      }.filter(_._4.nonEmpty)
      .map { case (id, l, src, w) =>
        (id, l, src, w.distinct.length.toLong * 1000L / w.length) }
    val expected = docs.groupBy(t => (t._2, t._3)).flatMap { case (k, rows) =>
      val hi = rows.minBy(t => (-t._4, t._1))
      val lo = rows.minBy(t => (t._4, t._1))
      val margin = hi._4 - lo._4
      if (margin >= 50) Some(k -> ((hi._1, hi._4, lo._1, lo._4, margin)))
      else None
    }
    assert(out === expected)
  }

  test("q_acf: ppm autocorrelation matches an exact BigInt re-derivation") {
    val out = SeriesQueries.qAcf.run(spark, sfDir)
      .collect().map(r => r.getAs[Long]("lag") ->
        ((r.getAs[Long]("n_pairs"), r.getAs[Long]("acf_x1e6")))).toMap
    val daily = collectedEvents()
      .groupBy(t => t._2.toLocalDateTime.toLocalDate)
      .view.mapValues(_.size.toLong).toMap
    val n = BigInt(daily.size)
    val s = BigInt(daily.values.sum)
    val cent = daily.map { case (d, x) => d -> (n * x - s) }
    val den = cent.values.map(c => c * c).sum
    for (k <- 1L to 7L) {
      val pairs = cent.toSeq.flatMap { case (d, c) =>
        cent.get(d.plusDays(k)).map(c2 => c * c2) }
      val num = pairs.sum
      val expect = (if (num < 0) -1 else 1) * ((num.abs * 1000000) / den)
      assert(out(k) === ((pairs.size.toLong, expect.toLong)), s"lag $k")
    }
  }

  test("q_kendall_binned: cell-based C/D equals the direct pairwise count") {
    val row = SeriesQueries.qKendallBinned.run(spark, sfDir).collect()(0)
    val spend = Tables.orders(spark, sfDir)
      .groupBy(col("o_custkey"))
      .agg(sum(floor(col("o_totalprice") * 100).cast("long")).as("sc"))
      .join(Tables.customer(spark, sfDir),
        col("c_custkey") === col("o_custkey"))
      .select(col("c_acctbal"), col("sc"))
      .collect().map(r => (r.getDouble(0), r.getLong(1)))
    val binned = spend.map { case (ab, sc) =>
      val xb = (math.floor(ab * 100).toLong + 100000L) / 100000L
      val yb = 63 - java.lang.Long.numberOfLeadingZeros(sc)
      (xb, yb.toLong)
    }
    var c = BigInt(0); var dd = BigInt(0)
    for (i <- binned.indices; j <- binned.indices if i < j) {
      val ((x1, y1), (x2, y2)) = (binned(i), binned(j))
      val sx = x1.compare(x2); val sy = y1.compare(y2)
      if (sx * sy > 0) c += 1 else if (sx * sy < 0) dd += 1
    }
    assert(row.getAs[Long]("n") === binned.length.toLong)
    assert(row.getAs[Long]("c_cnt") === c.toLong)
    assert(row.getAs[Long]("d_cnt") === dd.toLong)
    val n0 = BigInt(binned.length) * (binned.length - 1) / 2
    val tx = binned.groupBy(_._1).values
      .map(g => BigInt(g.length) * (g.length - 1) / 2).sum
    val ty = binned.groupBy(_._2).values
      .map(g => BigInt(g.length) * (g.length - 1) / 2).sum
    assert(row.getAs[Long]("tie_x") === tx.toLong)
    assert(row.getAs[Long]("tie_y") === ty.toLong)
    val expSq = ((c - dd) * (c - dd) * 10000) / ((n0 - tx) * (n0 - ty))
    assert(row.getAs[Long]("tau_sq_x1e4") === expSq.toLong)
  }

  test("q_cep_pattern: episode counts match a JVM regex re-derivation") {
    val got = graft.queries.SequenceQueries.qCepPattern.run(spark, sfDir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val base = collectedEvents()
    base.groupBy(_._1).foreach { case (uid, rows) =>
      val seq = rows.sortBy(t => (t._2.getTime, t._3))
        .map(_._4.head).mkString
      val m = "cv*p".r.findAllIn(seq).length.toLong
      assert(got(uid) === ((seq.length.toLong, m, if (m > 0) 1L else 0L)),
        s"user $uid seq=$seq")
    }
    // non-vacuous: episodes occur and the count genuinely discriminates
    assert(got.values.exists(_._2 > 0))
    assert(got.values.map(_._2).toSeq.distinct.length >= 3)
  }

  test("q_entropy_rate: exact lg64 re-derivation; conditioning helps") {
    import graft.operators.NaiveBayes.lg64Long
    val row = graft.queries.SequenceQueries.qEntropyRate.run(spark, sfDir)
      .collect()(0)
    val pairs = collectedEvents().groupBy(_._1).toSeq.flatMap {
      case (_, rows) =>
        val es = rows.sortBy(t => (t._2.getTime, t._3)).map(_._4)
        es.zip(es.drop(1))
    }
    val cij = pairs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val ci = cij.toSeq.groupBy(_._1._1).view.mapValues(_.map(_._2).sum).toMap
    val cjm = cij.toSeq.groupBy(_._1._2).view.mapValues(_.map(_._2).sum).toMap
    val c = cij.values.sum
    val hc = cij.map { case ((p, _), n) =>
      BigInt(n) * (lg64Long(ci(p)) - lg64Long(n)) }.sum
    val hm = cjm.map { case (_, n) =>
      BigInt(n) * (lg64Long(c) - lg64Long(n)) }.sum
    assert(row.getAs[Long]("n_transitions") === c)
    assert(row.getAs[Long]("h_cond_milli") === (hc * 1000 / (64 * c)).toLong)
    assert(row.getAs[Long]("h_next_milli") === (hm * 1000 / (64 * c)).toLong)
    assert(row.getAs[Long]("gain_milli") ===
      (hm * 1000 / (64 * c) - hc * 1000 / (64 * c)).toLong)
    // H(next) >= H(next|prev) exactly; floored lg64 allows ~unit slack
    assert(row.getAs[Long]("gain_milli") >= -2L)
    // sanity vs real doubles: within ~5 milli-bits of exact entropy
    def h(m: Map[String, Long], tot: Long) = m.values.map { n =>
      val p = n.toDouble / tot; -p * math.log(p) / math.log(2.0) }.sum
    val exactHm = h(cjm.toMap, c) * 1000
    assert(math.abs(row.getAs[Long]("h_next_milli") - exactHm) < 5.0)
  }

  test("q_kaplan_meier: exact lg64 re-derivation + KM properties") {
    import graft.operators.NaiveBayes.lg64Long
    val out = graft.queries.SequenceQueries.qKaplanMeier.run(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    def micros(t: java.sql.Timestamp): Long =
      t.getTime / 1000 * 1000000L + t.getNanos / 1000
    val byUser = collectedEvents().groupBy(_._1)
    val hs = byUser.toSeq.map { case (_, rows) =>
      val f = rows.map(r => micros(r._2)).min
      val ps = rows.filter(_._4 == "purchase").map(r => micros(r._2))
      if (ps.isEmpty) None else Some((ps.min - f) / 3600000000L)
    }
    val obs = hs.map {
      case Some(h) if h <= 48 => (h, true)
      case _ => (48L, false)
    }
    val byT = obs.groupBy(_._1).toSeq.sortBy(_._1).map { case (t, v) =>
      (t, v.count(_._2).toLong, v.count(!_._2).toLong) }
    val totals = byT.map(x => x._2 + x._3)
    val expected = byT.zipWithIndex.map { case ((t, d, c), i) =>
      val nRisk = totals.drop(i).sum
      (t, nRisk, d, c)
    }
    var lgs = 0L
    val expFull = expected.map { case (t, n, d, c) =>
      if (d > 0) lgs += (if (n == d) -10000000L
        else lg64Long(math.max(n - d, 1L)) - lg64Long(n))
      (t, n, d, c, lgs)
    }
    assert(out.toSeq === expFull)
    // KM properties: lgS non-increasing; censored mass present; and the
    // curve tracks the true floating-point product-limit closely
    val lgsSeq = out.map(_._5)
    assert(lgsSeq.zip(lgsSeq.drop(1)).forall(p => p._1 >= p._2))
    assert(out.map(_._4).sum > 0, "no censoring — gate vacuous")
    var sTrue = 1.0
    out.foreach { case (_, n, d, _, lg) =>
      if (d > 0) sTrue *= (n - d).toDouble / n
      val sLg = math.pow(2.0, lg.toDouble / 64.0)
      assert(math.abs(sLg - sTrue) < 0.01, s"curve drift: $sLg vs $sTrue")
    }
  }

  test("q_kn_surprisal: exact BigInt Kneser-Ney re-derivation") {
    val out = TextQueries.qKnSurprisal.run(spark, sfDir)
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("n_bigrams"), r.getAs[Long]("kn_x64"),
        r.getAs[Long]("kn_milli")))
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) ->
        r.getString(1).trim.toLowerCase.split("\\s+").filter(_.nonEmpty))
    val grams = docs.flatMap { case (id, w) =>
      w.zip(w.drop(1)).map(p => (id, p._1, p._2)) }
    val big = grams.groupBy(t => (t._2, t._3)).view.mapValues(_.size.toLong).toMap
    val cp = big.toSeq.groupBy(_._1._1)
      .view.mapValues(g => (g.map(_._2).sum, g.size.toLong)).toMap
    val n1pw = big.keys.toSeq.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val t = BigInt(big.size)
    val l9 = graft.operators.NaiveBayes.lg64Long(1000000000L)
    val p9 = big.map { case ((p, w), cpc) =>
      val (cP, n1pPrev) = cp(p)
      val num = (4 * BigInt(cpc) - 3) * t + 3 * BigInt(n1pPrev) * n1pw(w)
      val v = (num * 1000000000) / (4 * BigInt(cP) * t)
      (p, w) -> v.toLong.max(1L)
    }
    val scored = grams.groupBy(_._1).map { case (id, g) =>
      val kn = g.map(x => l9 - graft.operators.NaiveBayes
        .lg64Long(p9((x._2, x._3)))).sum
      (id, g.length.toLong, kn, kn * 1000 / g.length)
    }.toSeq
    val top = scored.sortBy(x => (-x._4, x._1)).take(50)
    assert(out.toSeq === top)
  }
}
