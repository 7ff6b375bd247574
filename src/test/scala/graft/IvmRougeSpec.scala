package graft

import graft.queries.{IvmQueries, TextQueries}
import org.apache.spark.sql.functions._

/** In-JVM oracles for the IVM maintenance gate and the ROUGE recall
  * gate — independent of the DuckDB twins that gate the same queries. */
class IvmRougeSpec extends SparkSpec {

  test("q_ivm_agg: incremental merge equals a from-scratch recompute") {
    val incremental = IvmQueries.qIvmAgg.run(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val scratch = Tables.events(spark, sfDir)
      .filter(col("event_id") % 10 =!= 3)
      .groupBy(col("user_id"),
        Det.fmtDate(to_date(col("ts"))).as("day"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("value") * 100).cast("long")).as("sum_cents"))
      .orderBy(col("user_id"), col("day"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(incremental.toSeq === scratch.toSeq)
    // bag-semantics invariant: no zero-or-negative multiplicity survives
    assert(incremental.forall(_._3 > 0))
  }

  test("q_ivm_agg: the delta actually changes maintained groups") {
    // retractions must be visible: at least one group's count shrinks
    // vs the pre-delta base view (otherwise the gate would be vacuous)
    val base = Tables.events(spark, sfDir)
      .filter(col("event_id") % 10 =!= 7)
      .groupBy(col("user_id"), Det.fmtDate(to_date(col("ts"))).as("day"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2))
      .toMap
    val maintained = IvmQueries.qIvmAgg.run(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    val shrunk = maintained.count { case (k, n) => base.get(k).exists(_ > n) }
    val grew = maintained.count { case (k, n) => base.get(k).exists(_ < n) }
    assert(shrunk > 0, "no group shrank — deletes were not applied")
    assert(grew > 0, "no group grew — inserts were not applied")
  }

  test("q_rouge: exact Scala clipped-recall re-derivation") {
    val out = TextQueries.qRouge.run(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("source"), col("text"))
      .collect().map { r =>
        val w = r.getString(3).trim.toLowerCase.split("\\s+")
          .filter(_.nonEmpty)
        (r.getLong(0), r.getString(1), r.getString(2), w)
      }.filter(_._4.nonEmpty)
    def counts(g: Seq[String]) =
      g.groupBy(identity).view.mapValues(_.size.toLong).toMap
    def clipped(c: Map[String, Long], r: Map[String, Long]) =
      c.map { case (g, n) => math.min(n, r.getOrElse(g, 0L)) }.sum
    val scored = docs.groupBy(t => (t._2, t._3)).toSeq.flatMap {
      case ((lang, src), rows) =>
        val ref = rows.minBy(t => (-t._4.length, t._1))
        val r1 = counts(ref._4.toSeq)
        val r2 = counts(ref._4.toSeq.sliding(2).filter(_.size == 2)
          .map(_.mkString(" ")).toSeq)
        val rt1 = ref._4.length.toLong
        val rt2 = math.max(ref._4.length - 1, 0).toLong
        rows.filterNot(_ eq ref).map { c =>
          val c1 = clipped(counts(c._4.toSeq), r1)
          val c2 = clipped(counts(c._4.toSeq.sliding(2)
            .filter(_.size == 2).map(_.mkString(" ")).toSeq), r2)
          val r1p = c1 * 1000000L / rt1
          val r2p = if (rt2 == 0) 0L else c2 * 1000000L / rt2
          (c._1, lang, src, ref._1, r1p, r2p)
        }
    }.toSeq
    val top = scored.sortBy(x => (-x._6, -x._5, x._1)).take(100)
    assert(out.toSeq === top)
    // the metric must discriminate: top scores strictly above the floor
    assert(top.head._6 > top.last._6 || top.head._5 > top.last._5)
  }

  test("q_kl_source: exact lg64 re-derivation + self-KL sanity") {
    val out = TextQueries.qKlSource.run(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    val inst = Tables.documents(spark, sfDir)
      .select(col("source"), col("text")).collect()
      .flatMap { r =>
        r.getString(1).trim.toLowerCase.split("\\s+")
          .filter(_.nonEmpty).map(w => (r.getString(0), w))
      }
    val csw = inst.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cwm = csw.toSeq.groupBy(_._1._2)
      .view.mapValues(_.map(_._2).sum).toMap
    val nsm = csw.toSeq.groupBy(_._1._1)
      .view.mapValues(_.map(_._2).sum).toMap
    val n = cwm.values.sum
    import graft.operators.NaiveBayes.lg64Long
    val expected = csw.toSeq.groupBy(_._1._1).toSeq.map {
      case (src, terms) =>
        val kl = terms.map { case ((_, w), c) =>
          BigInt(c) * (lg64Long(c) + lg64Long(n)
            - lg64Long(cwm(w)) - lg64Long(nsm(src)))
        }.sum
        val ns = nsm(src)
        val milli = (if (kl < 0) -1 else 1) *
          ((kl.abs * 1000) / (64 * ns))
        (src, ns, kl.toLong, milli.toLong)
    }.sortBy(_._1)
    assert(out.toSeq === expected)
    // KL of the whole corpus against itself is 0 by construction:
    // every source's value must be a small non-degenerate positive
    // (floored logs allow tiny negatives; a large negative = bug)
    assert(out.forall(_._4 > -5L), "KL far below zero")
    assert(out.exists(_._4 > 0L), "no source diverges at all")
  }

  test("q_heldout_ppl: exact re-derivation; all three cost tiers fire") {
    import graft.operators.NaiveBayes.lg64Long
    val out = TextQueries.qHeldoutPpl.run(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    def bucket(id: Long): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"ppl:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      def hv(c: Char) = if (c >= 'a') c - 'a' + 10 else c - '0'
      (hv(md(0)) * 16 + hv(md(1))) % 10
    }
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1).trim.toLowerCase
        .split("\\s+").filter(_.nonEmpty)))
    val (train, test) = docs.partition(d => bucket(d._1) < 8)
    val big = train.flatMap(d => d._2.zip(d._2.drop(1)))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val ctx = big.toSeq.groupBy(_._1._1)
      .view.mapValues(_.map(_._2).sum).toMap
    val uni = train.flatMap(_._2).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    val nt = uni.values.sum
    val l52 = lg64Long(5L) - lg64Long(2L)
    val oov = lg64Long(10L) + lg64Long(nt)
    val expected = test.filter(_._2.length >= 2).map { case (id, w) =>
      val gs = w.zip(w.drop(1))
      var (sn, bn, on, nll) = (0L, 0L, 0L, 0L)
      gs.foreach { g =>
        big.get(g) match {
          case Some(cpw) =>
            sn += 1; nll += lg64Long(ctx(g._1)) - lg64Long(cpw)
          case None => uni.get(g._2) match {
            case Some(c1) =>
              bn += 1; nll += l52 + lg64Long(nt) - lg64Long(c1)
            case None => on += 1; nll += oov
          }
        }
      }
      (id, gs.length.toLong, sn, bn, on, nll,
        nll * 1000 / (64 * gs.length))
    }.sortBy(x => (-x._7, x._1)).take(50)
    assert(out.toSeq === expected.toSeq)
    // all three tiers must actually fire somewhere in the output
    assert(out.exists(_._3 > 0) && out.exists(_._4 > 0),
      "seen/backoff tiers missing")
    val tiers = out.map(t => t._3 + t._4 + t._5)
    assert(out.map(_._2).toSeq === tiers.toSeq, "tier counts != n")
  }

  test("q_isotonic: minimax fit equals an exact-rational PAVA, floored") {
    val out = TextQueries.qIsotonic.run(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val bins = Tables.documents(spark, sfDir).select(col("text"))
      .collect().map(_.getString(0).trim.toLowerCase.split("\\s+")
        .filter(_.nonEmpty)).filter(_.nonEmpty)
      .map { w =>
        val bin = math.min(w.distinct.length.toLong * 1000 / w.length / 50,
          19L)
        val pos = if (w.map(_.length.toLong).sum * 10 / w.length >= 45) 1L
          else 0L
        (bin, pos)
      }.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (b, rows) => (b, rows.length.toLong, rows.map(_._2).sum) }
    // exact-rational PAVA (pool adjacent violators on BigInt fractions)
    case class Block(n: BigInt, p: BigInt, bins: List[Long])
    var stack = List.empty[Block]
    bins.foreach { case (b, n, p) =>
      var cur = Block(n, p, List(b))
      // prev mean >= cur mean  <=>  prev.p*cur.n >= cur.p*prev.n
      while (stack.nonEmpty &&
          stack.head.p * cur.n >= cur.p * stack.head.n) {
        val h = stack.head; stack = stack.tail
        cur = Block(h.n + cur.n, h.p + cur.p, h.bins ++ cur.bins)
      }
      stack = cur :: stack
    }
    val pava = stack.reverse.flatMap(bl =>
      bl.bins.map(b => b -> (bl.p * 1000000 / bl.n).toLong)).toMap
    val expected = bins.map { case (b, n, p) =>
      (b, n, p, p * 1000000 / n, pava(b)) }
    assert(out.toSeq === expected)
    // the fit is monotone non-decreasing and genuinely pooled somewhere
    val iso = out.map(_._5)
    assert(iso.zip(iso.drop(1)).forall(t => t._1 <= t._2))
    assert(out.exists(r => r._5 != r._4), "no bin was pooled — vacuous")
  }
}
