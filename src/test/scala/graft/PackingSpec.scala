package graft

import graft.queries.PackingQueries
import org.apache.spark.sql.functions._

/** Invariant pins for the batch-assembly wave (q_seq_pack, q_len_bucket,
  * q_mix_alloc) — the DuckDB oracle proves cross-engine equality; these
  * prove the SEMANTICS are the intended ones. */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  private def totalTokens: Long =
    Tables.documents(spark, sfDir)
      .select(graft.functions.TextFeatures.tokenCount(col("text"))
        .cast("long").as("tok"))
      .filter(col("tok") > 0).agg(sum("tok")).as[Long].head()

  test("q_seq_pack: token conservation, dense chunk ids, bounded fill") {
    val rows = PackingQueries.qSeqPack.run(spark, sfDir)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    // every token is packed exactly once (docs report at their start chunk)
    assert(rows.map(_._4).sum === totalTokens)
    rows.groupBy(_._1).foreach { case (src, cs) =>
      val ids = cs.map(_._2).sorted
      // chunk ids dense from 0: the concat stream has no holes
      assert(ids.head === 0L && ids === (0L until ids.size).toSeq,
        s"$src chunk ids not dense: ${ids.take(5)}...")
      // a chunk's STARTING docs can't carry more than chunk budget +
      // one overflowing doc; crossing count is bounded by doc count
      cs.foreach { case (_, _, nDocs, _, nCross) =>
        assert(nCross <= nDocs)
      }
      // in every non-final chunk, at most one doc crosses out (the
      // stream is sequential: only the boundary-straddler crosses)
      cs.filter(_._2 < ids.last).foreach { case (_, _, _, _, nCross) =>
        assert(nCross <= 1L)
      }
    }
  }

  test("q_len_bucket: token conservation, bucket bounds, waste sanity") {
    val rows = PackingQueries.qLenBucket.run(spark, sfDir)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    assert(rows.map(_._4).sum === totalTokens)
    rows.foreach { case (bucket, nDocs, nBatches, nToks, nPad, waste) =>
      // batches hold <= 16 docs
      assert(nBatches >= (nDocs + 15) / 16)
      // padding never shrinks the token mass, waste in [0, 1000)
      assert(nPad >= nToks && waste >= 0L && waste < 1000L)
      // a width-32 bucket pads each doc by < 32 tokens, so waste mass
      // is bounded by 32 per doc
      assert(nPad - nToks < 32L * nDocs, s"bucket $bucket")
    }
  }

  test("q_mix_alloc: ppm allocation sums to <= 1e6 and upweights tails") {
    val rows = PackingQueries.qMixAlloc.run(spark, sfDir)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(rows.length >= 2)
    val ppm = rows.map(_._5)
    assert(ppm.sum <= 1000000L && ppm.sum > 1000000L - rows.length * 2)
    // temperature flattens: the largest source's allocation share is
    // smaller than its raw token share; the smallest's is larger
    val tot = rows.map(_._3).sum.toDouble
    val hi = rows.maxBy(_._3); val lo = rows.minBy(_._3)
    if (hi._3 > lo._3) {
      assert(hi._5 / 1e6 <= hi._3 / tot + 1e-9)
      assert(lo._5 / 1e6 >= lo._3 / tot - 1e-9)
    }
    // ^0.75 exactness witness vs BigDecimal reference on each mass
    rows.foreach { case (_, _, t, w, _) =>
      val exact = math.floor(math.sqrt(t.toDouble) *
        math.sqrt(math.sqrt(t.toDouble))).toLong
      assert(w === exact)
    }
  }

  test("q_budget_select: threshold cut respects the 60% budget and is " +
      "class-maximal") {
    val rows = PackingQueries.qBudgetSelect.run(spark, sfDir)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    val total = rows.map(_._4).sum
    val selected = rows.map(_._5).sum
    val budget = total * 6 / 10
    assert(selected <= budget, s"$selected > budget $budget")
    assert(selected > 0, "selection is vacuous at this SF")
    rows.foreach { case (_, nDocs, nSel, _, _) =>
      assert(nSel <= nDocs)
    }
    // class-maximality: adding the next-best (unselected) ratio class
    // would exceed the budget — recompute classes directly
    import graft.functions.TextStatsExpr
    val perDoc = Tables.documents(spark, sfDir)
      .select(TextStatsExpr.textStats(col("text")).as("st"))
      .select(col("st.n_tokens").cast("long").as("tok"),
        col("st.stop_en").cast("long").as("stp"))
      .filter(col("tok") > 0)
      .withColumn("r", expr("(stp * 1000) div tok"))
      .groupBy("r").agg(sum("tok").as("ctok"))
      .as[(Long, Long)].collect().sortBy(-_._1)
    // maximal desc-ratio PREFIX with cum <= budget (the rcut rule)
    var cum = 0L; var stop = false
    perDoc.foreach { case (_, c) =>
      if (!stop) {
        if (cum + c <= budget) cum += c else stop = true
      }
    }
    assert(selected === cum, s"selected $selected != class prefix $cum")
  }
}
