package graft

import graft.queries.Registry

/** Plan guardrail over the WHOLE registry: no query may plan a
  * CartesianProduct, and BroadcastNestedLoopJoin is allowed only where a
  * broadcast cross join is the intended shape (tiny broadcast side scored
  * against every row — the entity-resolution candidate joins and the
  * brute-force ANN scoring). Catches silent plan degradations from future
  * query or optimizer-rule edits before the bench does.
  */
class PlanRegressionSpec extends SparkSpec {

  // intentional broadcast cross joins (candidates/queries side is tiny and
  // explicitly broadcast; scoring every pair is the operator's semantics —
  // for q_tfidf_topk the broadcast side is the 1-row corpus count; for
  // q_pagerank it is the 1-row node-count table)
  val bnljAllowed: Set[String] = Set(
    "q_jaccard_pairs", "q_entity_resolution", "q_fuzzy_join",
    "q_substring_conf", "q_cosine_topk", "q_tfidf_topk",
    "q_ann_quantized", "q_keyword_search", "q_pagerank",
    "q_hard_negatives", "q_matryoshka",
    // 1-row broadcast build side: the global (doc count, total length)
    // aggregate joined onto the bounded per-term idf table
    "q_bm25",
    // |classes|-row broadcast cross join: every token instance is scored
    // against every class — the NB scoring semantics
    "q_nb_classify",
    // 1-row × 1-row audit assembly (file counters × matched-row
    // counters); a literal equi-key would constant-fold to cross anyway
    "q_zonemap_prune",
    // bounded anchor-side broadcast with a non-equi pair-exclusion
    // predicate: one corpus scan scored against the near-dup yield
    "q_contrastive_pairs",
    // 1-row broadcast totals cross joins (the q_tfidf_topk shape):
    // DSIR's (Nt, Nr) onto the bucket model, PSI's (nb, na) onto the
    // bucket counts, the skew profiler's (n, d) onto the top-k slice,
    // and RRF's BM25 substage corpus stats
    "q_dsir_select", "q_psi_drift", "q_skew_profile", "q_rrf_fusion",
    // 1-row broadcast grand-total cross join onto the 25-row
    // contingency-cell table (the same q_tfidf_topk shape)
    "q_mutual_info",
    // 1-row broadcast basket-total cross join onto the bounded rule table
    "q_assoc_rules",
    // 1-row broadcast doc-count cross join onto the bounded vocab table
    "q_sparse_cosine",
    // tiny broadcast checkpoint list joined with a <= predicate onto the
    // per-doc and first-occurrence tables (bounded cumulative-curve scan)
    "q_heaps_law",
    // two 1-row broadcast totals cross joins onto the 10-row bucket table
    "q_jackknife",
    // 1-row broadcast total-edge-weight cross join onto the community table
    "q_modularity",
    // per-round 1-row broadcast seed-count cross joins onto the node
    // table (the q_pagerank shape): visible in the final plan since the
    // rank chain stopped checkpointing per round (linear-chain rule)
    "q_ppr_seeds",
    // tiny broadcast query-set cross join scored against the corpus
    // (the q_cosine_topk brute-force shape)
    "q_knn_classify",
    // 1-row broadcast tail-cut cross join onto the bounded top-k slice
    "q_powerlaw",
    // 1-row broadcast grand-total cross join onto the contingency cells
    "q_chi2",
    // 1-row broadcast class-totals cross join onto the distinct-score table
    "q_best_split",
    // 1-row broadcast global-stats cross join (singleton-category fallback)
    "q_target_encode",
    // 1-row broadcast smoothed-totals cross join onto the 10-row deciles
    "q_iv_woe",
    // 1-row x 1-row totals assembly (top-slice hits x corpus stats)
    "q_lift_at_k",
    // 1-row broadcast positives-total cross join onto the top slice
    "q_ndcg",
    // 1-row broadcast scalar-average / scalar-max / global-total cross
    // joins (the TPC-H Q22/Q15/Q11 uncorrelated-scalar shapes)
    "q_idle_customers", "q_top_supplier", "q_important_parts",
    // 1-row broadcast corpus-count cross join onto the bounded 64x64
    // covariance table (and its power-iteration/Rayleigh consumers)
    "q_embed_cov", "q_power_iter", "q_rayleigh",
    // |segments|-row broadcast cross join enumerating segment pairs
    // (bounded by the segmentation cardinality, never by ids)
    "q_bitmap_intersect",
    // 10-row depth table left-joined to the ≤10-row ranking-overlap
    // pair list on a non-equi prefix predicate (both sides bounded by
    // the RBO truncation depth, never by the corpus)
    "q_rbo",
    // 1-row × 1-row × 1-row sketch assembly (two KMV samples + the
    // exact-union scalar) — the bounded-model posture
    "q_kmv_distinct",
    // Heaps-bounded vocabulary broadcast, probed by the draws on the
    // non-equi inverse-CDF range predicate (lo ≤ r < hi)
    "q_neg_sampling",
    // 1-row broadcast bigram-type-total cross join onto the
    // vocabulary-bounded bigram model table
    "q_kn_surprisal",
    // 1-row stats/denominator broadcasts + 7-row lag-table cross join
    // onto the bounded daily series
    "q_acf",
    // bounded band-cell self cross join (≤ ~11×40 cells) + 1-row
    // marginal/total assembly — the grouped-data tau-b estimator
    "q_kendall_binned",
    // 1-row corpus-token-total broadcast onto the vocab-bounded
    // per-(source, word) count table
    "q_kl_source",
    // two 1-row train-token-total broadcasts (backoff + OOV constants)
    // onto the Heaps-bounded unigram model / the held-out gram stream
    "q_heldout_ppl",
    // bounded i<=j segment join + b-in-[i,j] cover join over the
    // <=20-bin score table — the minimax isotonic identity
    "q_isotonic",
    // 1-row transition-total and conditional-entropy broadcasts onto
    // the type^2-bounded transition table
    "q_entropy_rate",
    // 1-row selection-threshold broadcast (from the <=1001-row score
    // class table) onto the doc stream
    "q_budget_select")

  test("no cartesian products; BNLJ only where cross-scoring is intended") {
    Registry.all.foreach { q =>
      val plan =
        try q.run(spark, sfDir).queryExecution.executedPlan.toString
        catch { case e: Throwable =>
          fail(s"${q.name} failed to plan: ${e.getMessage}")
        }
      assert(!plan.contains("CartesianProduct"),
        s"${q.name} plans a CartesianProduct")
      if (!bnljAllowed(q.name)) {
        // fuzz scalar-subquery predicates (x > (SELECT min/max ...)) plan
        // as a 1-row __scalar broadcast against the probe side — the
        // intended (and only sane) plan for a non-equi scalar compare.
        // The notin_null family's 3VL decorrelation likewise broadcasts
        // its 1-row (__n, __nn) subquery-stats frame. The exemption is
        // scoped PER BNLJ NODE, not whole-plan: each BNLJ line must
        // itself reference a 1-row marker column, except a single
        // condition-less BNLJ in a plan that carries a marker (the
        // 1-row stats cross shape prints no condition on its own line) —
        // so a second, unintended BNLJ can never ride an exemption.
        val bnljLines = plan.split("\n")
          .filter(_.contains("BroadcastNestedLoopJoin"))
        if (bnljLines.nonEmpty) {
          val eachJustified = bnljLines.forall(l =>
            l.contains("__scalar") || l.contains("__nn"))
          // the fallback applies ONLY to a condition-less BNLJ line (the
          // 1-row stats cross shape prints "BroadcastNestedLoopJoin
          // BuildSide, JoinType" with no trailing condition) — a BNLJ
          // that carries its own non-marker condition can no longer ride
          // an unrelated subtree's marker
          val singleMarked = bnljLines.length == 1 &&
            !bnljLines.head.contains("(") &&
            (plan.contains("__scalar") || plan.contains("__nn"))
          assert(eachJustified || singleMarked,
            s"${q.name} plans ${bnljLines.length} BroadcastNestedLoopJoin" +
              s" node(s) not each justified by a 1-row marker:\n" +
              bnljLines.mkString("\n"))
        }
      }
    }
  }

  test("no registry query's Spark output schema contains a DECIMAL column") {
    // The driver reads the Spark parquet via pyarrow (DECIMAL cells become
    // Python Decimal, trailing zeros preserved) but the DuckDB oracle via
    // pandas (float64, trailing zeros dropped), so a DECIMAL output column
    // hash-fails on representation even when every value is identical —
    // round 9's 14 red rows were exactly this. The static OracleDtypeLintSpec
    // can't see alias-propagated decimals (`SELECT dv, running FROM (...)`),
    // so the ban is enforced here on the ANALYZED schema of every build.
    import org.apache.spark.sql.types.DecimalType
    val offenders = Registry.all.flatMap { q =>
      val dec =
        try q.run(spark, sfDir).schema.fields
          .filter(_.dataType.isInstanceOf[DecimalType])
        catch { case e: Throwable =>
          fail(s"${q.name} failed to analyze: ${e.getMessage}")
        }
      if (dec.isEmpty) None
      else Some(s"${q.name}: ${dec.map(f => s"${f.name}:${f.dataType}")
        .mkString(", ")}")
    }
    assert(offenders.isEmpty,
      s"\nDECIMAL final columns (driver-hash-unstable representation):\n" +
        offenders.mkString("\n"))
  }

  test("decontamination joins the bench grams by BROADCAST, never sort-merge") {
    val plan = Registry.all.find(_.name == "q_decontaminate").get
      .run(spark, sfDir).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "bench-gram join must broadcast (the corpus side must not shuffle)")
    assert(!plan.contains("SortMergeJoin"),
      "a sort-merge join here would shuffle the full corpus gram stream")
  }

  test("sampling queries stay map-side: no exchange before the filter") {
    Seq("q_sample_det", "q_mix_sample").foreach { name =>
      val df = Registry.all.find(_.name == name).get.run(spark, sfDir)
      // the keep-filter itself plans as scan->filter; the only exchange
      // allowed in the whole query is the final presentation sort
      val exchanges = df.queryExecution.executedPlan.toString
        .linesIterator.count(_.contains("Exchange"))
      assert(exchanges <= 1, s"$name plans $exchanges exchanges (expect ≤1 for the output sort)")
    }
  }

  test("planted-skew gate: >=30% of rows on one key, join runs salted") {
    // the data property (one key must really be pathological — a planted
    // skew gate over an accidentally-even distribution tests nothing)
    import org.apache.spark.sql.functions._
    val hot = Tables.lineitem(spark, sfDir)
      .select(when(col("l_partkey") % 2 === 0, lit(7L))
        .otherwise(col("l_partkey")).as("k"))
    val total = hot.count().toDouble
    val top = hot.groupBy("k").count().orderBy(col("count").desc)
      .head.getLong(1).toDouble
    assert(top / total >= 0.30,
      f"hot key carries only ${top / total}%.2f of rows (<30%%)")
    // the plan property: the equi-join must run on (k, __salt) — losing
    // the salt silently re-concentrates the hot key on one reducer
    val plan = Registry.all.find(_.name == "q_skew_planted").get
      .run(spark, sfDir).queryExecution.executedPlan.toString
    assert(plan.contains("__salt"),
      "q_skew_planted no longer joins on the salt column")
  }

  test("every registry query matches its committed plan signature") {
    // The whole-registry drift gate (round-10 verdict ask #3): the
    // committed `plan_signatures.tsv` (regenerated by `runMain
    // graft.PlanSigDump`, dumped at THIS spec's sfDir) pins each query's
    // shuffle/broadcast/join-operator counts. A lost broadcast, a
    // surprise extra exchange, or a join-strategy flip in ANY of the
    // ~550 queries now fails here instead of shipping silently.
    // INTENDED plan changes: rerun PlanSigDump, review the git diff of
    // the table, commit it with the code change.
    import graft.plans.PlanSig
    // start from an EMPTY cache so in-plan InMemoryTableScans appear in
    // the same single-pass-sorted-order accumulation the dump main saw
    // (a cache planted by an earlier test would otherwise swap a later
    // query's exchange subtree for a cached scan)
    spark.catalog.clearCache()
    val path = java.nio.file.Paths.get("plan_signatures.tsv")
    assert(java.nio.file.Files.exists(path),
      "plan_signatures.tsv missing — run `runMain graft.PlanSigDump`")
    val committed = scala.jdk.CollectionConverters
      .ListHasAsScala(java.nio.file.Files.readAllLines(path)).asScala
      .filter(_.nonEmpty).map { l =>
        val Array(n, s) = l.split("\t"); n -> s
      }.toMap
    val drifts = scala.collection.mutable.ArrayBuffer[String]()
    Registry.all.sortBy(_.name).foreach { q =>
      val actual = PlanSig.of(
        q.run(spark, sfDir).queryExecution.executedPlan.toString).fmt
      committed.get(q.name) match {
        case None => drifts += s"${q.name}: NOT IN TABLE (actual: $actual)"
        case Some(c) if c != actual =>
          drifts += s"${q.name}: committed[$c] != actual[$actual]"
        case _ => ()
      }
    }
    val stale = committed.keySet -- Registry.all.map(_.name)
    stale.foreach(n => drifts += s"$n: in table but not registered")
    assert(drifts.isEmpty,
      s"\n${drifts.size} plan-signature drift(s) — if intended, rerun " +
        s"`runMain graft.PlanSigDump` and commit the diff:\n" +
        drifts.mkString("\n"))
  }
}
