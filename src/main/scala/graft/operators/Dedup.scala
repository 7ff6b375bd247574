package graft.operators

import graft.functions.TextFeatures
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines — exact, MinHash+LSH,
  * SimHash, n-gram Jaccard. Designed so that nothing is ever pairwise over
  * the full corpus: candidate generation is always a hash-bucket join
  * (shuffle ∝ corpus size), and only bucket-mates are verified pairwise.
  */
object Dedup {

  /** Exact dedup: fingerprint-hash groupBy, keep the lowest id per group.
    * Adds `is_duplicate` (true for every non-surviving row). One shuffle on
    * the 64-bit fingerprint — at 100 TB this is the cheapest possible
    * formulation (no string comparison across the wire). */
  def exactDuplicates(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(col("__fp"))
    df.withColumn("__fp", TextFeatures.fingerprint(col(textCol)))
      .withColumn("__keep", min(col(idCol)).over(w))
      .withColumn("is_duplicate", col(idCol) =!= col("__keep"))
      .withColumn("dup_group_size", count(lit(1)).over(w))
      .drop("__fp", "__keep")
  }

  /** MinHash signature: `numHashes` independent min-hashes over character
    * `shingleSize`-gram shingles, computed in one pass by the custom
    * [[graft.functions.MinHashSignature]] expression (the compositional
    * k × array_min(transform(...)) form re-hashes every shingle k times —
    * 200× slower measured). Returns array<long> of length `numHashes`. */
  def minhashSignature(text: Column, numHashes: Int, shingleSize: Int): Column =
    graft.functions.MinHashSignature.minhash(
      TextFeatures.shingles(text, shingleSize), numHashes)

  /** LSH banding: split the signature into `bands` bands and hash each band;
    * docs sharing any (band_index, band_hash) are candidate pairs.
    * Probability a pair with Jaccard j collides: 1-(1-j^r)^b, r=sig/bands. */
  def lshBands(sig: Column, bands: Int, numHashes: Int): Column = {
    val r = numHashes / bands
    require(bands * r == numHashes, "bands must divide numHashes")
    array((0 until bands).map { b =>
      // xxhash64 hashes array columns natively; band index salts the bucket
      struct(lit(b).as("band"),
        xxhash64(slice(sig, b * r + 1, r), lit(b)).as("bucket"))
    }: _*)
  }

  /** Corpus LSH band table (id_corpus, band, bucket) — the precomputed
    * static side a streaming or incremental ingest joins its own band
    * rows against ([[graft.streaming.Streams.nearDupCandidateStream]]).
    * At 100 TB this is a maintained bucketed table, re-derived here
    * in-plan from the fused signature expression. */
  def corpusBandTable(corpus: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 64, bands: Int = 16, shingleSize: Int = 5): DataFrame = {
    val norm = lower(trim(regexp_replace(col(textCol), "\\s+", " ")))
    val sig = graft.functions.MinHashTextSignature.minhashText(
      norm, shingleSize, numHashes)
    corpus.select(col(idCol).as("id_corpus"), sig.as("__sig"))
      .select(col("id_corpus"),
        explode(lshBands(col("__sig"), bands, numHashes)).as("b"))
      .select(col("id_corpus"), col("b.band").as("band"),
        col("b.bucket").as("bucket"))
  }

  /** MinHash+LSH near-duplicate pairs with exact-Jaccard verification.
    * Pipeline: shingle → signature → bands → explode → self-join per bucket
    * (id_a < id_b) → dedup candidate pair → verify true shingle Jaccard ≥
    * `minJaccard`.
    *
    * This variant caches (id, text, sig) — convenient when the corpus slice
    * fits the storage pool. For the 100 TB posture use
    * [[minhashNearDupPairsKeyed]], which never caches text.
    */
  def minhashNearDupPairs(df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 64, bands: Int = 16, shingleSize: Int = 5,
      minJaccard: Double = 0.8,
      maxSigBroadcastBytes: Long = MaxSigBroadcastBytes): DataFrame =
    minhashPipeline(df, idCol, textCol, numHashes, bands, shingleSize,
      minJaccard, keyed = false, maxSigBroadcastBytes)

  /** [[minhashNearDupPairs]] with the verify stage re-reading text BY KEY
    * from the source relation: only (id, signature) is ever cached —
    * (numHashes+1)·8 B per doc, ~0.5 GB per million docs at 64 hashes —
    * and the candidate docs' text comes from a key-semi-join re-scan (at
    * scale: a selective columnar read from the doc store, pushdown-visible
    * in the plan). Same output, proven by DedupSpec's equivalence test. */
  def minhashNearDupPairsKeyed(df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 64, bands: Int = 16, shingleSize: Int = 5,
      minJaccard: Double = 0.8,
      maxSigBroadcastBytes: Long = MaxSigBroadcastBytes): DataFrame =
    minhashPipeline(df, idCol, textCol, numHashes, bands, shingleSize,
      minJaccard, keyed = true, maxSigBroadcastBytes)

  /** Broadcast budget for the signature-enrichment table in
    * [[minhashPipeline]]. A signature row is (numHashes+1)·8 B — ~520 B at
    * 64 hashes, i.e. ~0.5 GB per MILLION docs: fine for a bench slice,
    * fatally past broadcastable for a real corpus. 64 MB keeps the
    * broadcast under executor-overhead noise (~128k docs at 64 hashes). */
  val MaxSigBroadcastBytes: Long = 64L << 20

  private def minhashPipeline(df: DataFrame, idCol: String, textCol: String,
      numHashes: Int, bands: Int, shingleSize: Int, minJaccard: Double,
      keyed: Boolean, maxSigBroadcastBytes: Long = MaxSigBroadcastBytes): DataFrame = {
    // 1. sign ONCE per doc with the fused rolling-shingle expression (no
    //    shingle arrays materialized; see MinHashTextSignature). The
    //    normalized text is computed by codegen'd builtins; only the final
    //    signature call is interpreted.
    val norm = lower(trim(regexp_replace(col(textCol), "\\s+", " ")))
    val sigExpr = graft.functions.MinHashTextSignature.minhashText(
      norm, shingleSize, numHashes)
    // keyed: the cache holds ids+signatures ONLY (numHashes longs per doc);
    // non-keyed: text rides along for the verify stage
    val base =
      if (keyed) df.select(col(idCol).as("id"), sigExpr.as("sig")).cache()
      else df.select(col(idCol).as("id"), col(textCol).as("text"))
        .withColumn("sig", sigExpr).cache()
    // 2. band explode carries IDS ONLY — never the text/gram payload
    //    (carrying text multiplies the shuffle by `bands`; measured 95 s →
    //    this shape is the difference between O(ids) and O(corpus·bands)
    //    shuffle bytes)
    val bandRows = base
      .select(col("id"), explode(lshBands(col("sig"), bands, numHashes))
        .as("bandrow"))
      .select(col("id"), col("bandrow.band").as("band"),
        col("bandrow.bucket").as("bucket"))
    // 3. candidate pairs + cheap signature-estimate prefilter (matching
    //    minhash fraction ≈ Jaccard; generous margin keeps recall, kills
    //    far pairs before the expensive exact set ops).
    // signatures are |docs| × (numHashes+1) longs — ~0.5 GB per MILLION
    // docs at 64 hashes — so broadcasting the table is only safe under a
    // size gate. The row count comes from the already-cached `base` (the
    // count also materializes the cache before its downstream reuses).
    // Two shapes (round-12 optimization, guide §2.4 "remove shuffles
    // outright"):
    //  - sigs BROADCASTABLE: attach both signatures to the band join's
    //    output IN-STAGE and keep each pair only at its FIRST agreeing
    //    band ([[graft.functions.FirstAgreeingBand]]) — exactly one row
    //    per candidate pair with NO pair-dedup exchange. The banded join
    //    emits a pair once per shared band (~bands × E[agreement] rows
    //    per pair; ~136M rows at sf0.1 for the r=1 τ=0.3 linkage family
    //    vs 12.5M distinct pairs), and dropDuplicates hash-exchanged all
    //    of them; the first-band filter runs in the join's own codegen
    //    stage and the estimate prefilter prunes in the same pass.
    //  - past the gate: dedup FIRST (exchange ∝ candidate multiplicity),
    //    then shuffle-join the signatures — attaching signatures to the
    //    multiplied rows would shuffle the larger stream twice. Identical
    //    output (DedupSpec pins the equivalence); this is the 100× shape
    //    where banding is tight and candidate multiplicity is near 1.
    val sigsPlain = base.select(col("id"), col("sig"))
    val sigsBroadcastable =
      base.count() * (numHashes + 1) * 8L <= maxSigBroadcastBytes
    val estScore = graft.functions.SignatureAgreement.agreement(
      col("sig_a"), col("sig_b")).cast("double") / lit(numHashes.toDouble)
    val withSigs: DataFrame => DataFrame = df => df
      .join((if (sigsBroadcastable) broadcast(sigsPlain) else sigsPlain)
        .select(col("id").as("id_a"), col("sig").as("sig_a")), Seq("id_a"))
      .join((if (sigsBroadcastable) broadcast(sigsPlain) else sigsPlain)
        .select(col("id").as("id_b"), col("sig").as("sig_b")), Seq("id_b"))
    // cache: `strong` feeds both the candidate-id semi-join and the final
    // result — without it the whole band+estimate pipeline runs twice
    val strong = (if (sigsBroadcastable) {
      val pairBands = bandRows.join(
          bandRows.select(col("band"), col("bucket"), col("id").as("id_b")),
          Seq("band", "bucket"))
        .filter(col("id") < col("id_b"))
        .select(col("id").as("id_a"), col("id_b"), col("band"))
      withSigs(pairBands)
        .filter(graft.functions.FirstAgreeingBand.firstBand(
            col("sig_a"), col("sig_b"), numHashes / bands) === col("band")
          && estScore >= lit(minJaccard) - 0.2)
        .select("id_a", "id_b")
    } else {
      val cands = bandRows.join(
          bandRows.select(col("band"), col("bucket"), col("id").as("id_b")),
          Seq("band", "bucket"))
        .filter(col("id") < col("id_b"))
        .select(col("id").as("id_a"), col("id_b"))
        .dropDuplicates("id_a", "id_b")
      withSigs(cands)
        .filter(estScore >= lit(minJaccard) - 0.2)
        .select("id_a", "id_b")
    }).cache()
    // 4. exact verification only on survivors — with HASHED shingle sets
    //    (sorted array<long>; Jaccard-equal to string sets absent 64-bit
    //    collisions, see HashedShingleSet). Two wins at candidate-set
    //    density: the per-pair payload drops ~2× (flat longs vs string
    //    offsets+bytes), and when the candidate gram table fits the
    //    broadcast budget the pair rows stream through two broadcast hash
    //    joins — NO array-carrying exchange at all (the string SMJ here
    //    measured 11 s on a 125k-pair candidate set; broadcast+longs: <1 s).
    //    Build sets ONLY for docs in a surviving pair (semi-join first).
    //    keyed: candidate text comes from a fresh by-key read of the source.
    val candIds = strong.select(col("id_a").as("id"))
      .union(strong.select(col("id_b").as("id"))).distinct()
    val textSource =
      if (keyed) df.select(col(idCol).as("id"), col(textCol).as("text"))
      else base
    val gramsPlain = textSource.join(candIds, Seq("id"), "left_semi")
      .select(col("id"), graft.functions.HashedShingleSet.hashedShingles(
        lower(trim(regexp_replace(col("text"), "\\s+", " "))),
        shingleSize).as("grams"))
      .cache()
    // one cheap agg on the cached table: materializes it before the double
    // use (un-populated caches race under one action) AND sizes the gate
    val gramStats = gramsPlain.agg(
      count(lit(1)).as("n"), sum(size(col("grams"))).as("els")).head()
    val gramBytes = 16L * gramStats.getLong(0) +
      8L * Option(gramStats.get(1)).map(_.asInstanceOf[Long]).getOrElse(0L)
    val grams = if (gramBytes <= maxSigBroadcastBytes) broadcast(gramsPlain)
                else gramsPlain
    strong
      .join(grams.select(col("id").as("id_a"), col("grams").as("g_a")), Seq("id_a"))
      .join(grams.select(col("id").as("id_b"), col("grams").as("g_b")), Seq("id_b"))
      .withColumn("jaccard", graft.functions.JaccardSortedLongArrays
        .jaccardSortedLong(col("g_a"), col("g_b")))
      .filter(col("jaccard") >= minJaccard)
      .select("id_a", "id_b", "jaccard")
  }

  /** INCREMENTAL exact dedup: flag each INCOMING doc as `is_known` (its
    * normalized fingerprint already exists in the reference corpus) and/or
    * `is_duplicate` (a lower-id incoming doc in the same batch has the same
    * fingerprint). This is how exact dedup actually runs in a production
    * ingest loop: the corpus is already deduped, so only new-vs-corpus and
    * new-vs-new comparisons happen — never a corpus self-join.
    *
    * Scale shape: corpus side reduces to DISTINCT fingerprints (64-bit
    * longs — the only thing that crosses the wire, ~8 B/doc), one
    * left-semi-shaped join against the incoming batch (typically tiny vs
    * the corpus → the batch's fingerprint set is the natural broadcast
    * side at real scale), one within-batch window. At 100 TB the corpus
    * fingerprint set is a bucketed table maintained across ingests. */
  def incrementalExact(incoming: DataFrame, corpus: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    val fp = TextFeatures.fingerprint(col(textCol))
    val known = corpus.select(fp.as("__fp")).distinct()
      .withColumn("__known", lit(true))
    val w = Window.partitionBy(col("__fp"))
    incoming.withColumn("__fp", fp)
      .join(known, Seq("__fp"), "left")
      .withColumn("is_known", coalesce(col("__known"), lit(false)))
      .withColumn("is_duplicate", col(idCol) =!= min(col(idCol)).over(w))
      .drop("__fp", "__known")
  }

  /** CROSS-CORPUS MinHash near-dup pairs: candidate pairs between an
    * INCOMING batch and an EXISTING corpus only — never corpus×corpus.
    * The LSH band join goes batch-side × corpus-side (shuffle ∝ both
    * inputs' band rows, pair volume ∝ genuinely-similar mass), each
    * survivor verified by exact shingle Jaccard like [[minhashNearDupPairs]].
    * Output: (id_new, id_corpus, jaccard). At scale the corpus signatures
    * are precomputed and stored; here they're derived in-plan from the
    * same fused expression. */
  def minhashCrossPairs(incoming: DataFrame, corpus: DataFrame,
      idCol: String, textCol: String,
      numHashes: Int = 64, bands: Int = 16, shingleSize: Int = 5,
      minJaccard: Double = 0.8,
      maxSigBroadcastBytes: Long = MaxSigBroadcastBytes): DataFrame = {
    def norm(c: Column) = lower(trim(regexp_replace(c, "\\s+", " ")))
    val sigExpr = graft.functions.MinHashTextSignature.minhashText(
      norm(col(textCol)), shingleSize, numHashes)
    // signatures cached per side; band rows carry IDS ONLY (the band
    // explode multiplies whatever it carries by `bands` — see
    // minhashPipeline). The batch sig table is USUALLY small and then
    // broadcasts into the estimate prefilter — but only under the same
    // size gate as minhashPipeline (a bulk-backfill batch of millions of
    // docs is (numHashes+1)·8 B per doc and would blow the broadcast
    // budget); past the gate it joins by shuffle on id, like the corpus
    // sig table always does.
    val newSigs = incoming.select(col(idCol).as("id_new"), sigExpr.as("sig_n"))
      .cache()
    val corpusSigs = corpus.select(col(idCol).as("id_corpus"),
      sigExpr.as("sig_c")).cache()
    // materialize BOTH sig caches eagerly: each is reused by 2-3 downstream
    // branches of one action, and un-populated caches race — concurrent
    // stages each recompute the 64-hash signature expression (measured 10.5 s
    // vs 1.7 s for the same-corpus pipeline, which materializes via its
    // size-gate count)
    val newCount = newSigs.count(); corpusSigs.count()
    val newSigsGated =
      if (newCount * (numHashes + 1) * 8L <= maxSigBroadcastBytes)
        broadcast(newSigs)
      else newSigs
    def bandRows(sigs: DataFrame, idName: String, sigName: String) = sigs
      .select(col(idName),
        explode(lshBands(col(sigName), bands, numHashes)).as("bandrow"))
      .select(col(idName), col("bandrow.band").as("band"),
        col("bandrow.bucket").as("bucket"))
    val estScore = graft.functions.SignatureAgreement.agreement(
      col("sig_n"), col("sig_c")).cast("double") / lit(numHashes.toDouble)
    val cands = bandRows(newSigs, "id_new", "sig_n")
      .join(bandRows(corpusSigs, "id_corpus", "sig_c"), Seq("band", "bucket"))
      .select(col("id_new"), col("id_corpus"))
      .dropDuplicates("id_new", "id_corpus")
      .join(newSigsGated, Seq("id_new"))
      .join(corpusSigs, Seq("id_corpus"))
      .filter(estScore >= lit(minJaccard) - 0.2)
      .select(col("id_new"), col("id_corpus"))
      .cache()
    cands.count() // eager for the same reason: 3 downstream branches
    // exact verify over HASHED shingle sets with size-gated broadcast per
    // side (see minhashPipeline step 4 — same plan shape, two sources).
    // The sides stay separate tables: id_new and id_corpus are distinct id
    // spaces, and at real scale the batch side is small while the corpus
    // side is bounded by candidate-touched docs.
    def grams(df: DataFrame, idAs: String, gAs: String) = {
      val g = df
        .select(col(idCol).as(idAs), col(textCol).as("__t"))
        .join(cands.select(col(idAs)).distinct(), Seq(idAs), "left_semi")
        .select(col(idAs), graft.functions.HashedShingleSet.hashedShingles(
          lower(trim(regexp_replace(col("__t"), "\\s+", " "))),
          shingleSize).as(gAs))
        .cache()
      val st = g.agg(count(lit(1)), sum(size(col(gAs)))).head()
      val bytes = 16L * st.getLong(0) +
        8L * Option(st.get(1)).map(_.asInstanceOf[Long]).getOrElse(0L)
      if (bytes <= MaxSigBroadcastBytes) broadcast(g) else g
    }
    cands
      .join(grams(incoming, "id_new", "g_n"), Seq("id_new"))
      .join(grams(corpus, "id_corpus", "g_c"), Seq("id_corpus"))
      .withColumn("jaccard", graft.functions.JaccardSortedLongArrays
        .jaccardSortedLong(col("g_n"), col("g_c")))
      .filter(col("jaccard") >= minJaccard)
      .select(col("id_new"), col("id_corpus"), col("jaccard"))
  }

  /** Near-duplicate GROUPS from a pair list: connected components by
    * iterative min-id label propagation — the step a dedup pipeline runs
    * AFTER pair generation, so "A≈B, B≈C" collapses to ONE canonical doc
    * even when (A,C) was never emitted as a pair.
    *
    * Scale design: each iteration is one equi-join + one partial-aggregated
    * groupBy (shuffle ∝ edges), and the iteration count is the component
    * DIAMETER — near-dup clusters are shallow (stars/cliques), so 3-5
    * rounds close them. Pathological long chains would want the
    * large-star/small-star variant; for dedup graphs plain propagation is
    * the right cost. Deterministic: the canonical id is the component min.
    *
    * @param pairs frame with columns (id_a, id_b), one row per near-dup pair
    * @return (id, label) — every id appearing in a pair, labeled with its
    *         component's minimum id
    */
  def nearDupGroups(pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    // localCheckpoint (NOT cache) on every iteration frame: caching keeps
    // the full logical lineage, so iteration i's plan nests i copies of the
    // whole upstream pipeline and the optimizer re-walks it per round —
    // measured 125 s for a 98-node graph. Checkpointing truncates the plan
    // to a materialized-RDD scan; the loop is then join+agg on actual data.
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .distinct()
      .localCheckpoint(true)
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint(true)
    // convergence via the exact label-sum: labels are min-propagated, so
    // they only ever DECREASE — the sum is strictly monotone until the
    // fixpoint, and sum equality ⟺ no label changed. One decimal aggregate
    // per round instead of a join + filter + count (decimal(38,0): exact at
    // any node count; a double sum could miss a small change in rounding).
    // SUM over zero rows is SQL NULL — an empty pair list (a corpus with no
    // near-dups) must converge to an empty label set, not NPE.
    def labelSum(df: DataFrame): java.math.BigDecimal =
      Option(df.agg(sum(col("label").cast("decimal(38,0)"))).head().getDecimal(0))
        .getOrElse(java.math.BigDecimal.ZERO)
    var prevSum = labelSum(labels)
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val prop = edges.join(labels, edges("dst") === labels("id"))
        .select(edges("src").as("id"), col("label"))
      val next = labels.unionByName(prop)
        .groupBy(col("id")).agg(min(col("label")).as("label"))
        .localCheckpoint(true)
      val nextSum = labelSum(next)
      labels = next
      converged = nextSum.compareTo(prevSum) == 0
      prevSum = nextSum
      i += 1
    }
    labels
  }

  /** CONTAINMENT dedup: pairs (id_a, id_b) where document b's full token
    * sequence appears contiguously inside document a — the "document B is a
    * slice of document A" case (truncated re-crawls, quoted articles,
    * prefix/suffix copies) that similarity dedup under-weighs because the
    * Jaccard of a 60% slice against its source is ≈ 0.6, not ≈ 1.
    *
    * Method: winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03 —
    * the MOSS scheme). Each doc derives word `k`-gram hashes and keeps the
    * minimum hash of every `w`-gram window. Selection depends only on the
    * local window content, so a contained token run selects THE SAME
    * fingerprints inside the container: every fingerprint of b appears in a
    * ⇒ blocking on any shared fingerprint has recall 1.0 for token-aligned
    * containment, with candidate volume ∝ shared-phrase mass, never
    * all-pairs. Survivors are verified EXACTLY (' '+norm_b+' ' substring of
    * ' '+norm_a+' ') — single-spaced normalization makes token-sequence
    * containment equal delimiter-padded substring containment, which is
    * what the brute-force DuckDB twin recomputes.
    *
    * Contract: only docs with ≥ k+w-1 tokens are eligible as the CONTAINED
    * side (shorter docs yield no full fingerprint window); equal-length
    * duplicates emit both orientations. Output: (id_a, id_b), b ⊆ a. */
  def containmentPairs(df: DataFrame, idCol: String, textCol: String,
      k: Int = 8, w: Int = 4): DataFrame = {
    val minToks = k + w - 1
    val norm = lower(trim(regexp_replace(col(textCol), "\\s+", " ")))
    // cache = projection-collapse barrier: everything below reads the
    // normalized text / token attributes, not the regex pipeline
    val base = df.select(col(idCol).as("id"), norm.as("norm"))
      .withColumn("ntok", size(split(col("norm"), " ")))
      .cache()
    // fused one-pass winnowing (gram hash + window min + distinct) — the
    // compositional HOF pipeline was interpreted per gram and ~7× slower
    val fps = base.filter(col("ntok") >= minToks)
      .withColumn("fp", explode(
        graft.functions.WinnowFingerprints.fps(col("norm"), k, w)))
      .select(col("id"), col("ntok"), col("fp"))
    // candidates: any shared fingerprint, container at least as long
    val cands = fps.select(col("id").as("id_a"), col("ntok").as("ntok_a"),
        col("fp"))
      .join(fps.select(col("id").as("id_b"), col("ntok").as("ntok_b"),
        col("fp")), Seq("fp"))
      .filter(col("id_a") =!= col("id_b") && col("ntok_a") >= col("ntok_b"))
      .select("id_a", "id_b").distinct()
    // exact verify: delimiter-padded substring containment on the
    // normalized text, re-read BY KEY (texts never ride the candidate join)
    cands
      .join(base.select(col("id").as("id_a"), col("norm").as("n_a")), Seq("id_a"))
      .join(base.select(col("id").as("id_b"), col("norm").as("n_b")), Seq("id_b"))
      .filter(contains(concat(lit(" "), col("n_a"), lit(" ")),
        concat(lit(" "), col("n_b"), lit(" "))))
      .select(col("id_a"), col("id_b"))
  }

  /** EXACT-SUBSTRING near-dup pairs — CHARACTER-level verbatim-run
    * detection (the ExactSubstr family of training-data dedup): documents
    * sharing ≥ `minShared` distinct character runs of length `runLen`.
    * Complements [[containmentPairs]] (word-gram winnowing): a verbatim
    * 50-char quote inside otherwise-different documents trips this and
    * nothing else.
    *
    * Scale shape — NOTHING but 64-bit hashes and doc ids ever reaches an
    * exchange (the [[contaminationPairs]] wire discipline; the string mode
    * that shipped ~30× corpus bytes through the explode shuffle is gone):
    *  1. per-doc distinct run hashes from the fused single-pass
    *     [[graft.functions.CharRunHashes]] expression — position-collapse
    *     happens INSIDE the expression, so there is no gram-table
    *     `distinct` shuffle and no interpreted per-window HOF;
    *  2. ONE corpus exchange: per-hash id lists collected by the BOUNDED
    *     [[graft.functions.BoundedIdsAgg]] (cap = maxDf+1, sticky-full —
    *     the [[PostingsAgg]] skew discipline), so a boilerplate run ships
    *     ≤ maxDf+1 ids per input partition instead of its whole posting
    *     list, and the df gate is a post-agg size filter that loses
    *     nothing it wouldn't drop anyway; pairs are then generated
    *     IN-ARRAY map-side (the [[Aggregates.coOccurrence]] discipline —
    *     never a gram-table self-join), fan-out ≤ maxDf·(maxDf−1)/2 by
    *     construction; the pairing agg carries each pair's gated run-hash
    *     set (bounded by the pair's true shared-run count);
    *  3. exact verify on the CANDIDATE-BOUNDED pair set: texts re-read BY
    *     KEY (the [[containmentPairs]] discipline — candidate pairs are few,
    *     so the plan broadcasts them and the corpus never shuffles), shared
    *     runs recomputed as a per-row string `array_intersect`, counted only
    *     where the run's re-hash is in the pair's gated set. A cross-doc
    *     hash collision (different strings, equal hash) therefore CANNOT
    *     create a false pair or inflate `n_shared`. The only residual
    *     inexactness is a collision inflating a run's document frequency
    *     past `maxDf` (dropping a true run from the gate) — the same
    *     ~n²/2⁶⁴ trade [[exactDuplicates]] and [[contaminationPairs]]
    *     already accept. */
  def exactSubstrPairs(df: DataFrame, idCol: String, textCol: String,
      runLen: Int = 30, maxDf: Int = 50, minShared: Int = 3): DataFrame = {
    import graft.functions.CharRunHashes
    // Fan out BEFORE the ×runLen gram explosion when (and only when) the
    // scan is under-parallel: split count reflects file bytes, not
    // post-explode compute, so a single small file would pin the whole
    // gram pass to ONE task. Guarded — at 100 TB the scan already has
    // thousands of splits and an unconditional repartition would push
    // corpus text through an exchange for nothing. cache = the
    // [[containmentPairs]] projection barrier (texts re-read by key below;
    // the gram pass and the verify joins all read this one frame).
    val spark = df.sparkSession
    val base = df.filter(length(col(textCol)) >= runLen)
      .select(col(idCol).as("id"), col(textCol).as("txt"))
    val docs = (if (base.rdd.getNumPartitions <
        spark.sparkContext.defaultParallelism / 2) base.repartition()
      else base).cache()
    val grams = docs.select(col("id"),
      explode(CharRunHashes.runs(col("txt"), runLen)).as("h"))
    val boundedIds = udaf(new graft.functions.BoundedIdsAgg(maxDf + 1))
    val cands = grams.groupBy(col("h"))
      .agg(boundedIds(col("id")).as("ids"))
      // size = maxDf+1 means the sticky-full cap was hit: df > maxDf
      .filter(size(col("ids")) >= 2 && size(col("ids")) <= maxDf)
      .select(col("h"), explode(expr(
        "flatten(transform(ids, (a, i) -> " +
          "transform(slice(ids, i + 2, size(ids)), " +
          "b -> struct(a AS id_a, b AS id_b))))")).as("p"))
      .groupBy(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"))
      .agg(collect_set(col("h")).as("hs"))
      .filter(size(col("hs")) >= minShared)
    def runsOf(t: Column): Column = expr(
      s"transform(sequence(1, length(${t.toString}) - $runLen + 1), " +
        s"i -> substring(${t.toString}, i, $runLen))")
    cands
      .join(docs.select(col("id").as("id_a"), col("txt").as("t_a")), Seq("id_a"))
      .join(docs.select(col("id").as("id_b"), col("txt").as("t_b")), Seq("id_b"))
      .withColumn("n_shared",
        size(filter(array_intersect(runsOf(col("t_a")), runsOf(col("t_b"))),
          r => array_contains(col("hs"), CharRunHashes.hashOf(r, runLen))))
          .cast("long"))
      .filter(col("n_shared") >= minShared)
      .select(col("id_a"), col("id_b"), col("n_shared"))
  }

  /** BOILERPLATE REMOVAL (CCNet/RefinedWeb-style cleaning): lines repeated
    * across ≥ `minDocs` DISTINCT documents (footers, headers, nav chrome)
    * are dropped from every document; per-doc output is the removed-line
    * count and the cleaned text (as md5 — verifiable cross-engine without
    * shipping full texts through the compare).
    *
    * Scale shape: one explode (lines ∝ corpus), one distinct-count
    * aggregation on the line key (map-side partial), one hash join of lines
    * against the (tiny, high-frequency-only) boilerplate set, one per-doc
    * regroup. The line-frequency table is the only global state and its
    * high-df tail is small by definition — this is the same job at 100 TB.
    * Line order is restored from the ordinal captured at explode time, so
    * the rebuild is deterministic. */
  def boilerplateRemoval(df: DataFrame, idCol: String, textCol: String,
      minDocs: Long): DataFrame = {
    val lines = df.select(col(idCol).as("id"),
      posexplode(split(col(textCol), "\n")).as(Seq("line_no", "line")))
    val freq = lines.groupBy(col("line"))
      .agg(countDistinct(col("id")).as("df"))
      .filter(col("df") >= minDocs)
      .select(col("line"))
    val flagged = lines.join(freq.withColumn("__boiler", lit(true)),
        Seq("line"), "left")
      .withColumn("__boiler", coalesce(col("__boiler"), lit(false)))
    flagged.groupBy(col("id"))
      .agg(
        sum(when(col("__boiler"), 1L).otherwise(0L)).as("n_removed"),
        md5(concat_ws("\n", transform(
          array_sort(collect_list(
            when(!col("__boiler"), struct(col("line_no"), col("line"))))),
          s => s.getField("line")))).as("clean_md5"))
      .orderBy(col("id"))
  }

  /** BENCHMARK DECONTAMINATION: find training docs that share any word
    * `n`-gram with a benchmark/eval set — the standard n-gram overlap rule
    * (n=13 is the convention) an LLM data pipeline runs before training so
    * eval questions don't leak into the corpus. Output: one row per
    * contaminated (doc, benchmark item) pair with the count of distinct
    * shared n-grams; the caller drops or audits flagged docs.
    *
    * Scale shape: the benchmark side is SMALL by nature (eval suites are
    * ~10^5 items), so its distinct hashed grams BROADCAST; the corpus side
    * is one streaming pass (explode → broadcast-hash-join → partial-agg
    * groupBy) — no corpus shuffle at all before the tiny aggregation, no
    * all-pairs anything. Grams cross the wire as 64-bit hashes, never
    * strings (same collision trade as [[exactDuplicates]]). Docs or bench
    * items shorter than `n` tokens yield no grams (a 13-gram can't exist
    * in 12 tokens).
    *
    * Gram hashing is the fused [[graft.functions.WinnowFingerprints]]
    * expression with w=1 — a window-min over ONE gram is exactly the
    * distinct gram-hash set, computed in a single JVM pass over the
    * normalized chars. The compositional sequence+transform+slice+hash
    * pipeline is interpreted per gram and measured 4.9 s at sf0.1; the
    * fused form is ~0.5 s for the same output. */
  /** Distinct hashed word n-grams of raw text (normalization + the fused
    * [[graft.functions.WinnowFingerprints]] pass at w=1). Shared by batch
    * [[contaminationPairs]] and the streaming decontamination semi-join
    * ([[graft.streaming.Streams.decontaminateStream]]). */
  def gramHashes(c: Column, n: Int): Column =
    graft.functions.WinnowFingerprints.fps(
      lower(trim(regexp_replace(c, "\\s+", " "))), n, 1)

  def contaminationPairs(docs: DataFrame, idCol: String, textCol: String,
      bench: DataFrame, benchIdCol: String, benchTextCol: String,
      n: Int = 13): DataFrame = {
    def grams(c: Column): Column = gramHashes(c, n)
    val docGrams = docs.select(col(idCol).as("doc_id"),
      explode(grams(col(textCol))).as("g"))
    val benchGrams = bench.select(col(benchIdCol).as("bench_id"),
      explode(grams(col(benchTextCol))).as("g")).distinct()
    // grams are already distinct WITHIN each doc and bench item, so a plain
    // count after the join IS the distinct-shared-gram count
    docGrams.join(broadcast(benchGrams), Seq("g"))
      .groupBy(col("doc_id"), col("bench_id"))
      .agg(count(lit(1)).as("n_shared"))
  }

  /** WITHIN-DOC LINE DEDUP (first-occurrence-wins, per document): a line
    * repeated INSIDE one document — nav chrome duplicated by a scraper,
    * chat-log echo, template stutter — keeps its first occurrence only.
    * Complements [[paragraphDedup]] (cross-doc) and [[boilerplateRemoval]]
    * (corpus-frequency gate): within-doc repeats with corpus df = 1 are
    * invisible to both.
    *
    * Scale shape: ZERO data shuffles — the whole decision is per-document
    * array algebra (a line is kept iff `array_position` of its value
    * equals its own ordinal, i.e. it IS the first occurrence), evaluated
    * map-side; the only exchange is the output ordering. Lines compare
    * EXACTLY (no normalization — within one document a byte-identical
    * repeat is the signal; cross-doc fuzziness belongs to the other two
    * operators). Output per doc: line counts and the md5 of the cleaned
    * text, verifiable cross-engine without shipping texts. */
  def lineDedup(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("id"), split(col(textCol), "\n").as("ls"))
      .withColumn("kept", expr(
        """filter(transform(ls, (l, i) -> struct(l AS l, i AS i)),
           s -> array_position(ls, s.l) = s.i + 1)"""))
      .select(col("id"),
        size(col("ls")).cast("long").as("n_lines"),
        (size(col("ls")) - size(col("kept"))).cast("long").as("n_removed"),
        md5(concat_ws("\n", expr("transform(kept, s -> s.l)"))).as("clean_md5"))
      .orderBy(col("id"))

  /** PARAGRAPH DEDUP (cross-doc, first-occurrence-wins): a paragraph that
    * already appeared anywhere earlier in the corpus — same doc or a
    * different one, compared after lower+trim normalization — is dropped;
    * the FIRST occurrence in (id, position) order survives. This is the
    * sub-document dedup step a training-data pipeline runs between
    * whole-doc dedup (which misses shared passages in distinct docs) and
    * boilerplate removal (which only strips HIGH-frequency lines —
    * a passage pasted into two docs has df=2 and survives
    * [[boilerplateRemoval]], but exactly one copy should survive here).
    *
    * Scale shape: one explode (paragraphs ∝ corpus), one shuffle on the
    * 64-bit paragraph fingerprint (paragraph text never crosses the wire
    * for winner election — same trade as [[exactDuplicates]]; a 64-bit
    * collision could merge two distinct paragraphs, vanishingly unlikely
    * and detectable by verify-on-read), one per-doc regroup to rebuild the
    * cleaned text. Winner election is a rank-1 window inside each
    * fingerprint bucket — buckets are tiny (dup-group size), so the sort
    * is per-group, never global. Empty/whitespace paragraphs are exempt
    * (every doc keeps its blank separators). */
  def paragraphDedup(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val paras = df.select(col(idCol).as("id"),
      posexplode(split(col(textCol), "\n")).as(Seq("pos", "para")))
    val keyed = paras.withColumn("__norm", lower(trim(col("para"))))
      .withColumn("__pk", xxhash64(col("__norm")))
    val w = Window.partitionBy(col("__pk")).orderBy(col("id"), col("pos"))
    val flagged = keyed
      .withColumn("__rn", row_number().over(w))
      .withColumn("__dup", col("__norm") =!= "" && col("__rn") > 1)
    flagged.groupBy(col("id"))
      .agg(
        sum(when(col("__dup"), 1L).otherwise(0L)).as("n_removed"),
        md5(concat_ws("\n", transform(
          array_sort(collect_list(
            when(!col("__dup"), struct(col("pos"), col("para"))))),
          s => s.getField("para")))).as("clean_md5"))
      .orderBy(col("id"))
  }

  /** Connected components by ALTERNATING LARGE-STAR / SMALL-STAR rounds —
    * the public MapReduce-CC construction (Kiveris et al., "Connected
    * Components in MapReduce and Beyond", SoCC'14): the LONG-CHAIN path.
    * Plain label propagation ([[nearDupGroups]]) needs component-DIAMETER
    * rounds; star alternation contracts every component toward a star in
    * O(log) rounds, each round two edge-proportional shuffles. Same output
    * contract as [[nearDupGroups]]: (id, label = component minimum) for
    * every id appearing in a pair. Prefer [[nearDupGroups]] for shallow
    * dedup graphs (stars/cliques — fewer total shuffles); use this when
    * components can be deep (transitive similarity chains). */
  /** CLUSTER REPRESENTATIVE SELECTION — the step that turns near-dup
    * CLUSTERS into a deduplicated CORPUS: for every connected component
    * of the near-dup graph keep exactly one document (the
    * highest-quality member, ties to the smallest id — a total order, so
    * the choice is deterministic), and keep every unclustered document
    * untouched. Returns (idCol, cluster_id, cluster_size, kept) for
    * every input doc: `kept` marks the representative / singleton rows,
    * so the caller can either filter the corpus or audit what a filter
    * would drop.
    *
    * Plan: components from [[nearDupGroups]] (ids only — never text);
    * the docs⋈labels join is a LEFT join on id (clustered ids are a
    * small fraction of the corpus; AQE broadcasts the label side when it
    * measures small, and a 100 TB corpus shuffles on id, its natural
    * key); the per-cluster argmax is one window over cluster_id, whose
    * partition count is the component count, not the corpus size —
    * singletons take the size-1 fast path in the same frame. */
  def clusterRepresentatives(docs: DataFrame, pairs: DataFrame,
      idCol: String, qualityCol: String): DataFrame = {
    val labels = nearDupGroups(pairs)
      .select(col("id").as(idCol), col("label"))
    val labeled = docs.select(col(idCol), col(qualityCol))
      .join(labels, Seq(idCol), "left")
      .withColumn("cluster_id", coalesce(col("label"), col(idCol)))
    val w = Window.partitionBy(col("cluster_id"))
    val rank = row_number().over(w.orderBy(desc(qualityCol), col(idCol)))
    labeled
      .withColumn("cluster_size", count(lit(1)).over(w))
      .withColumn("kept", (rank === 1).cast("boolean"))
      .select(col(idCol), col("cluster_id"), col("cluster_size"),
        col("kept"))
      .orderBy(col(idCol))
  }

  def nearDupGroupsStar(pairs: DataFrame, maxIter: Int = 64): DataFrame =
    nearDupGroupsStarCounted(pairs, maxIter)._1

  /** [[nearDupGroupsStar]] plus the executed round count, exposed so the
    * O(log n)-rounds convergence claim is pinned by spec, not asserted in
    * prose. */
  def nearDupGroupsStarCounted(pairs: DataFrame,
      maxIter: Int = 64): (DataFrame, Int) = {
    val nodes = pairs.select(col("id_a").as("id"))
      .union(pairs.select(col("id_b").as("id"))).distinct()
      .localCheckpoint(true)
    // canonical undirected edge set: (u < v), deduped; self-loops dropped.
    // localCheckpoint per round, as in nearDupGroups — cache() would nest
    // the full lineage and re-optimize a growing plan every iteration.
    var edges = pairs.filter(col("id_a") =!= col("id_b"))
      .select(least(col("id_a"), col("id_b")).as("u"),
        greatest(col("id_a"), col("id_b")).as("v"))
      .distinct()
      .localCheckpoint(true)
    var prevCount = edges.count()
    var converged = false
    var rounds = 0
    while (!converged && rounds < maxIter) {
      // LARGE-STAR: center every node u over its full neighborhood; every
      // strictly-larger neighbor v re-attaches to m = min(Γ(u) ∪ {u}).
      // m ≤ u < v, so (m, v) is already canonical.
      val sym = edges.union(edges.select(col("v").as("u"), col("u").as("v")))
      val mins = sym.groupBy(col("u")).agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("m"))
      val ls = sym.join(mins, Seq("u"))
        .filter(col("v") > col("u"))
        .select(col("m").as("u"), col("v"))
        .distinct()
        .localCheckpoint(true)
      // SMALL-STAR: center at the larger endpoint c over its smaller
      // neighbors; all of them (and c itself) re-attach to the smallest.
      val dir = ls.select(col("v").as("c"), col("u").as("n")) // c > n
      val mins2 = dir.groupBy(col("c")).agg(min(col("n")).as("m"))
      val ss = dir.join(mins2, Seq("c"))
        .filter(col("n") =!= col("m"))
        .select(col("m").as("u"), col("n").as("v")) // m < n by minimality
        .union(mins2.select(col("m").as("u"), col("c").as("v"))) // m < c
        .distinct()
        .localCheckpoint(true)
      // fixed point of the alternation = identical canonical edge set:
      // |A| = |B| ∧ |A ∪ B| = |A| ⟺ A = B (exact, unlike a hash-sum
      // proxy). The previous round's count is carried, so the test costs
      // one count on the new set + one on the union — not three.
      val cntOld = prevCount
      val cntNew = ss.count()
      converged = cntNew == cntOld &&
        ss.union(edges).distinct().count() == cntOld
      edges = ss
      prevCount = cntNew
      rounds += 1
    }
    // converged graph is a star per component: every edge is (min, member)
    val symF = edges.union(edges.select(col("v").as("u"), col("u").as("v")))
    val labels = symF.groupBy(col("u")).agg(min(col("v")).as("mn"))
      .select(col("u").as("id"), least(col("u"), col("mn")).as("label"))
    // nodes that only ever appeared in self-pairs label themselves
    val out = labels.unionByName(
      nodes.join(labels, Seq("id"), "left_anti")
        .select(col("id"), col("id").as("label")))
    (out, rounds)
  }

  /** N-gram (word) Jaccard near-dup pairs, exact result, MinHash-LSH
    * candidate generation over the n-gram sets. Length-band blocking was the
    * first cut here and measured 89 s at sf0.1 — bands of ±10% length still
    * admit ~|corpus|²/20 pairs with full gram arrays on both sides. LSH
    * bounds candidates by actual similarity, and the exact Jaccard filter on
    * survivors keeps the result exact (candidate recall is the only
    * approximation, as with every LSH dedup at scale). */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, minJaccard: Double = 0.5,
      numHashes: Int = 64, bands: Int = 16): DataFrame = {
    // cache() between grams and sig is deliberate: it blocks projection
    // collapse, so the (interpreter-evaluated) n-gram pipeline runs once at
    // materialization and the signature's child is a plain attribute read
    val withGrams = df.select(col(idCol).as("id"),
      TextFeatures.wordNgrams(col(textCol), n).as("grams")).cache()
    val base = withGrams.withColumn("sig",
      graft.functions.MinHashSignature.minhash(col("grams"), numHashes))
    val bandRows = base
      .select(col("id"), explode(lshBands(col("sig"), bands, numHashes))
        .as("bandrow"))
      .select(col("id"), col("bandrow.band").as("band"),
        col("bandrow.bucket").as("bucket"))
    val cands = bandRows.join(
        bandRows.select(col("band"), col("bucket"), col("id").as("id_b")),
        Seq("band", "bucket"))
      .filter(col("id") < col("id_b"))
      .select(col("id").as("id_a"), col("id_b"))
      .dropDuplicates("id_a", "id_b")
    val grams = base.select(col("id"), sort_array(col("grams")).as("grams"))
    cands
      .join(grams.select(col("id").as("id_a"), col("grams").as("g_a")), Seq("id_a"))
      .join(grams.select(col("id").as("id_b"), col("grams").as("g_b")), Seq("id_b"))
      .withColumn("jaccard", graft.functions.JaccardSortedArrays
        .jaccardSorted(col("g_a"), col("g_b")))
      .filter(col("jaccard") >= minJaccard)
      .select("id_a", "id_b", "jaccard")
  }

  /** Set-similarity join by PREFIX FILTERING (the AllPairs/PPJoin family):
    * exact word-n-gram Jaccard ≥ num/den pairs with candidates from the
    * rarest-first prefix instead of MinHash-LSH banding.
    *
    * Principle: order every document's gram set by ascending global
    * document frequency (rarest first); two sets with Jaccard ≥ θ MUST
    * share at least one gram among the first `s − ⌈θ·s⌉ + 1` of each
    * (pigeonhole on the ≥ ⌈θ·s⌉-sized intersection any qualifying pair
    * needs). Only prefix grams enter the pairing self-join, and rare
    * grams have tiny postings — the candidate set is bounded by actual
    * rarity, with recall EXACTLY 1 (no LSH band-miss probability).
    * Complement to [[ngramJaccardPairs]]: same exact result contract,
    * deterministic candidate generation.
    *
    * Scale posture: grams cross the df/candidate exchanges only as
    * xxhash64 longs (collisions can only ADD candidates — removed by the
    * exact verify); the length filter `den·min ≥ num·max` prunes
    * impossible pairs inside the join condition; gram text appears only
    * in the per-doc sorted arrays joined back by id for the verify. */
  def prefixJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int = 2, num: Long = 1L, den: Long = 2L): DataFrame = {
    // cache blocks projection collapse: the gram pipeline runs once
    val withGrams = df.select(col(idCol).as("id"),
      TextFeatures.wordNgrams(col(textCol), n).as("grams")).cache()
    val gramRows = withGrams
      .select(col("id"), explode(col("grams")).as("g"))
      .select(col("id"), xxhash64(col("g")).as("gh"))
    val dfc = gramRows.groupBy(col("gh")).agg(count(lit(1)).as("dfc"))
    // per-doc grams ordered (df asc, hash asc) = rarest-first, then the
    // prefix slice p = s − ⌈s·num/den⌉ + 1 (integer-exact ceil)
    val ordered = gramRows.join(dfc, Seq("gh"))
      .groupBy(col("id"))
      .agg(sort_array(collect_list(struct(col("dfc"), col("gh"))))
        .as("ord"))
      .withColumn("sz", size(col("ord")).cast("long"))
      .withColumn("p",
        expr(s"cast(sz - ((sz * $num + $den - 1) div $den) + 1 as int)"))
    val prefixes = ordered
      .select(col("id"), col("sz"),
        explode(slice(col("ord"), lit(1), col("p"))).as("pe"))
      .select(col("id"), col("sz"), col("pe.gh").as("gh"))
    val cands = prefixes
      .join(prefixes.select(col("gh").as("gh_b"), col("id").as("id_b"),
          col("sz").as("sz_b")),
        col("gh") === col("gh_b") && col("id") < col("id_b")
          && col("sz") * den >= col("sz_b") * num
          && col("sz_b") * den >= col("sz") * num)
      .select(col("id").as("id_a"), col("id_b"))
      .dropDuplicates("id_a", "id_b")
    val grams = withGrams.select(col("id"), sort_array(col("grams")).as("sg"))
    cands
      .join(grams.select(col("id").as("id_a"), col("sg").as("g_a")),
        Seq("id_a"))
      .join(grams.select(col("id").as("id_b"), col("sg").as("g_b")),
        Seq("id_b"))
      .withColumn("jaccard", graft.functions.JaccardSortedArrays
        .jaccardSorted(col("g_a"), col("g_b")))
      .filter(col("jaccard") >= num.toDouble / den.toDouble)
      .select("id_a", "id_b", "jaccard")
  }

  /** SORTED-NEIGHBORHOOD near-dup pairs (Hernández–Stolfo 1995) — the
    * third blocking strategy next to LSH ([[minhashLshPairs]],
    * probabilistic) and prefix filtering ([[prefixJaccardPairs]],
    * df-bounded): sort the corpus by the text itself and compare only
    * rows within a fixed `window` of the sort order. Catches exactly
    * the duplicates that share a sort prefix — on prefix-preserving
    * corpora (boilerplate, templated docs, log lines) that is all of
    * them at a fraction of the candidate cost: candidates = (window−1)·n
    * regardless of gram statistics, where AllPairs degrades on
    * low-vocabulary grams (the q_prefix_join bigram incident) and LSH
    * pays band×row signatures.
    *
    * The global sort rank is computed WITHOUT a global sort: rank
    * within a key-prefix shard (prefix order respects key order) plus
    * broadcast shard offsets — the [[Sampling.deterministicShuffle]]
    * shape. Window pairs come from one rank equi-join (offsets
    * exploded 1..window−1); gram arrays join back BY ID for the exact
    * verify, so only (rank, id) ints cross the pairing exchanges.
    * Prefix-shard skew on templated corpora is bounded by widening
    * `shardPrefix` — boundary pairs stay correct at any width because
    * the rank is global. */
  def sortedNeighborPairs(df: DataFrame, idCol: String, textCol: String,
      window: Int = 10, n: Int = 4, num: Long = 1L, den: Long = 2L,
      shardPrefix: Int = 2): DataFrame = {
    require(window >= 2)
    val base = df.select(col(idCol).as("id"), col(textCol).as("key"),
      graft.functions.TextFeatures.wordNgrams(col(textCol), n).as("grams"))
      .withColumn("__shard", substring(col("key"), 1, shardPrefix))
      .cache()
    val counts = base.groupBy(col("__shard")).agg(count(lit(1)).as("__n"))
    val wOff = Window.orderBy(col("__shard"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = counts
      .withColumn("__off", coalesce(sum(col("__n")).over(wOff), lit(0L)))
      .select(col("__shard"), col("__off"))
    val wIn = Window.partitionBy(col("__shard"))
      .orderBy(col("key"), col("id"))
    val ranked = base
      .withColumn("__r", row_number().over(wIn).cast("long"))
      .join(broadcast(offsets), Seq("__shard"))
      .withColumn("rank", col("__off") + col("__r"))
      .select(col("rank"), col("id"))
    val probes = ranked
      .select(col("rank").as("ra"), col("id").as("id_a"),
        explode(sequence(lit(1L), lit((window - 1).toLong))).as("dist"))
      .withColumn("rb", col("ra") + col("dist"))
    val pairs = probes
      .join(ranked.select(col("rank").as("rb"), col("id").as("id_b")),
        Seq("rb"))
      .select(col("id_a"), col("id_b"), col("dist"))
    val grams = base.select(col("id"), sort_array(col("grams")).as("sg"))
    pairs
      .join(grams.select(col("id").as("id_a"), col("sg").as("g_a")),
        Seq("id_a"))
      .join(grams.select(col("id").as("id_b"), col("sg").as("g_b")),
        Seq("id_b"))
      .withColumn("jaccard", graft.functions.JaccardSortedArrays
        .jaccardSorted(col("g_a"), col("g_b")))
      .filter(col("jaccard") >= num.toDouble / den.toDouble)
      .select(col("id_a"), col("id_b"), col("dist"), col("jaccard"))
  }

  /** ASCII-projected normalization for the mod-p family: strip
    * non-printable-ASCII, collapse whitespace, trim, lower — the ASCII
    * projection pins `charAt == codepoint == DuckDB character`, so the
    * twin's `unicode(substr(norm, j, 1))` walks the SAME char values
    * the fused expression folds. */
  def asciiNorm(text: Column): Column =
    lower(trim(regexp_replace(
      regexp_replace(text, "[^ -~]", ""), "\\s+", " ")))

  /** ORACLE-REPLAYABLE LSH-blocked near-dup pairs on the mod-p MinHash
    * family ([[graft.functions.ModPMinHash]]): rolling-window prime-field
    * hashes, `numHashes` affine minima, bands of `rowsPerBand` rows joined
    * on the RAW min-value tuple (no band hashing — the r-tuple is the
    * bucket key, so a strict-overflow SQL engine can replay the exact
    * candidate set). Unlike the FNV/SplitMix pipeline (whose gates need a
    * brute-force twin plus an empirical recall-=1 argument), candidates
    * here are part of the CONTRACT: a pair is emitted iff it shares a
    * band tuple AND its exact mod-p shingle Jaccard ≥ `minJaccard` — the
    * S-curve recall (1-(1-j^r)^b) is the documented scale behavior, not a
    * gate risk.
    *
    * Scale shape matches [[minhashPipeline]]: band rows carry ids only
    * ((1+1+r)·8 B/row · b rows/doc), the self-join shuffles on the band
    * tuple, and the verify gram sets are built ONLY for docs in a
    * surviving pair (semi-join), broadcast under the same size gate. */
  def modpBlockedPairs(df: DataFrame, idCol: String, textCol: String,
      shingleSize: Int = 5, numHashes: Int = 24, rowsPerBand: Int = 3,
      minJaccard: Double = 0.6,
      maxBroadcastBytes: Long = MaxSigBroadcastBytes): DataFrame = {
    require(numHashes % rowsPerBand == 0, "rowsPerBand must divide numHashes")
    val bands = numHashes / rowsPerBand
    val norm = asciiNorm(col(textCol))
    // empty normalized text has no shingles to block on (and the SQL twin
    // cannot reduce an empty window list) — excluded BY CONTRACT
    val base = df
      .select(col(idCol).as("id"), norm.as("__norm"))
      .filter(length(col("__norm")) > 0)
    val sig = graft.functions.ModPMinHash.signature(
      col("__norm"), shingleSize, numHashes)
    val vCols = (0 until rowsPerBand).map(i => s"v$i")
    val bandRows = base
      .select(col("id"), sig.as("__sig"))
      .select(col("id"), explode(array((0 until bands).map { t =>
        struct(lit(t).as("t") +:
          (0 until rowsPerBand).map(i =>
            col("__sig")(t * rowsPerBand + i).as(s"v$i")): _*)
      }: _*)).as("b"))
      .select(col("id") +: (("t" +: vCols).map(f => col(s"b.$f").as(f))): _*)
    val keys = "t" +: vCols
    val cands = bandRows.join(
        bandRows.select((col("id").as("id_b") +: keys.map(col)): _*), keys)
      .filter(col("id") < col("id_b"))
      .select(col("id").as("id_a"), col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .cache()
    val candIds = cands.select(col("id_a").as("id"))
      .union(cands.select(col("id_b").as("id"))).distinct()
    val gramsPlain = base.join(candIds, Seq("id"), "left_semi")
      .select(col("id"), graft.functions.ModPMinHash.shingleSet(
        col("__norm"), shingleSize).as("grams"))
      .cache()
    val gramStats = gramsPlain.agg(
      count(lit(1)).as("n"), sum(size(col("grams"))).as("els")).head()
    val gramBytes = 16L * gramStats.getLong(0) +
      8L * Option(gramStats.get(1)).map(_.asInstanceOf[Long]).getOrElse(0L)
    val grams = if (gramBytes <= maxBroadcastBytes) broadcast(gramsPlain)
                else gramsPlain
    cands
      .join(grams.select(col("id").as("id_a"), col("grams").as("g_a")),
        Seq("id_a"))
      .join(grams.select(col("id").as("id_b"), col("grams").as("g_b")),
        Seq("id_b"))
      .withColumn("jaccard", graft.functions.JaccardSortedLongArrays
        .jaccardSortedLong(col("g_a"), col("g_b")))
      .filter(col("jaccard") >= minJaccard)
      .select("id_a", "id_b", "jaccard")
  }
}
