package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (array<float>). Baseline: brute-force cosine top-k (broadcast queries —
  * one scan of the corpus, no shuffle until the final per-query top-k).
  * Scale path: random-hyperplane LSH bucketing so each query only scores
  * its bucket-mates.
  */
object Ann {

  /** Fast double dot product (sequential IEEE fold — deterministic for a
    * fixed array order, but engine-arithmetic dependent; use for filters
    * and ranking, not for oracle-compared values). Custom expression: the
    * zip_with+aggregate formulation walks the interpreter tree per element
    * (~64 nodes per pair) and dominated the pairwise prefilter. */
  def dotFast(a: Column, b: Column): Column =
    graft.functions.DotProductFloat.dotFloat(a, b)

  /** Fast cosine for prefilters. */
  def cosineFast(a: Column, b: Column): Column =
    dotFast(a, b) / (sqrt(dotFast(a, a)) * sqrt(dotFast(b, b)))

  /** Dot product kept in decimal(28,18) — order-independent accumulation.
    * Use directly where downstream COMPARISONS/SORTS must be bit-identical
    * cross-engine (candidate-set oracles); [[dotExact]] is the double-valued
    * form for score output. */
  def dotExactDec(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => (x.cast("double") * y.cast("double"))
        .cast("decimal(28,18)")),
      lit(0).cast("decimal(28,18)"),
      // add expands precision to (29,18); the re-cast keeps the accumulator
      // type stable and is exact (scale unchanged, magnitude << 10^10)
      (acc, v) => (acc + v).cast("decimal(28,18)"))

  /** Dot product of two array<float/double> columns — exact decimal
    * accumulation so the result is summation-order independent (needed for
    * hash-exact verification; the per-element products are IEEE-exact). */
  def dotExact(a: Column, b: Column): Column =
    dotExactDec(a, b).cast("double")

  /** Cosine similarity (double). */
  def cosine(a: Column, b: Column): Column =
    dotExact(a, b) / (sqrt(dotExact(a, a)) * sqrt(dotExact(b, b)))

  /** Brute-force cosine top-k: for each query vector (small set, broadcast),
    * score the whole corpus and keep the k best. Plan: broadcast NL join
    * (corpus never shuffles at full width) → fast-double prescreen with a
    * map-side-pruned window (WindowGroupLimit keeps ≤ k+32 rows per query
    * per partition BEFORE the exchange) → exact-decimal cosine only on the
    * survivors → exact re-rank. The deterministic decimal score does ~100×
    * less work this way, and the one array-carrying exchange is group-limit
    * pruned, so the shape survives corpus scale-up.
    *
    * The k+32 margin makes the prescreen lossless in practice: the double
    * dot's rounding error (~1e-13 relative) would need >32 candidates within
    * that distance of the rank-k boundary to change the output.
    * Output: (query_id, rank, id, cos). */
  def cosineTopK(corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, queryIdCol: String, queryVecCol: String,
      k: Int): DataFrame = {
    val joined = corpus.select(col(idCol).as("id"), col(vecCol).as("__v"))
      .join(broadcast(queries.select(col(queryIdCol).as("query_id"),
        col(queryVecCol).as("__q"))))
      .withColumn("__fastcos", cosineFast(col("__v"), col("__q")))
    val w0 = Window.partitionBy(col("query_id"))
      .orderBy(desc("__fastcos"), asc("id"))
    val pruned = joined.withColumn("__r0", row_number().over(w0))
      .filter(col("__r0") <= k + 32)
    val scored = pruned
      .withColumn("cos", cosine(col("__v"), col("__q")))
      // arrays projected out before the final exact-rank exchange
      .select(col("query_id"), col("id"), col("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(desc("cos"), asc("id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "id", "cos")
  }

  /** k-NN CLASSIFICATION — the label-propagation-by-similarity eval op
    * (weak-label new embeddings from a labeled corpus; also the "does
    * my embedding space respect my labels" sanity check): for each
    * query vector, the majority label among its k nearest corpus
    * neighbors (self excluded), ties to the SMALLEST label. Same plan
    * as [[cosineTopK]] — broadcast queries, fast-double prescreen,
    * exact-decimal rescore — then a (query, label) vote agg and a
    * min_by argmax. Output: (query_id, true_label, pred_label,
    * n_votes, correct), query-ascending. */
  def knnClassify(corpus: DataFrame, idCol: String, vecCol: String,
      labelCol: String, queries: DataFrame, queryIdCol: String,
      queryVecCol: String, queryLabelCol: String, k: Int): DataFrame = {
    val joined = corpus.select(col(idCol).as("id"),
        col(labelCol).as("nlabel"), col(vecCol).as("__v"))
      .join(broadcast(queries.select(col(queryIdCol).as("query_id"),
        col(queryLabelCol).as("true_label"),
        col(queryVecCol).as("__q"))))
      .filter(col("id") =!= col("query_id"))
      .withColumn("__fastcos", cosineFast(col("__v"), col("__q")))
    val w0 = Window.partitionBy(col("query_id"))
      .orderBy(desc("__fastcos"), asc("id"))
    val pruned = joined.withColumn("__r0", row_number().over(w0))
      .filter(col("__r0") <= k + 32)
      .withColumn("cos", cosine(col("__v"), col("__q")))
      .select(col("query_id"), col("true_label"), col("id"), col("nlabel"),
        col("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(desc("cos"), asc("id"))
    pruned.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .groupBy(col("query_id"), col("true_label"), col("nlabel"))
      .agg(count(lit(1)).as("votes"))
      .groupBy(col("query_id"), col("true_label"))
      .agg(min_by(struct(col("nlabel").as("l"), col("votes").as("v")),
        struct((-col("votes")).as("a"), col("nlabel").as("b"))).as("win"))
      .select(col("query_id"), col("true_label"),
        col("win")("l").as("pred_label"), col("win")("v").as("n_votes"),
        (col("win")("l") === col("true_label")).as("correct"))
      .orderBy(col("query_id"))
  }

  /** HARD-NEGATIVE MINING — the contrastive-training data op: for each
    * query vector, the k most-similar corpus vectors with a DIFFERENT
    * label (high-similarity wrong-class examples are the negatives that
    * actually teach a metric model). Same plan shape as [[cosineTopK]] —
    * broadcast queries, label filter BEFORE any scoring (the pruned rows
    * never pay the dot product), fast-double prescreen with map-side
    * WindowGroupLimit, exact-decimal rescore of the k+32 survivors.
    * Output: (query_id, rank, id, neg_label, cos). */
  def hardNegatives(corpus: DataFrame, idCol: String, vecCol: String,
      labelCol: String, queries: DataFrame, queryIdCol: String,
      queryVecCol: String, queryLabelCol: String, k: Int): DataFrame = {
    val joined = corpus.select(col(idCol).as("id"),
        col(labelCol).as("neg_label"), col(vecCol).as("__v"))
      .join(broadcast(queries.select(col(queryIdCol).as("query_id"),
        col(queryLabelCol).as("__ql"), col(queryVecCol).as("__q"))))
      .filter(col("neg_label") =!= col("__ql"))
      .withColumn("__fastcos", cosineFast(col("__v"), col("__q")))
    val w0 = Window.partitionBy(col("query_id"))
      .orderBy(desc("__fastcos"), asc("id"))
    val pruned = joined.withColumn("__r0", row_number().over(w0))
      .filter(col("__r0") <= k + 32)
    val scored = pruned
      .withColumn("cos", cosine(col("__v"), col("__q")))
      .select(col("query_id"), col("id"), col("neg_label"), col("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(desc("cos"), asc("id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "id", "neg_label", "cos")
  }

  /** MATRYOSHKA (truncated-prefix) TWO-STAGE RETRIEVAL: stage 1 ranks
    * the corpus by cosine over only the FIRST `prefixDim` components
    * (the cheap representation — at 100 TB this is the stage that reads
    * a narrow column / a truncated index) and keeps `kCand` candidates;
    * stage 2 rescores ONLY those candidates with the full-dimension
    * exact cosine and keeps k. The operator's contract is
    * DETERMINISTIC REPLAY, not full-recall equivalence: both stage
    * boundaries are exact-decimal ranked with total tie-breaks, so an
    * oracle can re-derive candidate set and final ranking bit-for-bit
    * (recall vs full-dim search is a measured property, spec-pinned —
    * like LSH/IVF).
    *
    * Plan: one broadcast of the query set; the full-width array is
    * carried only by the ≤ kCand+32 per-partition survivors of the
    * prefix prescreen (map-side WindowGroupLimit); stage-2 scoring
    * touches kCand rows per query. */
  def matryoshkaTopK(corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, queryIdCol: String, queryVecCol: String,
      prefixDim: Int, kCand: Int, k: Int): DataFrame = {
    require(kCand >= k, "kCand must be >= k")
    val joined = corpus.select(col(idCol).as("id"), col(vecCol).as("__v"))
      .join(broadcast(queries.select(col(queryIdCol).as("query_id"),
        col(queryVecCol).as("__q"))))
      .withColumn("__pv", slice(col("__v"), 1, prefixDim))
      .withColumn("__pq", slice(col("__q"), 1, prefixDim))
      .withColumn("__pfast", cosineFast(col("__pv"), col("__pq")))
    val w0 = Window.partitionBy(col("query_id"))
      .orderBy(desc("__pfast"), asc("id"))
    val prescreened = joined.withColumn("__r0", row_number().over(w0))
      .filter(col("__r0") <= kCand + 32)
      .withColumn("__pcos", cosine(col("__pv"), col("__pq")))
    val w1 = Window.partitionBy(col("query_id"))
      .orderBy(desc("__pcos"), asc("id"))
    val cands = prescreened.withColumn("__r1", row_number().over(w1))
      .filter(col("__r1") <= kCand)
    val rescored = cands
      .withColumn("cos", cosine(col("__v"), col("__q")))
      .select(col("query_id"), col("id"), col("cos"))
    val w2 = Window.partitionBy(col("query_id"))
      .orderBy(desc("cos"), asc("id"))
    rescored.withColumn("rank", row_number().over(w2))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "id", "cos")
  }

  /** The ±1 hyperplane matrix for one table, derived ONCE at plan time from
    * SplitMix64 (deterministic, reproducible cluster-wide, no stored model)
    * and shipped as a literal. */
  private def planeMatrix(dim: Int, nPlanes: Int,
      tableSeed: Long): Seq[Seq[Double]] = {
    import graft.functions.MinHashSignature.splitmix64
    (0 until nPlanes).map { p =>
      (0 until dim).map { d =>
        if ((splitmix64(tableSeed * 7368787L + p.toLong * 1048573 + d)
          & 1L) == 0L) 1.0 else -1.0
      }
    }
  }

  /** The ±1 plane matrix, exposed so oracle twins can inline the exact same
    * literals and recompute signatures externally (the planes are plan
    * literals — no stored model to drift from). */
  def hyperplanes(dim: Int, nPlanes: Int, tableSeed: Long = 0L): Seq[Seq[Double]] =
    planeMatrix(dim, nPlanes, tableSeed)

  /** Hyperplane signature with ORDER-INDEPENDENT projections: bit p =
    * (vec · plane_p > 0) under exact decimal accumulation, so an external
    * engine summing the same products in ANY order derives the identical
    * bucket — this is what lets a DuckDB twin recompute the blocking key
    * bit-for-bit. Use where the bucket must be verifiable cross-engine;
    * [[hyperplaneSig]] (double fold) is the fast in-engine ANN path. */
  def hyperplaneSigExact(vec: Column, dim: Int, nPlanes: Int,
      tableSeed: Long = 0L): Column = {
    require(nPlanes <= 63, "pack into one long")
    // fused single-pass expression — bit-identical to the compositional
    // per-plane dotExactDec > 0 chain (DecimalDotsExact scaladoc), ~10×
    // less interpreter overhead on the corpus scan
    element_at(graft.functions.DecimalDotsExact.sigs(vec,
      Seq(planeMatrix(dim, nPlanes, tableSeed))), 1)
  }

  /** Per-plane EXACT-decimal projections (array<decimal(28,18)>) — the
    * order-independent counterpart of [[hyperplaneProj]]: both the sign bits
    * AND the |projection| multiprobe flip order derived from these are
    * reproducible bit-for-bit by an external engine summing the same
    * products in any order. */
  def hyperplaneProjExact(vec: Column, dim: Int, nPlanes: Int,
      tableSeed: Long = 0L): Column =
    graft.functions.DecimalDotsExact.dots(vec,
      planeMatrix(dim, nPlanes, tableSeed))

  /** Per-plane projections of `vec` (array<double>, one per plane) — the
    * signs make the signature; the magnitudes drive query-adaptive
    * multiprobe (a small |projection| means the point sits near that
    * hyperplane, so flipping that bit is the likeliest place to find lost
    * neighbors). */
  def hyperplaneProj(vec: Column, dim: Int, nPlanes: Int,
      tableSeed: Long = 0L): Column = {
    val planes = planeMatrix(dim, nPlanes, tableSeed)
    array((0 until nPlanes).map { p =>
      aggregate(
        zip_with(vec, typedLit(planes(p)), (x, w) => x.cast("double") * w),
        lit(0.0), (acc, v) => acc + v)
    }: _*)
  }

  /** Signature bits from a projections array. */
  def sigFromProj(proj: Column, nPlanes: Int): Column =
    (0 until nPlanes).map { p =>
      when(element_at(proj, p + 1) > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce((a: Column, b: Column) => a.bitwiseOR(b))

  /** Random-hyperplane signature: `nPlanes` sign bits packed into a long.
    * Per-row work is nPlanes fused multiply-adds, no per-row hashing. */
  def hyperplaneSig(vec: Column, dim: Int, nPlanes: Int,
      tableSeed: Long = 0L): Column = {
    require(nPlanes <= 63, "pack into one long")
    sigFromProj(hyperplaneProj(vec, dim, nPlanes, tableSeed), nPlanes)
  }

  /** LSH-bucketed ANN: corpus and queries signed with `nTables` independent
    * hyperplane sets; candidates share (table, bucket) in ANY table
    * (multi-probe additionally flips each of the first `multiProbeBits`
    * signature bits); exact cosine re-ranks candidates. Recall < 1 by
    * construction — this is the 100 TB path where brute force is off the
    * table. Tuning: `nPlanes` sets bucket size (≈|corpus|/2^nPlanes),
    * `nTables` × probes buys recall with extra candidate volume. */
  /** Candidate (query_id, id, __v) pairs for [[lshCosineTopK]] — exposed so
    * recall/candidate-volume tuning can measure the candidate set directly. */
  def lshCandidates(corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, queryIdCol: String, queryVecCol: String,
      dim: Int, nPlanes: Int, multiProbeBits: Int,
      nTables: Int): DataFrame = {
    // corpus side: ALL table signatures in one compiled pass (the
    // per-table aggregate(zip_with(...)) form is interpreted per element —
    // corpus × tables × planes × dim interpreter nodes; measured ~6×
    // end-to-end on the 14-table tuned config)
    val sigCorpus = corpus.select(col(idCol).as("id"), col(vecCol).as("__v"))
      .select(col("id"), col("__v"),
        posexplode(graft.functions.HyperplaneSigsAll.sigs(
          col("__v"), dim, nPlanes, nTables)))
      .withColumnRenamed("pos", "t")
      .withColumnRenamed("col", "sig")
    require(multiProbeBits <= nPlanes, "can flip at most nPlanes bits")
    // query side keeps the raw projections: QUERY-ADAPTIVE multiprobe flips
    // the bits whose |projection| is smallest (the query sits nearest those
    // hyperplanes), not a fixed bit prefix — measured on the testdata this
    // roughly doubles recall at equal candidate volume.
    val qProj = queries.select(col(queryIdCol).as("query_id"),
      col(queryVecCol).as("__q"))
      .withColumn("tp", explode(array((0 until nTables).map(t =>
        struct(lit(t).as("t"),
          hyperplaneProj(col("__q"), dim, nPlanes, t).as("proj"))): _*)))
      .select(col("query_id"), col("tp.t").as("t"), col("tp.proj").as("proj"))
    val sig0 = sigFromProj(col("proj"), nPlanes)
    // ascending struct sort = most-uncertain plane first
    val flipOrder = sort_array(array((0 until nPlanes).map(p =>
      struct(abs(element_at(col("proj"), p + 1)).as("a"),
        lit(p).as("p"))): _*))
    def bit(i: Int): Column =
      pow(lit(2.0), element_at(flipOrder, i + 1).getField("p")).cast("long")
    // probes drop the query vector: a candidate occurs once per (table,
    // probe) hit, so the dedup shuffle should carry only (query_id, id, __v)
    // — __q re-attaches after dedup via the broadcast query table, and the
    // exact cosine runs once per DISTINCT pair instead of per occurrence
    val probes = qProj.withColumn("sig",
      explode(array((sig0 +: (0 until multiProbeBits).map(i =>
        sig0.bitwiseXOR(bit(i)))): _*)))
      .select(col("query_id"), col("t"), col("sig"))
    sigCorpus.join(probes, Seq("t", "sig"))
      .select(col("query_id"), col("id"), col("__v"))
      .dropDuplicates("query_id", "id")
  }

  /** The LSH candidate SET under exact arithmetic: identical blocking
    * geometry to [[lshCandidates]] — per-table hyperplane signatures plus
    * query-adaptive single-bit multiprobe on the least-confident planes —
    * but the signatures AND the flip order derive from ORDER-INDEPENDENT
    * exact-decimal projections ([[hyperplaneProjExact]]), so an external
    * engine inlining the same ±1 matrices recomputes the identical
    * candidate set: set MEMBERSHIP itself goes under a hash-exact oracle
    * (recall stays spec-pinned — LshRecallSpec; the fast path differs only
    * in summation arithmetic, which can flip a bit only when the projection
    * sits within float rounding of a hyperplane).
    * Output: distinct (query_id, id). */
  def lshCandidatesExact(corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, queryIdCol: String, queryVecCol: String,
      dim: Int, nPlanes: Int, multiProbeBits: Int,
      nTables: Int): DataFrame = {
    require(nPlanes <= 63, "pack into one long")
    require(multiProbeBits <= nPlanes, "can flip at most nPlanes bits")
    val sigCorpus = corpus.select(col(idCol).as("id"), col(vecCol).as("__v"))
      .select(col("id"), posexplode(graft.functions.DecimalDotsExact.sigs(
        col("__v"), (0 until nTables).map(planeMatrix(dim, nPlanes, _)))))
      .withColumnRenamed("pos", "t")
      .withColumnRenamed("col", "sig")
    val qProj = queries.select(col(queryIdCol).as("query_id"),
        col(queryVecCol).as("__q"))
      .withColumn("tp", explode(array((0 until nTables).map(t =>
        struct(lit(t).as("t"),
          hyperplaneProjExact(col("__q"), dim, nPlanes, t).as("proj"))): _*)))
      .select(col("query_id"), col("tp.t").as("t"), col("tp.proj").as("proj"))
    val sig0 = (0 until nPlanes).map { p =>
      when(element_at(col("proj"), p + 1) > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce((a: Column, b: Column) => a.bitwiseOR(b))
    // ascending (|proj|, plane) = most-uncertain plane first, ties by index
    val flipOrder = sort_array(array((0 until nPlanes).map(p =>
      struct(abs(element_at(col("proj"), p + 1)).as("a"),
        lit(p).as("p"))): _*))
    def bit(i: Int): Column =
      pow(lit(2.0), element_at(flipOrder, i + 1).getField("p")).cast("long")
    val probes = qProj.withColumn("sig",
      explode(array((sig0 +: (0 until multiProbeBits).map(i =>
        sig0.bitwiseXOR(bit(i)))): _*)))
      .select(col("query_id"), col("t"), col("sig"))
    sigCorpus.join(probes, Seq("t", "sig"))
      .select(col("query_id"), col("id"))
      .distinct()
  }

  /** The IVF candidate SET under exact arithmetic with PLAN-LITERAL
    * centroids (a committed trained model — what a production IVF deployment
    * pins): each corpus vector goes to its argmax-dot centroid (exact
    * decimal dots, ties to the lowest index), each query probes its
    * `nProbe` nearest centroids, candidates share a bucket. Deterministic
    * and cross-engine reproducible → the assignment/probe set goes under a
    * hash-exact oracle. Output: distinct (query_id, id). */
  def ivfCandidatesExact(corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, queryIdCol: String, queryVecCol: String,
      centroids: Seq[Seq[Double]], nProbe: Int): DataFrame = {
    import graft.functions.DecimalDotsExact
    // fused single-pass argmax/top-k over the literal centroid matrix
    // (dot DESC, index ASC) — see DecimalDotsExact for the exactness
    // argument
    val bucketed = corpus.select(col(idCol).as("id"), col(vecCol).as("__v"))
      .withColumn("bucket",
        element_at(DecimalDotsExact.argTopK(col("__v"), centroids, 1), 1))
      .select(col("id"), col("bucket"))
    val probes = queries.select(col(queryIdCol).as("query_id"),
        col(queryVecCol).as("__q"))
      .withColumn("bucket",
        explode(DecimalDotsExact.argTopK(col("__q"), centroids, nProbe)))
      .select(col("query_id"), col("bucket"))
    bucketed.join(broadcast(probes), Seq("bucket"))
      .select(col("query_id"), col("id"))
      .distinct()
  }

  /** IVF coarse-quantizer training: spherical k-means (Lloyd, cosine
    * assignment) on a DETERMINISTIC sample (`idCol % sampleMod == 0`),
    * iterated a fixed number of rounds on the driver. The sample is bounded
    * and small by construction (IVF training sets are ≪ corpus at any
    * scale); everything downstream ships the centroids as plan literals —
    * no stored model, reproducible cluster-wide.
    *
    * Initialization: the first k sample vectors in id order (deterministic;
    * fine for a coarse quantizer — Lloyd rounds do the shaping). */
  def trainIvfCentroids(corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, sampleMod: Int = 7, iters: Int = 8,
      maxSample: Int = 20000): Seq[Seq[Double]] = {
    // maxSample caps the driver collect absolutely: corpus/sampleMod alone
    // is NOT a bound at 100 TB. orderBy before limit keeps the sample
    // deterministic (lowest ids), which keeps the centroids — and every
    // downstream plan literal — reproducible.
    val sample: Array[Array[Double]] = corpus
      .filter(col(idCol) % sampleMod === 0)
      .orderBy(col(idCol))
      .limit(maxSample)
      .select(col(vecCol))
      .collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    require(sample.length >= k, s"sample ${sample.length} < k=$k")
    def unit(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      if (n > 0) v.map(_ / n) else v
    }
    var cent = sample.take(k).map(unit)
    (0 until iters).foreach { _ =>
      val sums = Array.fill(k)(new Array[Double](cent(0).length))
      val counts = new Array[Int](k)
      sample.foreach { v =>
        var best = 0; var bestDot = Double.NegativeInfinity
        var c = 0
        while (c < k) {
          var s = 0.0; var i = 0
          while (i < v.length) { s += v(i) * cent(c)(i); i += 1 }
          if (s > bestDot) { best = c; bestDot = s }
          c += 1
        }
        var i = 0
        while (i < v.length) { sums(best)(i) += v(i); i += 1 }
        counts(best) += 1
      }
      cent = (0 until k).map { c =>
        if (counts(c) > 0) unit(sums(c)) else cent(c) // keep empty centroids
      }.toArray
    }
    cent.map(_.toSeq).toSeq
  }

  /** IVF ANN: assign each corpus vector to its nearest centroid (ONE compiled
    * pass, one bucket per vector — the corpus is scanned once and shuffled
    * once on the bucket id), probe the `nProbe` nearest centroids per query,
    * and exact-cosine re-rank the probed buckets. The candidate fraction is
    * ≈ nProbe/k on balanced clusters; recall depends on how well the corpus
    * clusters (same caveat as every IVF index). */
  def ivfCosineTopK(corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, queryIdCol: String, queryVecCol: String,
      centroids: Seq[Seq[Double]], nProbe: Int, k: Int): DataFrame = {
    import graft.functions.NearestCentroids
    val bucketed = corpus.select(col(idCol).as("id"), col(vecCol).as("__v"))
      .withColumn("bucket",
        element_at(NearestCentroids.nearest(col("__v"), centroids, 1), 1))
    val probes = queries.select(col(queryIdCol).as("query_id"),
        col(queryVecCol).as("__q"))
      .withColumn("bucket",
        explode(NearestCentroids.nearest(col("__q"), centroids, nProbe)))
    val scored = bucketed.join(broadcast(probes), Seq("bucket"))
      .withColumn("cos", cosine(col("__v"), col("__q")))
      // arrays projected out before the per-query top-k exchange
      .select(col("query_id"), col("id"), col("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(desc("cos"), asc("id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "id", "cos")
  }

  /** An LSH configuration with its analytic predictions. */
  case class LshConfig(nPlanes: Int, nTables: Int, multiProbeBits: Int,
      predictedRecall: Double, predictedCandidateFraction: Double)

  /** Product-quantizer training: per-subspace L2 Lloyd on the SAME
    * deterministic bounded sample discipline as [[trainIvfCentroids]]
    * (ordered ids, capped size, fixed rounds, first-k init). Returns
    * numSub codebooks of k centroids of subDim doubles each. Everything
    * downstream ships them as plan literals — no stored model. */
  def trainPqCodebooks(corpus: DataFrame, idCol: String, vecCol: String,
      numSub: Int, k: Int, sampleMod: Int = 7, iters: Int = 8,
      maxSample: Int = 20000): Seq[Seq[Seq[Double]]] = {
    val sample: Array[Array[Double]] = corpus
      .filter(col(idCol) % sampleMod === 0)
      .orderBy(col(idCol))
      .limit(maxSample)
      .select(col(vecCol))
      .collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    require(sample.nonEmpty, "empty training sample")
    val dim = sample.head.length
    require(dim % numSub == 0, s"numSub must divide dim $dim")
    val subDim = dim / numSub
    (0 until numSub).map { m =>
      val subs = sample.map(v => v.slice(m * subDim, (m + 1) * subDim))
      var cents = subs.take(k).map(_.clone())
      var it = 0
      while (it < iters) {
        val sums = Array.fill(k)(new Array[Double](subDim))
        val counts = new Array[Int](k)
        subs.foreach { s =>
          var best = 0; var bestD = Double.MaxValue
          var c = 0
          while (c < cents.length) {
            var d = 0.0; var i = 0
            while (i < subDim) {
              val t = s(i) - cents(c)(i); d += t * t; i += 1
            }
            if (d < bestD) { bestD = d; best = c }
            c += 1
          }
          counts(best) += 1
          var i = 0
          while (i < subDim) { sums(best)(i) += s(i); i += 1 }
        }
        cents = Array.tabulate(k) { c =>
          if (counts(c) == 0) cents(c)
          else {
            val out = new Array[Double](subDim)
            var i = 0
            while (i < subDim) { out(i) = sums(c)(i) / counts(c); i += 1 }
            out
          }
        }
        it += 1
      }
      cents.map(_.toSeq).toSeq
    }
  }

  /** Augment a PQ codebook for exact L2-argmin-as-dot-argmax: row j
    * becomes (c_j, −‖c_j‖²/2), so that dot((s,1), row_j) =
    * s·c_j − ‖c_j‖²/2, whose argmax over j equals argmin_j ‖s − c_j‖²
    * (the ‖s‖² term is constant in j). The bias is computed here in a
    * fixed fold order, and the SAME doubles are inlined in the twin. */
  def augmentCodebook(codebook: Seq[Seq[Double]]): Seq[Seq[Double]] =
    codebook.map { c =>
      var n2 = 0.0
      c.foreach(x => n2 += x * x)
      c :+ (-n2 / 2.0)
    }

  /** PQ encode: per subspace m, the id of the L2-nearest codebook
    * centroid — long form (id, m, code). The argmin runs as
    * [[graft.functions.DecimalDotsExact.argTopK]] over the AUGMENTED
    * codebook (see [[augmentCodebook]]) on the subvector with a 1.0f
    * appended, so every code is exact-decimal reproducible cross-engine.
    * Map-side only (the codebooks are plan literals). */
  def pqEncode(df: DataFrame, idCol: String, vecCol: String,
      codebooks: Seq[Seq[Seq[Double]]]): DataFrame = {
    import graft.functions.DecimalDotsExact
    val subDim = codebooks.head.head.size
    val codeCols = codebooks.zipWithIndex.map { case (cb, m) =>
      val aug = augmentCodebook(cb)
      val sub = concat(slice(col(vecCol), m * subDim + 1, subDim),
        array(lit(1.0f)))
      element_at(DecimalDotsExact.argTopK(sub, aug, 1), 1)
        .cast("long").as(s"__c$m")
    }
    df.select(col(idCol).as("id") +: codeCols: _*)
      .select(col("id"), posexplode(array(
        (0 until codebooks.size).map(m => col(s"__c$m")): _*))
        .as(Seq("m", "code")))
      .select(col("id"), col("m").cast("long").as("m"), col("code"))
  }

  /** PQ asymmetric-distance top-k (ADC): each query scores every doc as
    * Σ_m dot(q_m, codebook_m[code_m(doc)]) — the classic ADC dot
    * approximation of q·x read from 16-entry lookup tables instead of
    * the full vectors. Scores accumulate and RANK in exact decimal (no
    * double conversion anywhere — a decimal(38,18) sum's int128 would
    * double-round in hi/lo-word engines), so the ranking is hash-exact;
    * the output carries ranks only, like [[cosineTopK]]'s oracle shape.
    *
    * Scale shape: codes are 8 longs per doc (the 4-byte-payload PQ
    * promise); the per-(query, m, j) table is numQueries×numSub×k rows
    * and BROADCASTS; one shuffle groups the 8 contributions per
    * (query, doc); WindowGroupLimit prunes the per-query ranking
    * map-side. */
  def pqTopK(corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, queryIdCol: String, queryVecCol: String,
      codebooks: Seq[Seq[Seq[Double]]], k: Int): DataFrame = {
    import graft.functions.DecimalDotsExact
    val subDim = codebooks.head.head.size
    val codes = pqEncode(corpus, idCol, vecCol, codebooks)
    val tables = queries.select(col(queryIdCol).as("query_id") +:
        codebooks.zipWithIndex.map { case (cb, m) =>
          DecimalDotsExact.dots(
            slice(col(queryVecCol), m * subDim + 1, subDim), cb).as(s"__t$m")
        }: _*)
      .select(col("query_id"), posexplode(array(
        (0 until codebooks.size).map(m => col(s"__t$m")): _*))
        .as(Seq("m", "tbl")))
      .select(col("query_id"), col("m").cast("long").as("m"),
        posexplode(col("tbl")).as(Seq("code", "contrib")))
      .select(col("query_id"), col("m"), col("code").cast("long").as("code"),
        col("contrib"))
    val scored = codes.join(broadcast(tables), Seq("m", "code"))
      .groupBy(col("query_id"), col("id"))
      .agg(sum(col("contrib")).as("score"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(desc("score"), asc("id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("id"))
  }

  /** Derive (nPlanes, nTables, multiProbeBits) from the corpus's neighbor
    * structure. `neighborCos` is the cosine of the neighbors that must be
    * found (measure it: k-th best cosine of a sampled brute-force top-k —
    * see LshRecallSpec). Model: per-plane sign-agreement probability
    * p = 1 − acos(cos)/π; a table hits a neighbor with ≈ p^B + P·p^(B−1)(1−p)
    * (signature match, or one of P adaptive single-bit probes catches the
    * flipped plane); a random point collides with ≈ (1+P)/2^B per table.
    * Adaptive probing concentrates on the least-confident bits, so the
    * recall prediction is conservative (measured recall runs ahead of it).
    *
    * Picks the feasible config with the smallest candidate fraction; if the
    * corpus geometry makes (targetRecall, maxCandidateFraction) jointly
    * infeasible — weak locality, e.g. neighborCos ≲ 0.4 — returns the
    * highest-recall config within the fraction budget, and the caller can
    * read `predictedRecall` to see what the data supports. */
  def deriveLshConfig(neighborCos: Double, targetRecall: Double = 0.9,
      maxCandidateFraction: Double = 0.15,
      maxTables: Int = 16): LshConfig = {
    val p = 1.0 - math.acos(math.max(-1.0, math.min(1.0, neighborCos))) / math.Pi
    val configs = for {
      b <- 4 to 16
      pr <- 0 to math.min(b, 8)
      t <- 1 to maxTables
    } yield {
      val hit = math.min(1.0,
        math.pow(p, b) + pr * math.pow(p, b - 1) * (1 - p))
      val recall = 1 - math.pow(1 - hit, t)
      val frac = 1 - math.pow(1 - (1.0 + pr) / math.pow(2.0, b), t)
      LshConfig(b, t, pr, recall, frac)
    }
    val feasible = configs.filter(c =>
      c.predictedRecall >= targetRecall &&
        c.predictedCandidateFraction <= maxCandidateFraction)
    if (feasible.nonEmpty)
      feasible.minBy(c => (c.predictedCandidateFraction,
        c.nTables * (1 + c.multiProbeBits)))
    else configs.filter(_.predictedCandidateFraction <= maxCandidateFraction)
      .maxBy(_.predictedRecall)
  }

  /** Exact per-group centroid of an embedding column, long form:
    * one row per (group, dimension) with the decimal-exact mean and the
    * group size. Long-form output keeps the result engine-comparable
    * (no array-ordering ambiguity); a consumer that wants vectors back
    * pivots with sort_array(collect_list(struct(dim, centroid))).
    *
    * Scale shape: posexplode expands rows×dim inside whole-stage codegen,
    * then the partial (map-side) hash aggregate collapses each task to
    * ≤ |groups|×dim rows before the single shuffle — wire bytes ∝
    * partitions × |groups| × dim, independent of corpus row count, and no
    * vector crosses the exchange.
    *
    * Exactness: each float component is scaled by 2^49 — an IEEE exponent
    * shift, always exact — which turns every float with |v| ≥ 2^-26 (or 0)
    * into an exact INTEGER (a float mantissa has 24 bits, so its lowest
    * set bit is at ≥ 2^-49 whenever its magnitude is ≥ 2^-26; components
    * BELOW 2^-26 are flushed to zero in-plan — see [[FlushThreshold]] —
    * so the property holds by construction, mirrored exactly by the
    * oracle twins). The integers accumulate in
    * decimal(38,0) — exact to 10^38, partition-order independent, still
    * map-side-combinable — and ONE double division at the end yields the
    * mean. No base-10 rounding of a binary fraction ever happens, so the
    * result is bit-identical across engines and cluster sizes. (A plain
    * decimal(p,s) cast of the floats is NOT: a float with exactly s+1
    * fractional bits lands on a decimal half and Spark's HALF_UP disagrees
    * with round-half-even engines.) */
  def groupCentroids(df: DataFrame, groupCol: String, vecCol: String): DataFrame = {
    val twoTo49 = lit(562949953421312.0)
    // the |v| ≥ 2^-26 precondition is ENFORCED in-plan, not assumed:
    // components below it (where v·2^49 stops being an integer and
    // HALF_UP vs half-even engines can disagree) are flushed to zero by
    // the same exact comparison on both engine and twin, so the
    // bit-identical contract holds on arbitrary input, not just corpora
    // that happen to satisfy the precondition. At 2^-26 ≈ 1.5e-8 the
    // flush is ~1e-8 absolute error per component — far below any
    // embedding signal, and deterministic.
    val vd = col("v").cast("double")
    val flushed = when(abs(vd) < lit(FlushThreshold), lit(0.0)).otherwise(vd)
    df.select(col(groupCol).as("grp"),
        posexplode(col(vecCol)).as(Seq("dim", "v")))
      .groupBy(col("grp"), col("dim"))
      .agg(
        (sum((flushed * twoTo49).cast("decimal(38,0)"))
            .cast("double") /
          (count(lit(1)).cast("double") * twoTo49)).as("centroid"),
        count(lit(1)).as("n"))
  }

  /** 2^-26: below this magnitude a float·2^49 is no longer an exact
    * integer (see [[groupCentroids]]); components under it flush to 0. */
  val FlushThreshold: Double = math.pow(2, -26)

  /** Engine-portable L2 norm of a float-array column. The per-element
    * square is EXACT in double (24-bit × 24-bit = 48-bit significand);
    * the decimal cast uses scale 10 for two load-bearing reasons:
    * (1) a square has an EVEN number of fractional bits, and a rounding
    * tie at scale s needs exactly s+1 fractional digits — odd for s=10 —
    * so no tie can ever occur (HALF_UP vs half-even engines agree);
    * (2) for unit-scale vectors the sum's numerator stays < 2^53, so the
    * decimal→double cast is one correctly-rounded conversion in every
    * engine (an int128 numerator past 2^53 double-rounds in engines that
    * convert hi/lo words separately). sqrt is IEEE-correctly-rounded.
    * Net: the norm is bit-identical across engines and partition orders,
    * with deterministic 1e-9-relative rounding of norm². */
  def normExact(vec: Column): Column =
    sqrt(
      aggregate(
        transform(vec, x => (x.cast("double") * x.cast("double"))
          .cast("decimal(28,10)")),
        lit(0).cast("decimal(28,10)"),
        (acc, v) => (acc + v).cast("decimal(28,10)")).cast("double"))

  /** L2-normalize an embedding column, long form (id, dim, u): one row
    * per component, u = v / ‖v‖ with [[normExact]]'s portable norm — the
    * division is a single correctly-rounded IEEE op, so unit components
    * are bit-identical across engines.
    * Map-side only: no shuffle, no vector crosses any exchange. An
    * all-zero vector has norm 0; its components map to 0 (not NaN) — the
    * twin mirrors the same rule. */
  def l2NormalizeLong(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol).as("id"), normExact(col(vecCol)).as("nrm"),
        posexplode(col(vecCol)).as(Seq("dim", "v")))
      .select(col("id"), col("dim"),
        when(col("nrm") === 0, lit(0.0))
          .otherwise(col("v").cast("double") / col("nrm")).as("u"))

  /** Symmetric int8 quantization with a per-vector max-abs scale, long
    * form (id, dim, q, qscale): q = floor(v/max|v| · 127) ∈ [-127, 127].
    * floor — unlike round — has no halfway ties, so the codes replay
    * bit-exactly in any engine (a production variant may prefer rint;
    * the bucket width is identical). An all-zero vector has qscale 0:
    * its codes are 0 (not NaN/Infinity) — twin mirrors the rule.
    * Map-side only. */
  def quantizeInt8(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol).as("id"),
        array_max(transform(col(vecCol), v => abs(v))).cast("double").as("qscale"),
        posexplode(col(vecCol)).as(Seq("dim", "v")))
      .select(col("id"), col("dim"),
        when(col("qscale") === 0, lit(0)).otherwise(
            floor(col("v").cast("double") / col("qscale") * lit(127.0)))
          .cast("int").as("q"),
        col("qscale"))

  /** JOHNSON–LINDENSTRAUSS random projection with a DERIVED ±1 sign
    * matrix (Achlioptas' database-friendly construction): out_j =
    * Σ_i sign(i,j) · q_i where q_i = ⌊1000·v_i⌋ (exact integer
    * quantization — float→double exact, one IEEE multiply, floor) and
    * sign(i,j) comes from md5("i_j") parity — the same engine-portable
    * hash [[Dsir]] buckets with, so the matrix needs no storage, no
    * randomness state, and regenerates identically anywhere (DuckDB
    * recomputes it from md5 in SQL; here it folds to PLAN LITERALS at
    * build time — inDim×outDim ints, a bounded model artifact).
    *
    * Everything after quantization is integer, so projected coordinates
    * are hash-exact cross-engine. One corpus pass, zero shuffles: the
    * fold runs inside the row via zip_with/aggregate. Output:
    * (id, j, p) — outDim rows per vector. */
  def randomProjection(df: DataFrame, idCol: String, vecCol: String,
      inDim: Int, outDim: Int): DataFrame = {
    val md = java.security.MessageDigest.getInstance("MD5")
    def signOf(s: String): Int = {
      val hex = md.digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      def hv(c: Char) = if (c >= 'a') c - 'a' + 10 else c - '0'
      if ((hv(hex(0)) * 16 + hv(hex(1))) % 2 == 0) 1 else -1
    }
    // sign matrix as nested literals: row j = [sign(0,j) … sign(inDim−1,j)]
    val signLit = array((0 until outDim).map { j =>
      array((0 until inDim).map(i => lit(signOf(s"${i}_${j}").toLong)): _*)
    }: _*)
    val q = transform(col(vecCol),
      v => floor(v.cast("double") * lit(1000.0)).cast("long"))
    df.select(col(idCol).as("id"),
        posexplode(transform(signLit, row =>
          aggregate(zip_with(q, row, (x, s) => x * s),
            lit(0L), (acc, x) => acc + x))).as(Seq("j", "p")))
      .select(col("id"), col("j").cast("long").as("j"), col("p"))
  }

  /** Distance-to-centroid outlier mining: for each group, the `k` vectors
    * FARTHEST from the group's exact centroid — the hard-example /
    * mislabel-detection primitive of embedding curation. Output:
    * (grp, rank, id, dist2) with dist2 = Σ_d (v_d − c_d)².
    *
    * Scale shape: centroids come from [[groupCentroids]] (wire ∝
    * groups×dim) and join back BROADCAST — a centroid table is bounded by
    * |groups|×dim regardless of corpus size — onto the posexploded
    * components (map-side), then one partial-aggregated groupBy(id) and a
    * per-group top-k window. No vector crosses any exchange at full width.
    *
    * Exactness: v_d (exact float→double), c_d, their difference and its
    * square are each single correctly-rounded IEEE ops — deterministic in
    * any engine; the squares accumulate in decimal(28,12), which is
    * partition-order independent, tie-free in practice (a full-53-bit
    * mantissa square would need ~25 trailing decimal zeros to land on a
    * rounding tie), and keeps the sum's numerator below 2^53 so the final
    * decimal→double cast is a single conversion everywhere. */
  def centroidOutliers(df: DataFrame, idCol: String, groupCol: String,
      vecCol: String, k: Int): DataFrame = {
    val cents = groupCentroids(df, groupCol, vecCol)
      .select(col("grp"), col("dim"), col("centroid"))
    val comp = df.select(col(idCol).as("id"), col(groupCol).as("grp"),
      posexplode(col(vecCol)).as(Seq("dim", "v")))
    val d = col("v").cast("double") - col("centroid")
    val dist = comp.join(broadcast(cents), Seq("grp", "dim"))
      .groupBy(col("grp"), col("id"))
      .agg(sum((d * d).cast("decimal(28,12)")).cast("double").as("dist2"))
    val w = Window.partitionBy(col("grp"))
      .orderBy(desc("dist2"), asc("id"))
    dist.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("grp"), col("rank"), col("id"), col("dist2"))
  }

  /** Per-(group, dimension) cluster variance around the exact centroid —
    * the compactness / feature-spread profile of a labeled embedding
    * corpus (which clusters are tight, which dimensions carry signal).
    * Output: (grp, dim, centroid, variance, n) long form.
    *
    * Same exactness discipline as [[centroidOutliers]]: the centroid is
    * dyadic-exact, each (v−c)² is deterministic IEEE, and the squares
    * accumulate per (group, dim) in decimal(28,12) — the numerator stays
    * < 2^53 for group sums of unit-scale squares, so both the
    * accumulation and the final cast are engine-portable. Two passes over
    * the components (mean, then spread), each ONE partial-aggregated
    * shuffle; the centroid table joins back broadcast. */
  def clusterVariance(df: DataFrame, groupCol: String, vecCol: String): DataFrame = {
    val cents = groupCentroids(df, groupCol, vecCol)
      .select(col("grp"), col("dim"), col("centroid"))
    val comp = df.select(col(groupCol).as("grp"),
      posexplode(col(vecCol)).as(Seq("dim", "v")))
    val d = col("v").cast("double") - col("centroid")
    comp.join(broadcast(cents), Seq("grp", "dim"))
      .groupBy(col("grp"), col("dim"))
      .agg(first(col("centroid")).as("centroid"),
        (sum((d * d).cast("decimal(28,12)")).cast("double") /
          count(lit(1)).cast("double")).as("variance"),
        count(lit(1)).as("n"))
  }

  /** Int8 vector of a float embedding — the array form of
    * [[quantizeInt8]] (same floor-based codes), for retrieval over
    * compressed vectors. */
  def quantizeInt8Vec(vec: Column): Column = {
    val qscale = array_max(transform(vec, v => abs(v))).cast("double")
    transform(vec, v =>
      when(qscale === 0, lit(0)).otherwise(
        floor(v.cast("double") / qscale * lit(127.0))).cast("int"))
  }

  /** Top-k retrieval over INT8-QUANTIZED vectors — the serving path after
    * [[quantizeInt8]] compression (4× smaller corpus in memory,
    * word-compare scoring). The integer dot is EXACT (sum of int×int —
    * no rounding anywhere); the ranking score DEQUANTIZES it with the two
    * per-vector scales (dot·s_a·s_q/127²) — without the rescale,
    * vectors with small max components rank systematically high (measured
    * top-10 recall 0.74 → 1.00 on unit-norm data). The rescale is three
    * IEEE ops in a canonical order, mirrored verbatim by the twin, so
    * ranking AND scores stay hash-gated. Plan shape mirrors
    * [[cosineTopK]]: broadcast queries, corpus never shuffles at full
    * width, per-query top-k window after projecting the arrays away. */
  def quantizedTopK(corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, queryIdCol: String, queryVecCol: String,
      k: Int): DataFrame = {
    def qscale(vec: Column) = array_max(transform(vec, v => abs(v))).cast("double")
    val qCorpus = corpus.select(col(idCol).as("id"),
      quantizeInt8Vec(col(vecCol)).as("__qv"), qscale(col(vecCol)).as("__sa"))
    val qQueries = broadcast(queries.select(col(queryIdCol).as("query_id"),
      quantizeInt8Vec(col(queryVecCol)).as("__qq"), qscale(col(queryVecCol)).as("__sq")))
    val idot = aggregate(
      zip_with(col("__qv"), col("__qq"), (x, y) => (x * y).cast("long")),
      lit(0L), (acc, v) => acc + v)
    val scored = qCorpus.crossJoin(qQueries)
      .withColumn("dot", idot)
      // canonical op order ((dot·s_a)·s_q)/16129 — the twin mirrors it
      .withColumn("score",
        col("dot").cast("double") * col("__sa") * col("__sq") / lit(16129.0))
      .select(col("query_id"), col("id"), col("dot"), col("score"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(desc("score"), asc("id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("id"), col("dot"), col("score"))
  }

  def lshCosineTopK(corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, queryIdCol: String, queryVecCol: String,
      dim: Int, nPlanes: Int, k: Int, multiProbeBits: Int = 8,
      nTables: Int = 4): DataFrame = {
    val cands = lshCandidates(corpus, idCol, vecCol,
      queries, queryIdCol, queryVecCol, dim, nPlanes, multiProbeBits, nTables)
    val qVecs = broadcast(queries.select(col(queryIdCol).as("query_id"),
      col(queryVecCol).as("__q")))
    val scored = cands.join(qVecs, Seq("query_id"))
      .withColumn("cos", cosine(col("__v"), col("__q")))
      // arrays projected out before the per-query top-k exchange
      .select(col("query_id"), col("id"), col("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(desc("cos"), asc("id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "id", "cos")
  }
}
