package graft

import graft.functions.{SimHash64, TextFeatures}
import graft.operators.{Ann, Dedup}
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (3L, "the quick brown fox jumps over the lazy cat near the river bank today"),
    (4L, "completely different text about spark query engines and shuffles"),
    (5L, "  the quick   brown fox jumps over the lazy dog near the river bank today "))
    .toDF("doc_id", "text")

  test("exactDuplicates flags normalized-identical docs") {
    val out = Dedup.exactDuplicates(docs, "text", "doc_id")
      .select("doc_id", "is_duplicate").as[(Long, Boolean)].collect().toMap
    assert(out(1L) === false) // survivor (min id)
    assert(out(2L) === true)
    assert(out(5L) === true)  // whitespace-normalized duplicate
    assert(out(3L) === false)
    assert(out(4L) === false)
  }

  test("minhashNearDupPairs finds the planted near-duplicate") {
    val pairs = Dedup.minhashNearDupPairs(docs, "doc_id", "text",
        numHashes = 64, bands = 16, shingleSize = 5, minJaccard = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L))) // exact dup
    assert(pairs.contains((1L, 3L))) // one-word change
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("minhashNearDupPairsKeyed: same pairs, no full-text cache") {
    // equivalence with the text-carrying variant on real testdata
    val d = "/root/testdata/sf0.001"
    val corpus = Tables.documents(spark, d)
    def run(f: => org.apache.spark.sql.DataFrame) =
      f.select("id_a", "id_b", "jaccard")
        .as[(Long, Long, Double)].collect().toSet
    val plain = run(Dedup.minhashNearDupPairs(corpus, "doc_id", "text",
      numHashes = 64, bands = 16, shingleSize = 5, minJaccard = 0.5))
    spark.catalog.clearCache()
    val keyed = Dedup.minhashNearDupPairsKeyed(corpus, "doc_id", "text",
      numHashes = 64, bands = 16, shingleSize = 5, minJaccard = 0.5)
    assert(run(keyed) === plain)
    // plan proof: no cached relation carries the raw text column — the
    // signature cache is (id, sig) and the gram cache is candidate-only
    // (id, grams); text is re-read from the source by key
    import org.apache.spark.sql.execution.columnar.InMemoryRelation
    val cachedOutputs = keyed.queryExecution.optimizedPlan.collect {
      case r: InMemoryRelation => r.output.map(_.name)
    }
    assert(cachedOutputs.nonEmpty)
    cachedOutputs.foreach { cols =>
      assert(!cols.contains("text"),
        s"cached relation carries raw text: $cols")
    }
    spark.catalog.clearCache()
  }

  test("minhash signature broadcast is size-gated: past the gate, no broadcast, same pairs") {
    val expected = Dedup.minhashNearDupPairs(docs, "doc_id", "text",
        numHashes = 64, bands = 16, shingleSize = 5, minJaccard = 0.5)
      .select("id_a", "id_b", "jaccard")
      .as[(Long, Long, Double)].collect().toSet
    spark.catalog.clearCache()
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // gate at 0 bytes = the large-corpus posture: the signature table
      // must NOT broadcast (neither by hint nor by the planner), and the
      // output must be identical to the broadcast path
      val gated = Dedup.minhashNearDupPairs(docs, "doc_id", "text",
        numHashes = 64, bands = 16, shingleSize = 5, minJaccard = 0.5,
        maxSigBroadcastBytes = 0L)
      val got = gated.select("id_a", "id_b", "jaccard")
        .as[(Long, Long, Double)].collect().toSet
      assert(got === expected)
      assert(!gated.queryExecution.executedPlan.toString
          .contains("BroadcastExchange"),
        "size-gated path must not broadcast the signature table")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.catalog.clearCache()
    }
  }

  test("incrementalExact: known vs within-batch duplicate flags") {
    val corpus = Seq((10L, "alpha beta gamma"), (11L, "delta epsilon"))
      .toDF("doc_id", "text")
    val incoming = Seq(
      (20L, "alpha  beta gamma"),   // known (normalized match with 10)
      (21L, "zeta eta"),            // new
      (22L, "zeta eta"),            // within-batch dup of 21
      (23L, "theta iota"))          // new, unique
      .toDF("doc_id", "text")
    val out = Dedup.incrementalExact(incoming, corpus, "doc_id", "text")
      .select("doc_id", "is_known", "is_duplicate")
      .as[(Long, Boolean, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out === Map(
      20L -> ((true, false)), 21L -> ((false, false)),
      22L -> ((false, true)), 23L -> ((false, false))))
  }

  test("minhashCrossPairs equals the cross-boundary slice of the self-join variant") {
    val corpus = docs.filter($"doc_id".isin(1L, 3L, 4L))
    val incoming = docs.filter($"doc_id".isin(2L, 5L))
    val cross = Dedup.minhashCrossPairs(incoming, corpus, "doc_id", "text",
        numHashes = 64, bands = 16, shingleSize = 5, minJaccard = 0.5)
      .select("id_new", "id_corpus", "jaccard")
      .as[(Long, Long, Double)].collect().toSet
    spark.catalog.clearCache()
    val plain = Dedup.minhashNearDupPairs(docs, "doc_id", "text",
        numHashes = 64, bands = 16, shingleSize = 5, minJaccard = 0.5)
      .select("id_a", "id_b", "jaccard")
      .as[(Long, Long, Double)].collect()
    val inc = Set(2L, 5L)
    val expected = plain.flatMap { case (a, b, j) =>
      if (inc(a) && !inc(b)) Some((a, b, j))
      else if (inc(b) && !inc(a)) Some((b, a, j))
      else None
    }.toSet
    assert(cross === expected)
    assert(cross.nonEmpty)
    spark.catalog.clearCache()
    // past the broadcast budget the batch-side enrichment joins by
    // shuffle — identical output (same gate-equivalence contract as
    // minhashPipeline's): force the gate shut with a zero budget
    val gated = Dedup.minhashCrossPairs(incoming, corpus, "doc_id", "text",
        numHashes = 64, bands = 16, shingleSize = 5, minJaccard = 0.5,
        maxSigBroadcastBytes = 0L)
      .select("id_new", "id_corpus", "jaccard")
      .as[(Long, Long, Double)].collect().toSet
    assert(gated === expected)
    spark.catalog.clearCache()
  }

  test("nearDupGroups/Star: empty pair list converges to an empty label set") {
    // SUM over zero rows is SQL NULL — must not NPE (a corpus with no
    // near-dup pairs is a legitimate, indeed desirable, input)
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Dedup.nearDupGroups(empty).count() === 0L)
    assert(Dedup.nearDupGroupsStar(empty).count() === 0L)
  }

  test("nearDupGroups: chains collapse to one component, min id canonical") {
    // 1-2-3-4 is a CHAIN (no direct 1-4 pair) → needs >1 propagation round;
    // 10-11 is a separate pair; 20-21-22 a star around 20
    val pairs = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L),
      (20L, 21L), (20L, 22L)).toDF("id_a", "id_b")
    val got = operators.Dedup.nearDupGroups(pairs)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("nearDupGroups matches a union-find oracle on random graphs") {
    val rnd = new scala.util.Random(2024)
    (1 to 3).foreach { _ =>
      val n = 30
      val edges = (1 to 25).map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      // driver-side union-find ground truth
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = edges.flatMap(e => Seq(e._1, e._2)).distinct
        .map(id => id -> find(id.toInt).toLong).toMap
      // expected labels are component minima only if min ids are roots —
      // normalize: map every member to the component's minimum member id
      val byRoot = expected.groupBy(_._2).values
        .flatMap { m => val mn = m.keys.min; m.keys.map(_ -> mn) }.toMap
      val got = operators.Dedup.nearDupGroups(
        edges.toDF("id_a", "id_b")).as[(Long, Long)].collect().toMap
      assert(got === byRoot)
    }
  }

  test("nearDupGroupsStar matches the union-find oracle on random graphs") {
    val rnd = new scala.util.Random(77)
    (1 to 3).foreach { _ =>
      val n = 30
      val edges = (1 to 25).map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val byRoot = edges.flatMap(e => Seq(e._1, e._2)).distinct
        .map(id => id -> find(id.toInt).toLong).toMap
        .groupBy(_._2).values
        .flatMap { m => val mn = m.keys.min; m.keys.map(_ -> mn) }.toMap
      val got = operators.Dedup.nearDupGroupsStar(
        edges.toDF("id_a", "id_b")).as[(Long, Long)].collect().toMap
      assert(got === byRoot)
    }
  }

  test("nearDupGroupsStar: chain of 1000 converges in O(log n) rounds") {
    // a pure path graph is the worst case for label propagation (diameter
    // rounds = 999); star alternation must close it in logarithmic rounds
    val chain = (0L until 999L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val (labels, rounds) = operators.Dedup.nearDupGroupsStarCounted(chain)
    info(s"rounds: $rounds")
    assert(rounds <= 16, s"$rounds rounds is not O(log n) for n=1000")
    val got = labels.as[(Long, Long)].collect()
    assert(got.length === 1000)
    assert(got.forall(_._2 == 0L), "all chain members must label to the min id")
  }

  test("containmentPairs equals brute-force padded-substring containment (sf0.001)") {
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    // plant a 60%-prefix slice for every 25th doc (the query-gate shape)
    val withNorm = docs.withColumn("__norm",
        lower(trim(regexp_replace(col("text"), "\\s+", " "))))
      .withColumn("__toks", split(col("__norm"), " "))
      .withColumn("__ntok", size(col("__toks")))
    val planted = withNorm.filter(col("doc_id") % 25 === 0)
      .select((col("doc_id") + 200000L).as("doc_id"),
        concat_ws(" ", slice(col("__toks"), lit(1),
          greatest(lit(1), expr("(__ntok * 3) div 5")).cast("int"))).as("text"))
    val all = docs.unionByName(planted)
    val got = operators.Dedup.containmentPairs(all, "doc_id", "text",
      k = 8, w = 4).as[(Long, Long)].collect().toSet
    // brute force: every ordered pair, padded-substring verify, contained
    // side must clear the fingerprint-eligibility token floor (k+w-1)
    val norm = all.select(col("doc_id"),
        lower(trim(regexp_replace(col("text"), "\\s+", " "))).as("n"))
      .withColumn("ntok", size(split(col("n"), " ")))
    val brute = norm.as("a").crossJoin(norm.as("b"))
      .filter(col("a.doc_id") =!= col("b.doc_id") &&
        col("b.ntok") >= 11 && col("a.ntok") >= col("b.ntok"))
      .filter(contains(concat(lit(" "), col("a.n"), lit(" ")),
        concat(lit(" "), col("b.n"), lit(" "))))
      .select(col("a.doc_id"), col("b.doc_id"))
      .as[(Long, Long)].collect().toSet
    assert(got === brute)
    assert(got.nonEmpty, "planted slices must be found")
  }

  test("boilerplateRemoval strips high-df lines, keeps rare ones, preserves order") {
    val docsIn = Seq(
      (1L, "alpha\nFOOTER\nbeta"),
      (2L, "gamma\nFOOTER"),
      (3L, "FOOTER\ndelta"),
      (4L, "unique one\nunique two")).toDF("doc_id", "text")
    val out = operators.Dedup.boilerplateRemoval(docsIn, "doc_id", "text",
        minDocs = 3L)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    def m(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(out(1L) === ((1L, m("alpha\nbeta"))))   // order preserved
    assert(out(2L) === ((1L, m("gamma"))))
    assert(out(3L) === ((1L, m("delta"))))
    assert(out(4L) === ((0L, m("unique one\nunique two")))) // untouched
  }

  test("paragraphDedup: first occurrence wins across docs, normalized, blanks exempt") {
    val docsIn = Seq(
      (1L, "alpha\nshared passage\nbeta"),
      (2L, "gamma\nShared Passage"),         // case-variant dup of doc 1's
      (3L, "delta\n\nepsilon"),              // blank paragraph survives
      (4L, "zeta\nzeta"),                    // intra-doc dup: second goes
      (5L, "alpha")).toDF("doc_id", "text")  // dup of doc 1 paragraph 0
    val out = operators.Dedup.paragraphDedup(docsIn, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    def m(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(out(1L) === ((0L, m("alpha\nshared passage\nbeta")))) // first: intact
    assert(out(2L) === ((1L, m("gamma"))))
    assert(out(3L) === ((0L, m("delta\n\nepsilon"))))
    assert(out(4L) === ((1L, m("zeta"))))
    assert(out(5L) === ((1L, m(""))))       // everything removed → empty md5
  }

  test("contaminationPairs flags docs sharing an n-gram with the bench set") {
    val run = (1 to 20).map(i => s"tok$i").mkString(" ") // 20-token run
    val corpus = Seq(
      (1L, s"intro words here $run trailing text"),   // contains the run
      (2L, s"$run"),                                  // is exactly the run
      (3L, "entirely unrelated words " + (1 to 20).map(i => s"other$i").mkString(" ")),
      (4L, "short doc under thirteen tokens total here now"))
      .toDF("doc_id", "text")
    val bench = Seq((100L, run)).toDF("bench_id", "btext")
    val out = Dedup.contaminationPairs(corpus, "doc_id", "text",
        bench, "bench_id", "btext", n = 13)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // a 20-token run has 8 distinct 13-grams; docs 1 and 2 share all of them
    assert(out === Map((1L, 100L) -> 8L, (2L, 100L) -> 8L))
    // a bench item shorter than n yields no grams, flags nothing
    val shortBench = Seq((200L, "only five tokens right here")).toDF("bench_id", "btext")
    assert(Dedup.contaminationPairs(corpus, "doc_id", "text",
      shortBench, "bench_id", "btext", n = 13).count() === 0L)
  }

  test("simhash: identical docs → distance 0; near-dup small; distinct large") {
    val sh = docs.select(col("doc_id"),
      SimHash64.simhash64(TextFeatures.wsTokens(lower(col("text")))).as("sh"))
      .as[(Long, Long)].collect().toMap
    assert(sh(1L) === sh(2L))
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(sh(1L), sh(3L)) <= 12)
    assert(hamming(sh(1L), sh(4L)) > 12)
  }

  test("ngramJaccardPairs with banding finds near-dups") {
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3,
        minJaccard = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((1L, 3L)))
  }

  test("prefixJaccardPairs ≡ ngramJaccardPairs (two exact candidate paths)") {
    // both operators promise the EXACT pair set above the threshold; only
    // the candidate generation differs (df-ordered prefix vs MinHash-LSH),
    // so their outputs must agree pair-for-pair and jaccard-for-jaccard
    val viaPrefix = Dedup.prefixJaccardPairs(docs, "doc_id", "text",
        n = 3, num = 1L, den = 2L)
      .select("id_a", "id_b", "jaccard")
      .as[(Long, Long, Double)].collect().toSet
    val viaLsh = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3,
        minJaccard = 0.5)
      .select("id_a", "id_b", "jaccard")
      .as[(Long, Long, Double)].collect().toSet
    assert(viaPrefix === viaLsh)
    assert(viaPrefix.map(p => (p._1, p._2)).contains((1L, 2L)))
  }

  test("sortedNeighborPairs ≡ prefixJaccardPairs on the prefix-" +
      "preserving corpus; misses a window-separated pair (documented)") {
    // on the real sf0.001 corpus every natural ≥0.5 4-gram pair shares
    // a sort prefix, so window-10 SNM recovers the EXACT pair set of
    // the recall-1 prefix join (canonicalize: SNM keys by sort order)
    val real = Tables.documents(spark, sfDir)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b").as[(Long, Long)].collect()
        .map(p => (math.min(p._1, p._2), math.max(p._1, p._2))).toSet
    val viaSnm = canon(Dedup.sortedNeighborPairs(real, "doc_id", "text",
      window = 10, n = 4, num = 1L, den = 2L))
    val viaPfx = canon(Dedup.prefixJaccardPairs(real, "doc_id", "text",
      n = 4, num = 1L, den = 2L))
    assert(viaSnm === viaPfx && viaSnm.nonEmpty)
    // the honesty half: a near-dup pair whose texts DIVERGE at char 1
    // and sit > window apart in sort order is invisible to SNM — the
    // known recall limitation that keeps LSH/prefix join in the toolbox
    val tail = "quick brown fox jumps over the lazy dog tonight"
    val sep = (0 until 12).map(i =>
      (10L + i, s"m$i filler row entirely unrelated content piece $i"))
    val adversarial = (Seq((1L, s"aaa $tail"), (30L, s"zzz $tail"))
      ++ sep).toDF("doc_id", "text")
    val snmA = canon(Dedup.sortedNeighborPairs(adversarial, "doc_id",
      "text", window = 10, n = 4, num = 1L, den = 2L))
    val pfxA = canon(Dedup.prefixJaccardPairs(adversarial, "doc_id",
      "text", n = 4, num = 1L, den = 2L))
    assert(pfxA.contains((1L, 30L)) && !snmA.contains((1L, 30L)))
  }

  test("CharRunHashes: fused window hashes match the compositional form") {
    val df = Seq((1L, "abcdefghij"), (2L, "short"), (3L, "aaaaaa"))
      .toDF("id", "t")
    val fused = df.select($"id",
        graft.functions.CharRunHashes.runs($"t", 5).as("hs"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(fused(2L).size === 1)       // len == runLen → exactly one window
    assert(fused(1L).size === 6)       // 10-5+1 distinct windows
    assert(fused(3L).size === 1)       // all windows identical → distinct=1
    val short = Seq((9L, "abcd")).toDF("id", "t").select(
      graft.functions.CharRunHashes.runs($"t", 5)).head().getSeq[Long](0)
    assert(short.isEmpty)              // len < runLen → no full window
    // same window content → same hash regardless of host string
    val h1 = df.filter($"id" === 1L).select(
      graft.functions.CharRunHashes.hashOf(lit("abcde"), 5)).head().getLong(0)
    assert(fused(1L).contains(h1))
  }

  test("BoundedIdsAgg: sticky cap ships at most cap ids, sorted") {
    val agg = new graft.functions.BoundedIdsAgg(3)
    val r = (1L to 10L).foldLeft(agg.zero)(agg.reduce)
    assert(r.size === 3)
    assert(agg.merge(r, Seq(99L)).size === 3)
    assert(agg.merge(Seq(5L, 2L), Seq(9L, 1L)) === Seq(5L, 2L, 9L))
    assert(agg.finish(Seq(5L, 2L, 9L)) === Seq(2L, 5L, 9L))
  }

  test("lineDedup: first occurrence survives; uniques untouched") {
    val rows = Dedup.lineDedup(Seq(
        (1L, "a\nb\na\nc\nb"),    // dups: 2nd a, 2nd b
        (2L, "x\ny\nz"))          // all unique
      .toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(rows(1L)._1 === 5L)
    assert(rows(1L)._2 === 2L)
    val md5abc = java.security.MessageDigest.getInstance("MD5")
      .digest("a\nb\nc".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(rows(1L)._3 === md5abc)
    assert(rows(2L) === ((3L, 0L,
      java.security.MessageDigest.getInstance("MD5")
        .digest("x\ny\nz".getBytes("UTF-8")).map("%02x".format(_)).mkString)))
  }

  test("audio decodeFrames: exact per-frame energy/zcr against a hand PCM") {
    import graft.operators.AudioCodec
    // clip id=1, 5 samples; frameLen=2 → frames [2,2,1]
    val wav = AudioCodec.synthWav(1L, 5, 16000)
    val frames = AudioCodec.decodeFrames(wav, 2)
    val samples = (0 until 5).map(i => AudioCodec.sample(1L, i))
    def zcrOf(fr: Seq[Int]): Long =
      fr.sliding(2).count(p => p.size == 2 && (p(0) < 0) != (p(1) < 0)).toLong
    val expected = samples.grouped(2).zipWithIndex.map { case (fr, idx) =>
      (idx.toLong, fr.size.toLong, fr.map(s => math.abs(s.toLong)).sum,
        zcrOf(fr), fr.map(s => math.abs(s.toLong)).max)
    }.toSeq
    assert(frames.map(f => (f.frame_id, f.n, f.sum_abs, f.zcr, f.peak))
      === expected)
  }

  test("exactSubstrPairs: verbatim char runs pair; df gate blocks boilerplate") {
    val quote = "the exact same thirty-char run!"  // 31 chars, 2 distinct 30-runs
    val boiler = "x" * 40  // one distinct 30-run ("x"*30), present in ALL docs
    val data = Seq(
      (1L, s"alpha $quote omega $boiler"),
      (2L, s"beta $quote psi $boiler"),
      (3L, s"unrelated words only here $boiler"),
      (4L, s"totally different content $boiler"))
      .toDF("doc_id", "text")
    // runLen=30, minShared=2: docs 1&2 share the quote's runs; the
    // boilerplate run has df=4 > maxDf=3 so it cannot create pairs
    val pairs = Dedup.exactSubstrPairs(data, "doc_id", "text",
        runLen = 30, maxDf = 3, minShared = 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L)))
  }

  test("cosine: orthogonal/parallel vectors") {
    val vecs = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f)),
      (2L, Seq(0.0f, 1.0f, 0.0f)),
      (3L, Seq(2.0f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val out = Ann.cosineTopK(vecs, "vec_id", "embedding",
      vecs.filter(col("vec_id") === 1), "vec_id", "embedding", k = 3)
      .select("rank", "id", "cos").as[(Int, Long, Double)].collect().sortBy(_._1)
    assert(out(0) === ((1, 1L, 1.0)))
    assert(out(1) === ((2, 3L, 1.0))) // parallel, tie broken by id
    assert(out(2)._3 === 0.0)
  }

  test("clusterRepresentatives: keep-best per component plus singletons") {
    // components {1,2,3} (chain) and {10,11}; 20 is a singleton
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val d = Seq((1L, 50L), (2L, 90L), (3L, 90L), (10L, 10L), (11L, 99L),
      (20L, 5L)).toDF("doc_id", "n_chars")
    val out = Dedup.clusterRepresentatives(d, pairs, "doc_id", "n_chars")
      .as[(Long, Long, Long, Boolean)].collect().toSeq
    assert(out.map(_._1) === Seq(1L, 2L, 3L, 10L, 11L, 20L))
    // component labels are min-propagated ids
    assert(out.filter(r => Set(1L, 2L, 3L).contains(r._1))
      .forall(r => r._2 === 1L && r._3 === 3L))
    // best quality 90 is shared by 2 and 3: smaller id 2 wins the tie
    assert(out.filter(r => Set(1L, 2L, 3L).contains(r._1) && r._4)
      .map(_._1) === Seq(2L))
    assert(out.find(_._1 == 11L).get === ((11L, 10L, 2L, true)))
    assert(out.find(_._1 == 10L).get === ((10L, 10L, 2L, false)))
    assert(out.find(_._1 == 20L).get === ((20L, 20L, 1L, true)))
    // exactly one kept row per cluster
    val perCluster = out.groupBy(_._2).map { case (_, rs) =>
      rs.count(_._4)
    }
    assert(perCluster.forall(_ == 1))
  }
}
