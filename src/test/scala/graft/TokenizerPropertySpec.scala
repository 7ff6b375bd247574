package graft

import graft.functions.{BoundedIdsAgg, CharRunHashes, UnigramViterbi}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** ScalaCheck property coverage for the round-7 primitives — the
  * distributed-correctness invariants a concrete-case spec can't pin:
  *
  *  - [[CharRunHashes]]: window identity (equal substrings hash equal
  *    wherever they occur), count = distinct windows, short-text empties.
  *  - [[BoundedIdsAgg]]: Spark may merge partial buffers in ANY partition
  *    order; the aggregator must be ORDER-INSENSITIVE exactly where
  *    correctness depends on it — groups under the cap yield the same
  *    sorted set under every split/permutation, and groups over the cap
  *    always surface exactly `cap` ids (the df-gate drops them; their
  *    membership may vary, their SIZE may not).
  *  - [[UnigramViterbi]]: segmentation always concatenates back to the
  *    word; when every char is in the table the fallback never fires and
  *    the path cost is minimal among a brute-force enumeration (checked
  *    on short words where enumeration is tractable).
  */
class TokenizerPropertySpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g(Gen.Parameters.default, Seed(seed)).getOrElse(sys.error("gen failed"))

  test("CharRunHashes: window identity + distinct-count over random texts") {
    val texts = sample(Gen.listOfN(120,
      Gen.choose(0, 24).flatMap(n =>
        Gen.listOfN(n, Gen.oneOf('a', 'b', 'c', ' ')).map(_.mkString))), 7L)
    val L = 5
    val rows = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "t")
      .select($"id", $"t", CharRunHashes.runs($"t", L).as("hs"))
      .as[(Long, String, Seq[Long])].collect()
    rows.foreach { case (_, t, hs) =>
      val windows = (0 to t.length - L).map(i => t.substring(i, i + L))
      assert(hs.size === windows.distinct.size, s"text='$t'")
      assert(hs.sorted === hs, "output must be sorted")
    }
    // cross-text identity: same window content → same hash value
    val byWindow = scala.collection.mutable.Map.empty[String, Long]
    rows.foreach { case (_, t, hs) =>
      val windows = (0 to t.length - L).map(i => t.substring(i, i + L))
      // recompute each window's hash via a 1-window call and check set
      windows.distinct.foreach { w =>
        val h = Seq(Tuple1(w)).toDF("w")
          .select(CharRunHashes.hashOf($"w", L)).head().getLong(0)
        byWindow.get(w).foreach(prev => assert(prev === h))
        byWindow(w) = h
        assert(hs.contains(h), s"window '$w' hash missing for '$t'")
      }
    }
  }

  test("BoundedIdsAgg: partition-order insensitivity where it matters") {
    val cap = 5
    val agg = new BoundedIdsAgg(cap)
    def run(groups: Seq[Seq[Long]]): Seq[Long] = {
      val partials = groups.map(g => g.foldLeft(agg.zero)(agg.reduce))
      agg.finish(partials.foldLeft(agg.zero)(agg.merge))
    }
    val idsGen = Gen.choose(1, 9).flatMap(n =>
      Gen.listOfN(n, Gen.choose(1L, 1000L)).map(_.distinct))
    (1 to 60).foreach { i =>
      val ids = sample(idsGen, 100L + i)
      val splitsGen = for {
        k <- Gen.choose(1, ids.size)
        perm <- Gen.const(scala.util.Random.javaRandomToRandom(
          new java.util.Random(i)).shuffle(ids))
      } yield perm.grouped(math.max(1, perm.size / k)).map(_.toSeq).toSeq
      val a = run(Seq(ids))
      val b = run(sample(splitsGen, 200L + i))
      if (ids.size <= cap) {
        assert(a === ids.sorted)
        assert(b === ids.sorted, s"under-cap group must be order-insensitive: $ids")
      } else {
        assert(a.size === cap && b.size === cap,
          s"over-cap group must surface exactly cap ids: $ids")
      }
    }
  }

  test("UnigramViterbi: concatenation invariant + optimality on short words") {
    val alphabet = Seq("a", "b", "c")
    val pieces: Seq[String] = alphabet ++
      Seq("aa", "ab", "ba", "cc", "abc", "bca", "aab")
    val costGen = Gen.listOfN(pieces.size, Gen.choose(0, 7))
    val wordGen = Gen.choose(1, 7).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    (1 to 40).foreach { i =>
      val costs = pieces.zip(sample(costGen, 300L + i)).toMap
      val words = sample(Gen.listOfN(25, wordGen), 400L + i).distinct
      val out = words.map(w => Tuple1(w)).toDF("w")
        .select($"w", UnigramViterbi.segment($"w", costs, 3).as("seg"))
        .as[(String, Seq[String])].collect()
      out.foreach { case (w, seg) =>
        assert(seg.mkString === w, s"concat invariant: $w -> $seg")
        // brute force: every segmentation into pieces of len ≤ 3
        def segs(s: String): Seq[Seq[String]] =
          if (s.isEmpty) Seq(Seq.empty)
          else (1 to math.min(3, s.length)).flatMap { l =>
            val (h, t) = (s.take(l), s.drop(l))
            if (costs.contains(h)) segs(t).map(h +: _) else Seq.empty
          }
        val best = segs(w).map(g => g.map(costs).sum).min
        assert(seg.map(costs).sum === best, s"optimality: $w -> $seg")
      }
    }
  }

  test("WordPieceTokenize: max-munch round trip, longest-first, whole-word UNK") {
    import graft.functions.WordPieceTokenize
    val vocab = Seq("a", "b", "c", "ab", "abc", "##b", "##c", "##bc", "##cb")
    val rows = Seq("abc", "abcbc", "a", "cab", "abd", "")
      .map(Tuple1(_)).toDF("w")
      .select($"w", WordPieceTokenize.tokenize($"w", vocab).as("p"))
      .as[(String, Seq[String])].collect().toMap
    assert(rows("abc") === Seq("abc"))              // longest prefix wins
    assert(rows("abcbc") === Seq("abc", "##bc"))    // greedy continuation
    assert(rows("a") === Seq("a"))
    assert(rows("cab") === Seq("c", "##b") || rows("cab") === Seq("[UNK]"))
    assert(rows("abd") === Seq("[UNK]"))            // 'd' unmatchable → whole-word UNK
    assert(rows("") === Seq.empty)
    // round-trip invariant: without UNK, stripping '##' concatenates back
    rows.foreach { case (w, p) =>
      if (p != Seq("[UNK]"))
        assert(p.map(_.stripPrefix("##")).mkString === w)
    }
  }

  test("WordPiece trainer: likelihood argmax prefers exclusive pair on tiny corpus") {
    // corpus: "xy" ×3, "zy" ×1, "zq" ×2 — raw-count BPE would pick
    // (x,##y) cnt 3; WordPiece score cnt/(cl·cr): (x,##y)=3/(3·4)=1/4,
    // (z,##q)=2/(3·2)=1/3 → likelihood picks the EXCLUSIVE pair (z,##q)
    val docs = Seq("xy xy xy zy zq zq").map(Tuple1(_)).toDF("text")
    val m = graft.operators.WordPiece.learnVocab(docs, "text", 1)
      .select("lhs", "rhs", "pair_count", "merged")
      .as[(String, String, Long, String)].collect()
    assert(m === Array(("z", "##q", 2L, "zq")))
  }
}
