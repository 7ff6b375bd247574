package graft

import graft.functions.RatcliffObershelp
import org.scalatest.funsuite.AnyFunSuite

/** Golden values generated with CPython difflib.SequenceMatcher(None,a,b)
  * .ratio() — the exact semantics the reference relies on
  * (enhanced_mapping.py:579). */
class SimilaritySpec extends AnyFunSuite {

  val goldens: Seq[(String, String, Double)] = Seq(
    ("manchester utd", "manchester city", 0.8275862068965517),
    ("bayern munich", "bayern munich", 1.0),
    ("paris saint germain", "psg", 0.2727272727272727),
    ("borussia monchengladbach", "b. monchengladbach", 0.8095238095238095),
    ("unknown team", "team a", 0.4444444444444444),
    ("barcelona", "real madrid", 0.2),
    ("", "", 1.0),
    ("", "a", 0.0),
    ("abc", "cba", 0.3333333333333333),
    ("abcdefgh", "abdcefgh", 0.875),
    ("the quick brown fox", "the quick brown dog", 0.8947368421052632),
    ("aaabbb", "bbbaaa", 0.5),
    ("xyzzy", "zzyxy", 0.6))

  test("ratio matches difflib bit-for-bit on golden pairs") {
    goldens.foreach { case (a, b, expect) =>
      assert(RatcliffObershelp.ratio(a, b) === expect, s"($a, $b)")
    }
  }

  test("ratio bounds and identity (seeded random strings)") {
    val rnd = new scala.util.Random(42)
    (1 to 500).foreach { _ =>
      val a = rnd.alphanumeric.take(rnd.nextInt(30)).mkString
      val b = rnd.alphanumeric.take(rnd.nextInt(30)).mkString
      val r = RatcliffObershelp.ratio(a, b)
      assert(r >= 0.0 && r <= 1.0, s"($a, $b)")
      assert(RatcliffObershelp.ratio(a, a) === 1.0)
    }
  }

  test("disjoint alphabets score zero") {
    assert(RatcliffObershelp.ratio("aaaa", "bbbb") === 0.0)
  }
}
