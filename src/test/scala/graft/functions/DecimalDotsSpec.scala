package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** The fast-double/exact-decimal decision margin (no SparkSession — these
  * are pure JVM kernels). The margin must scale with input magnitude: a
  * fixed absolute margin is only valid for unit-norm embeddings, and a
  * large-magnitude vector whose double fold drifts past it could silently
  * return a sign/ordering that differs from the all-decimal semantics the
  * oracles define. */
class DecimalDotsSpec extends AnyFunSuite {
  import DecimalDotsExact._

  test("fastMargin floors at the documented unit-scale bound") {
    assert(fastMargin(64, 1.0) === 1e-9)
    assert(fastMargin(1, 0.0) === 1e-9)
  }

  test("fastMargin dominates the worst-case double-fold error at any magnitude") {
    // fold rounding over n terms is bounded by ~n·ulp(max partial sum) and
    // Σ|xᵢwᵢ| upper-bounds every partial sum; the margin carries 16× that
    for (sumAbs <- Seq(1.0, 1e6, 6.4e13, 1e18); n <- Seq(8, 64, 1024)) {
      assert(fastMargin(n, sumAbs) >= n * math.ulp(sumAbs),
        s"margin too small at n=$n sumAbs=$sumAbs")
    }
  }

  test("decideSign matches the all-decimal sign on large-magnitude near-cancelling vectors") {
    // magnitude ~1e15 products with near-total cancellation: the double
    // fold drifts by up to ~n·ulp(1e17) ≈ tens — far past any absolute
    // 1e-9 margin. The relative (Cauchy–Schwarz-bounded) margin must route
    // these to the exact path.
    val rnd = new scala.util.Random(42)
    (1 to 200).foreach { trial =>
      val n = 64
      val x = Array.fill(n)((rnd.nextDouble() - 0.5) * 2e15)
      val w0 = Array.fill(n)((rnd.nextDouble() - 0.5) * 2.0)
      // bend w to near-cancel the dot (projection removal in double — the
      // residual exact dot is small but generally nonzero)
      val d = dotDouble(x, w0)
      val xx = dotDouble(x, x)
      val w = Array.tabulate(n)(i => w0(i) - d / xx * x(i))
      val m = fastMargin(n, norm2(x) * norm2(w))
      val exactPositive = dotUnscaled(x, w).signum > 0
      assert(decideSign(x, w, m) === exactPositive, s"trial $trial diverged")
    }
  }

  test("decideSign unchanged on unit-scale embeddings (floor preserves old behavior)") {
    val rnd = new scala.util.Random(7)
    (1 to 200).foreach { trial =>
      val n = 64
      val x = Array.fill(n)(rnd.nextDouble() - 0.5)
      val w = Array.fill(n)(rnd.nextDouble() - 0.5)
      val m = fastMargin(n, norm2(x) * norm2(w))
      val exactPositive = dotUnscaled(x, w).signum > 0
      assert(decideSign(x, w, m) === exactPositive, s"trial $trial diverged")
    }
  }

  test("Cauchy–Schwarz margin bound dominates the exact |product| mass") {
    val rnd = new scala.util.Random(11)
    (1 to 100).foreach { _ =>
      val n = 64
      val x = Array.fill(n)((rnd.nextDouble() - 0.5) * 1e8)
      val w = Array.fill(n)((rnd.nextDouble() - 0.5) * 1e4)
      var sumAbs = 0.0
      var i = 0
      while (i < n) { sumAbs += math.abs(x(i) * w(i)); i += 1 }
      assert(norm2(x) * norm2(w) >= sumAbs * (1 - 1e-12))
    }
  }
}
