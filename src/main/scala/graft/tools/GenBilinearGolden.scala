package graft.tools

import graft.operators.ImageCodec

/** Generates the committed golden for the bilinear resize kernel
  * (MultimodalSpec "bilinear resize matches the committed golden"):
  * for each (id, source dims, target dims) case, render the deterministic
  * synth PNG, bilinear-resize it, decode the result, and print the exact
  * channel sums as Scala tuple literals. Interpolation arithmetic is not
  * SQL-twin-replayable, so a recorded golden (plus invariance properties)
  * is the correctness pin for this kernel — same pattern as the SimHash
  * golden. Run: `sbt "runMain graft.tools.GenBilinearGolden"`. */
object GenBilinearGolden {
  def main(args: Array[String]): Unit = {
    val cases = Seq(
      (3L, 24, 15, 8), (6L, 30, 18, 12), (9L, 17, 17, 5),
      (12L, 40, 10, 16), (33L, 9, 27, 6))
    cases.foreach { case (id, sw, sh, maxSide) =>
      val png = ImageCodec.synthPng(id, sw, sh)
      val m = math.max(sw, sh)
      val dw = math.max(1, sw * maxSide / m)
      val dh = math.max(1, sh * maxSide / m)
      val s = ImageCodec.decodeStats(ImageCodec.resizeBilinear(png, dw, dh))
      println(s"($id, $sw, $sh, $maxSide, ${s.width}, ${s.height}, " +
        s"${s.sum_r}L, ${s.sum_g}L, ${s.sum_b}L),")
    }
  }
}
