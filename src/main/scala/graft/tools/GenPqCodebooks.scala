package graft.tools

import graft.{GraftSession, Tables}
import graft.operators.Ann

/** One-off generator for the committed product-quantizer codebooks
  * ([[graft.operators.PqModel]]): runs the deterministic per-subspace L2
  * Lloyd trainer (bounded ordered sample, fixed rounds,
  * Ann.trainPqCodebooks) on the sf0.01 corpus and prints the codebook
  * rows as shortest-round-trip double literals, ready to paste into
  * PqModel.scala. Re-running on the same data reproduces the same
  * literals bit-for-bit.
  *
  * Usage: sbt "runMain graft.tools.GenPqCodebooks [sfDir]"
  */
object GenPqCodebooks {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = GraftSession.fromEnv()
    val books = Ann.trainPqCodebooks(Tables.embeddings(spark, dir),
      "vec_id", "embedding", numSub = 8, k = 16)
    println(s"PQGEN_BEGIN numSub=${books.size} k=${books.head.size} " +
      s"subDim=${books.head.head.size} dir=$dir")
    books.foreach { cb =>
      println("    Seq(")
      cb.foreach { c =>
        println("      Seq(" +
          c.map(d => java.lang.Double.toString(d)).mkString(", ") + "),")
      }
      println("    ),")
    }
    println("PQGEN_END")
    spark.stop()
  }
}
