package graft.tools

import graft.{GraftSession, Tables}
import graft.operators.Ann

/** One-off generator for the committed IVF coarse-quantizer model
  * ([[graft.operators.IvfModel]]): runs the deterministic trainer
  * (bounded ordered sample + fixed-round Lloyd, Ann.trainIvfCentroids) on
  * the sf0.01 corpus and prints the centroid rows as shortest-round-trip
  * double literals, ready to paste into IvfModel.scala. Re-running on the
  * same data reproduces the same literals bit-for-bit.
  *
  * Usage: sbt "runMain graft.tools.GenIvfCentroids [sfDir]"
  */
object GenIvfCentroids {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = GraftSession.fromEnv()
    val cent = Ann.trainIvfCentroids(Tables.embeddings(spark, dir),
      "vec_id", "embedding", k = 16, sampleMod = 7, iters = 8)
    println(s"IVFGEN_BEGIN dim=${cent.head.size} k=${cent.size} dir=$dir")
    cent.foreach { c =>
      println("    Seq(" +
        c.map(d => java.lang.Double.toString(d)).mkString(", ") + "),")
    }
    println("IVFGEN_END")
    spark.stop()
  }
}
