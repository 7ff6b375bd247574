package graft

import org.apache.spark.sql.functions._

/** Scratch probe main for local iteration (not part of the driver contract).
  * Edit freely: time a pipeline stage, print a plan, inspect a table. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("local[32]", "32")
    val d = args.lift(0).getOrElse("/root/testdata/sf0.01")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"PROBE $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    t("docs count") {
      System.err.println(Tables.documents(spark, d).count())
    }
    spark.stop()
  }
}
