package graft

import graft.queries.Registry

/** Plan-evidence dumper (round-12 optimization protocol): writes the
  * `.explain("formatted")` output of each named registry query to
  * `<outDir>/<name>_<suffix>.txt` — the before/after artifacts the
  * optimization judge diffs against the code's plan claims.
  *
  * Usage: runMain graft.ExplainDump <sfDir> <outDir> <suffix> [q1,q2,...]
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = java.nio.file.Paths.get(args(1))
    val suffix = args(2)
    val filter: Option[Set[String]] =
      args.lift(3).map(_.split(",").toSet)
    java.nio.file.Files.createDirectories(outDir)
    val spark = GraftSession.fromEnv()
    val qs = Registry.all.filter(q => filter.forall(_.contains(q.name)))
    qs.foreach { q =>
      val text =
        try q.run(spark, sfDir).queryExecution
          .explainString(org.apache.spark.sql.execution.FormattedMode)
        catch { case e: Throwable => s"PLAN_ERROR: $e" }
      java.nio.file.Files.writeString(
        outDir.resolve(s"${q.name}_$suffix.txt"), text)
      println(s"EXPLAIN ${q.name} -> ${q.name}_$suffix.txt")
    }
    spark.stop()
  }
}
