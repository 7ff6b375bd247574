package graft

import graft.plans.PlanSig

/** Regenerate the committed plan-signature table (round-11 ask #3).
  *
  * Usage: runMain graft.PlanSigDump [outFile] [sfDir]
  *
  * Writes one line per registry query: `name\t<sig>`. The companion gate
  * (PlanRegressionSpec "every registry query matches its committed plan
  * signature") recomputes the table at the SAME sf (sf0.001 — plan
  * shapes can depend on input stats, so the table is only meaningful at
  * the sf it was dumped at) and fails on any drift.
  *
  * UPDATE PROTOCOL for an intended plan change: rerun this main, eyeball
  * the diff (`git diff plan_signatures.tsv`) — every changed line is a
  * query whose shuffle/broadcast/join shape you just changed; commit the
  * new table together with the code change and a note in the commit
  * message naming the queries and why the new shape is right. */
object PlanSigDump {
  def main(args: Array[String]): Unit = {
    val out = args.lift(0).getOrElse("plan_signatures.tsv")
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.fromEnv()
    // empty-cache start + single pass in sorted order: the EXACT protocol
    // the PlanRegressionSpec gate replays, so cache-swapped subtrees
    // accumulate identically on both sides
    spark.catalog.clearCache()
    val lines = queries.Registry.all.sortBy(_.name).map { q =>
      val plan = q.run(spark, sfDir).queryExecution.executedPlan.toString
      s"${q.name}\t${PlanSig.of(plan).fmt}"
    }
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (lines.mkString("\n") + "\n").getBytes("UTF-8"))
    println(s"PLANSIG_DUMP_DONE n=${lines.size} out=$out sf=$sfDir")
    spark.stop()
  }
}
