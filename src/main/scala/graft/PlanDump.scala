package graft

import graft.queries.Registry

/** Plan-audit diagnostic: for each registered query (optionally filtered by
  * a comma-separated name list), print the physical-plan cost signature —
  * exchange count, join node types, and whole-stage-codegen span count.
  * This is the `.explain`-and-iterate loop from the build brief as a
  * repeatable tool; PlanRegressionSpec pins the invariants, this surfaces
  * the numbers behind them.
  *
  * Usage: runMain graft.PlanDump <sfDir> [q1,q2,...]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val filter: Option[Set[String]] =
      if (args.length > 1) Some(args(1).split(",").toSet) else None
    val spark = GraftSession.fromEnv()
    val qs = Registry.all.filter(q => filter.forall(_.contains(q.name)))
    qs.foreach { q =>
      val plan = q.run(spark, sfDir).queryExecution.executedPlan.toString
      val lines = plan.linesIterator.toSeq
      def count(p: String) = lines.count(_.contains(p))
      // NOTE: with AQE on, this is the INITIAL physical plan (codegen
      // staging and runtime join demotions apply per-stage at execution) —
      // the right surface for a shuffle audit: every Exchange listed here
      // is one the optimizer planned to pay.
      val shuffles = lines.count(l => l.contains("Exchange hashpartitioning") ||
        l.contains("Exchange rangepartitioning") ||
        l.contains("Exchange SinglePartition"))
      val joins = Seq("BroadcastHashJoin", "SortMergeJoin",
        "ShuffledHashJoin", "BroadcastNestedLoopJoin")
        .map(j => j -> count(j)).filter(_._2 > 0)
        .map { case (j, c) => s"$j×$c" }.mkString(" ")
      println(f"PLAN ${q.name}%-24s shuffles=$shuffles%2d " +
        f"broadcasts=${count("BroadcastExchange")}%2d $joins")
    }
    spark.stop()
  }
}
