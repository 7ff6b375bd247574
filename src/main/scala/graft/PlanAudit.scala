package graft

/** Dev main: dump formatted physical plans for the headline queries so plan
  * regressions (lost pushdown, BNLJ, surprise shuffles) are visible. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("local[8]", "8")
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args(1).split(",").toSet
      else Set("q_flagship", "q1_agg", "q_join_enrich", "q_lag_movement",
        "q_asof_join", "q_range_join", "q_disjunct_join", "q_topk",
        "q_minhash_pairs", "q_cosine_topk")
    queries.Registry.all.filter(q => names(q.name)).foreach { q =>
      println(s"\n======== ${q.name} ========")
      try println(q.run(spark, d).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      catch { case e: Throwable => println(s"ERROR: ${e.getMessage}") }
    }
    spark.stop()
  }
}
