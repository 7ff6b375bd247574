package graft.plans

/** Machine-readable physical-plan signature (round-11 verdict ask #3):
  * the operator counts PLANS.md describes in prose — shuffle exchanges,
  * broadcast exchanges/joins, sort-merge joins, nested-loop joins,
  * cartesian products — extracted from the executed-plan string so a
  * lost broadcast or a surprise extra shuffle in ANY registry query
  * diffs against the committed table (`plan_signatures.tsv`) instead of
  * waiting for a human plan-read.
  *
  * Counts come from the INITIAL physical plan (what
  * `queryExecution.executedPlan` prints before any AQE re-plan): that is
  * the deterministic, submit-time shape; AQE runtime improvements
  * (coalesce, skew split, SMJ->BHJ promotion) are on top and never
  * counted, so the committed signature is stable run to run. */
object PlanSig {

  /** exchanges = shuffle exchanges only (broadcast exchanges counted
    * separately — a broadcast is cheap and GOOD; a shuffle is the thing
    * to budget). */
  final case class Sig(shuffles: Int, broadcasts: Int, bhj: Int, smj: Int,
      shj: Int, bnlj: Int, cartesian: Int) {
    def fmt: String =
      s"sh=$shuffles bc=$broadcasts bhj=$bhj smj=$smj shj=$shj " +
        s"bnlj=$bnlj cart=$cartesian"
  }

  private def count(plan: String, token: String): Int = {
    var n = 0; var i = plan.indexOf(token)
    while (i >= 0) { n += 1; i = plan.indexOf(token, i + token.length) }
    n
  }

  def of(plan: String): Sig = {
    // "Exchange hashpartitioning/rangepartitioning/..." is a shuffle;
    // "Exchange SinglePartition" too. Broadcasts print as
    // "BroadcastExchange" — count them apart, then subtract from the
    // generic Exchange token count (every "BroadcastExchange" contains
    // "Exchange" as a substring). "ReusedExchange" nodes are references
    // to an exchange counted once already — attribute each to the kind
    // it reuses (the node line names the child: "ReusedExchange [...],
    // BroadcastExchange ..." vs "... Exchange hashpartitioning") so a
    // reused broadcast never inflates the shuffle count.
    val reusedBc = count(plan, "ReusedExchange") match {
      case 0 => 0
      case _ => plan.linesIterator
        .filter(_.contains("ReusedExchange"))
        .count(_.contains("BroadcastExchange"))
    }
    val reusedSh = count(plan, "ReusedExchange") - reusedBc
    // each ReusedExchange line holds the token "Exchange" twice (once in
    // "ReusedExchange", once in the named child exchange), so subtract 2
    // per reference of either kind
    val bc = count(plan, "BroadcastExchange") - reusedBc
    val sh = count(plan, "Exchange") - bc - 2 * (reusedBc + reusedSh)
    Sig(
      shuffles = sh,
      broadcasts = bc,
      bhj = count(plan, "BroadcastHashJoin"),
      smj = count(plan, "SortMergeJoin"),
      shj = count(plan, "ShuffledHashJoin"),
      bnlj = count(plan, "BroadcastNestedLoopJoin"),
      cartesian = count(plan, "CartesianProduct"))
  }

  def parse(s: String): Sig = {
    val m = s.split(" ").map { kv =>
      val Array(k, v) = kv.split("="); k -> v.toInt
    }.toMap
    Sig(m("sh"), m("bc"), m("bhj"), m("smj"), m("shj"), m("bnlj"),
      m("cart"))
  }
}
