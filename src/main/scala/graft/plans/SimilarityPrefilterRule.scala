package graft.plans

import graft.functions.RatcliffObershelpSimilarity
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Optimizer rule (SURVEY.md §4 item 2): any predicate of the form
  * `ro_similarity(a, b) >= τ` (or `>`) gains a cheap length-ratio guard
  * conjoined IN FRONT of it:
  *
  *   2·least(len a, len b) / (len a + len b) >= τ
  *
  * Ratcliff–Obershelp can never exceed that bound (M ≤ min length), so the
  * rewrite is semantics-preserving. `And` short-circuits left-to-right in
  * both interpreted and codegen evaluation, so far-apart pairs never reach
  * the O(n·m) similarity kernel — on a similarity cross-join this is the
  * difference between scoring every pair and scoring the plausible band.
  * Users get it without knowing about `Similarity.lengthPrefilter`.
  */
object SimilarityPrefilterRule extends Rule[LogicalPlan] {

  private def bound(sim: RatcliffObershelpSimilarity, tau: Expression): Expression = {
    val la = Cast(Length(sim.left), DoubleType)
    val lb = Cast(Length(sim.right), DoubleType)
    GreaterThanOrEqual(
      Divide(Multiply(Literal(2.0), Least(Seq(la, lb))), Add(la, lb)),
      tau)
  }

  private def rewrite(cond: Expression): Expression = cond match {
    case And(l, r) => And(rewrite(l), rewrite(r))
    case g @ GreaterThanOrEqual(sim: RatcliffObershelpSimilarity,
        tau @ Literal(_, DoubleType)) =>
      And(bound(sim, tau), g)
    case g @ GreaterThan(sim: RatcliffObershelpSimilarity,
        tau @ Literal(_, DoubleType)) =>
      And(bound(sim, tau), g)
    case other => other
  }

  // idempotence guard: optimizer batches run to fixpoint — skip conditions
  // we already guarded (a Least over lengths is our fingerprint)
  private def applicable(cond: Expression): Boolean =
    cond.exists(_.isInstanceOf[RatcliffObershelpSimilarity]) &&
      !cond.exists(_.isInstanceOf[Least])

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case Filter(cond, child) if applicable(cond) =>
      Filter(rewrite(cond), child)
    // by the time user rules run, Catalyst has folded Filter-over-cross-join
    // into the join condition itself — guard there too
    case j: Join if j.condition.exists(applicable) =>
      j.copy(condition = j.condition.map(rewrite))
  }
}
