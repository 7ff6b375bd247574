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

  private def rewrite(cond: Expression): Expression = {
    // idempotence: optimizer batches run to fixpoint — a comparison is
    // skipped iff the condition already contains ITS OWN bound (checked by
    // semanticEquals against the exact shape over the sim's children), so an
    // unrelated least() — or a manually-written lengthPrefilter for a
    // DIFFERENT pair — never disables the rewrite.
    def guarded(sim: RatcliffObershelpSimilarity, tau: Expression): Boolean =
      cond.exists(_.semanticEquals(bound(sim, tau)))
    def go(e: Expression): Expression = e match {
      case And(l, r) => And(go(l), go(r))
      case g @ GreaterThanOrEqual(sim: RatcliffObershelpSimilarity,
          tau @ Literal(_, DoubleType)) if !guarded(sim, tau) =>
        And(bound(sim, tau), g)
      case g @ GreaterThan(sim: RatcliffObershelpSimilarity,
          tau @ Literal(_, DoubleType)) if !guarded(sim, tau) =>
        And(bound(sim, tau), g)
      // mirrored forms: τ <= sim, τ < sim
      case g @ LessThanOrEqual(tau @ Literal(_, DoubleType),
          sim: RatcliffObershelpSimilarity) if !guarded(sim, tau) =>
        And(bound(sim, tau), g)
      case g @ LessThan(tau @ Literal(_, DoubleType),
          sim: RatcliffObershelpSimilarity) if !guarded(sim, tau) =>
        And(bound(sim, tau), g)
      case other => other
    }
    go(cond)
  }

  private def applicable(cond: Expression): Boolean =
    cond.exists(_.isInstanceOf[RatcliffObershelpSimilarity])

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) if applicable(cond) =>
      val rewritten = rewrite(cond)
      if (rewritten.fastEquals(cond)) f else Filter(rewritten, child)
    // by the time user rules run, Catalyst has folded Filter-over-cross-join
    // into the join condition itself — guard there too
    case j: Join if j.condition.exists(applicable) =>
      val rewritten = j.condition.map(rewrite)
      if (rewritten.zip(j.condition).forall { case (a, b) => a.fastEquals(b) }) j
      else j.copy(condition = rewritten)
  }
}
