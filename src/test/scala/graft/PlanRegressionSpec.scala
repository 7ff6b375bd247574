package graft

import graft.queries.Registry

/** Plan guardrail over the WHOLE registry: no query may plan a
  * CartesianProduct, and BroadcastNestedLoopJoin is allowed only where a
  * broadcast cross join is the intended shape (tiny broadcast side scored
  * against every row — the entity-resolution candidate joins and the
  * brute-force ANN scoring). Catches silent plan degradations from future
  * query or optimizer-rule edits before the bench does.
  */
class PlanRegressionSpec extends SparkSpec {

  // intentional broadcast cross joins (candidates/queries side is tiny and
  // explicitly broadcast; scoring every pair is the operator's semantics)
  val bnljAllowed: Set[String] = Set(
    "q_jaccard_pairs", "q_entity_resolution", "q_fuzzy_join",
    "q_substring_conf", "q_cosine_topk")

  test("no cartesian products; BNLJ only where cross-scoring is intended") {
    Registry.all.foreach { q =>
      val plan =
        try q.run(spark, sfDir).queryExecution.executedPlan.toString
        catch { case e: Throwable =>
          fail(s"${q.name} failed to plan: ${e.getMessage}")
        }
      assert(!plan.contains("CartesianProduct"),
        s"${q.name} plans a CartesianProduct")
      if (!bnljAllowed(q.name)) {
        assert(!plan.contains("BroadcastNestedLoopJoin"),
          s"${q.name} plans an unexpected BroadcastNestedLoopJoin")
      }
    }
  }
}
