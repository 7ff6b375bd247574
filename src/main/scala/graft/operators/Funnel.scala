package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered funnel analysis over an event stream — "how many users did
  * step₁, then step₂, then step₃, in order". The reference's phase
  * pipeline (early_odds → pre_match → team_news → final_data,
  * `/root/reference/.github/workflows/football-data-pipeline.yml:190-210`)
  * is exactly this shape per fixture; this is the user-journey
  * generalization every analytics stack ships.
  */
object Funnel {

  /** For each user, step i is REACHED at the earliest event of type
    * `steps(i)` at-or-after the reach time of step i−1 (events totally
    * ordered by (ts, idCol) — an equal-timestamp pair resolves by event
    * id, so the result is deterministic). Output: one row per step with
    * the count of users that reached it — by construction non-increasing.
    *
    * Scale shape: ONE shuffle on the user key. The per-step reach times
    * are running-window minima over the SAME (partitionBy user, orderBy
    * ts, id) spec — step i's qualifier reads step i−1's running min, so
    * Catalyst plans a chain of Window operators that all reuse one
    * exchange + one sort (each child's ordering already satisfies the
    * next window's requirement; `.explain` shows a single Exchange).
    * The per-user reduction and the final step-count aggregation are
    * map-side-combined counts — bytes on the wire ∝ users, then ∝ steps.
    * No self-join of the event table (the textbook funnel-as-k-way-join
    * shuffles the corpus k times and explodes on skewed users). */
  /** `maxGapUs`: when set, step i (i ≥ 1) only counts within that many
    * microseconds of the step-(i−1) reach time — "signed up, then viewed
    * within an hour". The gap test is an epoch-µs BIGINT compare, exact
    * in every engine. */
  def funnelSteps(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, idCol: String, steps: Seq[String],
      maxGapUs: Option[Long] = None): DataFrame = {
    require(steps.nonEmpty, "funnelSteps: empty step list")
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("eid"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    var cur = events.select(col(userCol).as("user_id"),
      col(tsCol).as("ts"), col(typeCol).as("etype"), col(idCol).as("eid"))
    steps.zipWithIndex.foreach { case (st, i) =>
      val prevOk =
        if (i == 0) lit(true)
        else maxGapUs match {
          case Some(gap) => col(s"r${i - 1}").isNotNull &&
            unix_micros(col("ts")) - unix_micros(col(s"r${i - 1}")) <= gap
          case None => col(s"r${i - 1}").isNotNull
        }
      cur = cur
        .withColumn(s"hit$i", when(col("etype") === st && prevOk, col("ts")))
        .withColumn(s"r$i", min(col(s"hit$i")).over(w))
    }
    val perUser = cur.groupBy(col("user_id"))
      .agg(steps.indices.map(i => min(col(s"hit$i")).as(s"u$i")).head,
        steps.indices.tail.map(i => min(col(s"hit$i")).as(s"u$i")): _*)
    val totals = perUser.agg(
      count(col("u0")).as("s0"),
      steps.indices.tail.map(i => count(col(s"u$i")).as(s"s$i")): _*)
    totals.select(explode(array(steps.zipWithIndex.map { case (st, i) =>
        struct(lit((i + 1).toLong).as("step"), lit(st).as("step_name"),
          col(s"s$i").as("users"))
      }: _*)).as("r"))
      .select(col("r.step"), col("r.step_name"), col("r.users"))
      .orderBy(col("step"))
  }

  /** FREQUENT SEQUENCE MINING (order-3): the top-k most frequent
    * CONSECUTIVE event-type trigrams across all user streams — the
    * "what paths do users actually take" query. Two lags ride the same
    * single per-user exchange every per-user window pays; the trigram
    * count is map-side-combined; the top-k is a TakeOrderedAndProject
    * (no global sort), totally ordered by (n DESC, steps ASC) so the
    * cut is deterministic, with rank numbered AFTER the limit on the
    * collapsed k-row result. */
  def frequentSequences(events: DataFrame, userCol: String, tsCol: String,
      idCol: String, typeCol: String, k: Int): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(idCol))
    val top = events
      .withColumn("s1", lag(col(typeCol), 2).over(w))
      .withColumn("s2", lag(col(typeCol), 1).over(w))
      .where(col("s1").isNotNull)
      .groupBy(col("s1"), col("s2"), col(typeCol).as("s3"))
      .agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), col("s1"), col("s2"), col("s3"))
      .limit(k)
    top.withColumn("rank", row_number().over(Window.orderBy(
        desc("n"), col("s1"), col("s2"), col("s3"))).cast("long"))
      .select(col("rank"), col("s1"), col("s2"), col("s3"), col("n"))
      .orderBy(col("rank"))
  }

  /** EVENT TRANSITION MATRIX (first-order Markov counts): for every
    * consecutive (prev_type → type) pair within a user's totally-ordered
    * stream, the transition count and the row-conditional probability
    * p = n / Σ_to n — one IEEE divide of two exact integers, so the double
    * is bit-identical cross-engine. The lag rides the same one user-key
    * exchange every per-user window pays; the (from, to) agg is
    * map-side-combined, and the per-from row total is a WINDOW SUM over
    * the already-aggregated #types² matrix — no self-join, no second
    * scan of the pair stream (a totals groupBy + join would recompute
    * the whole lag subtree: Spark does not share common subplans). */
  def transitionMatrix(events: DataFrame, userCol: String, tsCol: String,
      idCol: String, typeCol: String): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(idCol))
    events
      .withColumn("from_type", lag(col(typeCol), 1).over(w))
      .where(col("from_type").isNotNull)
      .groupBy(col("from_type"), col(typeCol).as("to_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("n_from",
        sum(col("n")).over(Window.partitionBy(col("from_type"))))
      .select(col("from_type"), col("to_type"), col("n"),
        (col("n").cast("double") / col("n_from").cast("double")).as("p"))
      .orderBy(col("from_type"), col("to_type"))
  }
}
