package graft.queries

import graft.{Det, Tables}
import org.apache.spark.sql.functions._

/** Incremental view maintenance — the delta-merge algebra a 100 TB
  * warehouse uses instead of recomputing materialized aggregates: a
  * maintained view absorbs a CDC batch (inserts +1, retractions −1) by
  * aggregating ONLY the delta and additively merging it into the stored
  * group state (counts and sums are self-maintainable; groups whose
  * multiplicity reaches 0 are dropped — the standard bag-semantics IVM
  * rule, cf. Griffin/Libkin and the DBSP formulation).
  *
  * The gate is a true cross-derivation equivalence: Spark computes the
  * view INCREMENTALLY (base agg ⊎ delta agg, never touching base rows
  * at maintenance time), the DuckDB twin recomputes the final state
  * from scratch — equal hashes prove the maintenance algebra, not just
  * the arithmetic.
  *
  * Scale shape: at maintenance time the only corpus-sized input is the
  * DELTA (here carved deterministically out of `events` so the gate is
  * self-contained); the stored view is group-bounded state keyed the
  * same way, so the merge is one co-partitioned aggregate. Min/max are
  * deliberately absent: they are NOT self-maintainable under deletes
  * (a retracted extremum forces a re-scan) — the view keeps the
  * additive statistics IVM can actually carry.
  */
object IvmQueries {

  /** CDC carve-out: base view = all events except residue-7 ids
    * (those arrive later as inserts); the delta batch retracts the
    * residue-3 rows (present in base) and inserts the residue-7 rows.
    * Final state therefore equals a from-scratch aggregate over
    * `event_id % 10 != 3` — which is exactly what the twin computes. */
  val qIvmAgg = GQuery("q_ivm_agg",
    (s, d) => {
      val ev = Tables.events(s, d).select(
        col("event_id"), col("user_id"),
        Det.fmtDate(to_date(col("ts"))).as("day"),
        floor(col("value") * 100).cast("long").as("cents"))
      val base = ev.filter(col("event_id") % 10 =!= 7)
      val delta = ev.filter(col("event_id") % 10 === 7)
        .withColumn("mult", lit(1L))
        .unionByName(ev.filter(col("event_id") % 10 === 3)
          .withColumn("mult", lit(-1L)))
      val view = base.groupBy(col("user_id"), col("day"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"))
      val deltaAgg = delta.groupBy(col("user_id"), col("day"))
        .agg(sum(col("mult")).as("n"),
          sum(col("mult") * col("cents")).as("sum_cents"))
      view.unionByName(deltaAgg)
        .groupBy(col("user_id"), col("day"))
        .agg(sum(col("n")).as("n"), sum(col("sum_cents")).as("sum_cents"))
        .filter(col("n") > 0L)
        .select(col("user_id"), col("day"), col("n"),
          coalesce(col("sum_cents"), lit(0L)).as("sum_cents"))
        .orderBy(col("user_id"), col("day"))
    },
    Some("""SELECT user_id, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
        CAST(COUNT(*) AS BIGINT) AS n,
        CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
          AS sum_cents
      FROM events WHERE event_id % 10 != 3
      GROUP BY 1, 2 ORDER BY user_id, day"""),
    notes = "bag-semantics IVM: delta-only aggregation merged " +
      "additively into stored group state, zero-multiplicity groups " +
      "dropped; twin recomputes from scratch — the equivalence IS the " +
      "maintenance-algebra proof")

  val all: Seq[GQuery] = Seq(qIvmAgg)
}
