package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy auditing for release pipelines — the checks a dataset must
  * pass before rows leave the enclave, next to the transform-side
  * primitives ([[graft.functions.Redact]] scrubbing/pseudonymization).
  *
  * k-anonymity (Sweeney 2002): every combination of quasi-identifier
  * values must be shared by ≥ k rows, else the combination singles
  * people out even with direct identifiers removed. l-diversity
  * (Machanavajjhala 2006) closes the homogeneity hole k-anonymity
  * leaves: a group can be k-large yet reveal the sensitive attribute
  * if all k rows share one sensitive value — so each group must also
  * carry ≥ l DISTINCT sensitive values. */
object Privacy {

  /** Per-equivalence-class audit: group by the quasi-identifier columns
    * (callers pass already-generalized columns — banding is the
    * caller's policy decision), report class size, sensitive-value
    * diversity, and the two pass flags. One map-side-combined agg over
    * the corpus — class count is bounded by the generalized domain, so
    * the output (and any broadcast of the failing classes back onto
    * rows for suppression) stays small at any corpus size. */
  def kAnonymityAudit(df: DataFrame, quasi: Seq[Column],
      sensitive: Column, k: Int = 5, l: Int = 2): DataFrame = {
    require(k >= 2 && l >= 1)
    val named = quasi.zipWithIndex.map { case (c, i) => c.as(s"q$i") }
    val qCols = quasi.indices.map(i => col(s"q$i"))
    df.select(named :+ sensitive.as("__s"): _*)
      .groupBy(qCols: _*)
      .agg(count(lit(1)).as("n"),
        countDistinct(col("__s")).as("l_div"))
      .withColumn("k_anon", (col("n") >= k).cast("boolean"))
      .withColumn("l_diverse", (col("l_div") >= l).cast("boolean"))
      .orderBy(qCols: _*)
  }
}
