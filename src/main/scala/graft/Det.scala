package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deterministic-output helpers.
  *
  * The driver verifies queries hash-exactly against DuckDB (Verify.scala →
  * CORRECTNESS_r{N}.json), and Spark's double-sum is partition-order dependent —
  * so every aggregate that leaves this engine is computed in exact decimal
  * arithmetic and only then cast to double. Same rule applies to the DuckDB
  * oracle SQL; identical inputs through identical IEEE ops → identical bits.
  *
  * At 100 TB this costs nothing: decimal sums still use partial (map-side)
  * aggregation, and the cast is per-group, not per-row.
  */
object Det {

  /** Exact sum: cast each addend to decimal(27,6), sum exactly, emit double. */
  def dsum(c: Column): Column =
    sum(c.cast(DecimalType(27, 6))).cast(DoubleType)

  /** Deterministic average = exact decimal sum / count, divided as doubles
    * (IEEE division is exactly rounded → engine-independent). */
  def davg(c: Column): Column =
    dsum(c) / count(c).cast(DoubleType)

  /** DuckDB twin of [[dsum]]. */
  def sqlDsum(e: String): String =
    s"CAST(SUM(CAST($e AS DECIMAL(27,6))) AS DOUBLE)"

  /** DuckDB twin of [[davg]]. */
  def sqlDavg(e: String): String =
    s"(${sqlDsum(e)} / CAST(COUNT($e) AS DOUBLE))"

  /** Timestamps cross engines as text (µs precision) — sidesteps parquet
    * TZ-annotation mismatches between Spark writer and DuckDB reader. */
  def fmtTs(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss.SSSSSS")

  /** DuckDB twin of [[fmtTs]]. */
  def sqlFmtTs(e: String): String = s"strftime($e, '%Y-%m-%d %H:%M:%S.%f')"

  def fmtDate(c: Column): Column = date_format(c, "yyyy-MM-dd")

  def sqlFmtDate(e: String): String = s"strftime($e, '%Y-%m-%d')"
}
