package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine query: Spark formulation + optional DuckDB oracle twin.
  *
  * Contract discipline (driver compare, see builder prompt):
  *  - output column names identical between Spark and oracle;
  *  - every query totally ordered on non-nullable keys (Spark asc = NULLS
  *    FIRST vs DuckDB NULLS LAST — never sort a nullable column);
  *  - doubles produced only by deterministic arithmetic ([[graft.Det]]);
  *  - timestamps leave as formatted strings (fmtTs) or epoch integers.
  */
final case class GQuery(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    notes: String = "")
