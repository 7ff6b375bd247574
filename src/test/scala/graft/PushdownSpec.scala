package graft

import org.apache.spark.sql.functions._

/** Plan-quality guardrails: filters and projections must reach the parquet
  * scan — a scan reading all columns for a 2-column projection, or
  * post-filtering what parquet could skip, is the kind of regression that
  * only shows up at 100 TB. */
class PushdownSpec extends SparkSpec {

  test("predicate and projection push down to the documents scan") {
    val q = Tables.documents(spark, sfDir)
      .filter(col("doc_id") < 100)
      .select("doc_id", "lang")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("LessThan(doc_id,100)"),
      s"filter not pushed:\n$plan")
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,lang:string>"),
      s"columns not pruned:\n$plan")
  }

  test("events loader prunes columns through the ns->us conversion") {
    val q = Tables.events(spark, sfDir)
      .filter(col("event_type") === "click")
      .select("event_id", "event_type")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("EqualTo(event_type,click)"),
      s"filter not pushed:\n$plan")
    // ts is converted in the loader but must NOT force a full-width read
    assert(!plan.contains("props"), s"unused props column read:\n$plan")
  }

  test("new expressions are SQL-callable and total on edge inputs") {
    // empty vector: all projections 0 → signature 0 for every table
    val sigs = spark.sql(
      "SELECT hyperplane_sigs(array(), 64, 6, 2) AS s").head.getSeq[Long](0)
    assert(sigs === Seq(0L, 0L))
    val d = spark.sql(
      "SELECT dot_float(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .head.getDouble(0)
    assert(d === 11.0)
    val st = spark.sql(
      "SELECT text_stats('the quick fox!') AS s").head.getStruct(0)
    assert(st.getAs[Long]("n_tokens") === 3L)
    assert(st.getAs[Long]("n_punct") === 1L)
    assert(st.getAs[Long]("stop_en") === 1L)
  }
}
