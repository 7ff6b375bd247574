package graft

import graft.functions.TopKAggregator
import org.apache.spark.sql.functions._

class TopKAggregatorSpec extends SparkSpec {
  import spark.implicits._

  test("typed top-k aggregator matches the window formulation") {
    val ev = Tables.events(spark, sfDir)
    // typed path: per event_type, top-3 user ids by value
    val ds = ev.select(col("event_type"), col("value"),
        col("user_id").cast("string"))
      .as[(String, Double, String)]
    val typedTop = ds.groupByKey(_._1)
      .mapValues(t => (t._2, t._3))
      .agg(new TopKAggregator(3).toColumn.name("top"))
      .collect().toMap
    // window reference
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type"))
      .orderBy(desc("value"), col("user_id").cast("string"))
    val windowTop = ev
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("event_type"), col("user_id").cast("string"), col("rn"))
      .as[(String, String, Int)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._3).map(_._2).toSeq).toMap
    windowTop.foreach { case (k, expect) =>
      assert(typedTop(k) === expect, s"event_type $k")
    }
  }

  test("bounded buffer: never more than k items, deterministic on ties") {
    val ds = Seq((1.0, "b"), (1.0, "a"), (2.0, "c"), (0.5, "d"), (2.0, "a"))
      .toDS()
    val top = ds.groupByKey(_ => 1).agg(new TopKAggregator(3).toColumn)
      .collect().head._2
    assert(top === Seq("a", "c", "a")) // 2.0/a, 2.0/c, then 1.0/a
  }
}
