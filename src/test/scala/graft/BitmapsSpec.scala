package graft

import graft.operators.Bitmaps
import graft.queries.PipelineQueries
import org.apache.spark.sql.functions._

/** The bitmap exact-distinct family vs Spark's own countDistinct and a
  * collected re-derivation. */
class BitmapsSpec extends SparkSpec {

  test("bitmapDistinct equals countDistinct per group") {
    val ev = Tables.events(spark, sfDir)
    val got = Bitmaps.bitmapDistinct(ev, Seq("event_type"), "user_id",
        "n_users")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = ev.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === want)
    assert(got.values.sum > 0)
  }

  test("q_bitmap_rolling: OR-merged daily bitmaps equal brute re-count") {
    val out = PipelineQueries.qBitmapRolling.run(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap

    val base = Tables.events(spark, sfDir)
      .select(col("event_type"), to_date(col("ts")).as("d"), col("user_id"))
      .collect().map(r => (r.getString(0), r.getDate(1).toLocalDate,
        r.getLong(2)))
    base.groupBy(_._1).foreach { case (typ, rows) =>
      rows.map(_._2).distinct.foreach { day =>
        val users = rows.filter(r =>
          !r._2.isAfter(day) && !r._2.isBefore(day.minusDays(6)))
          .map(_._3).distinct.size.toLong
        assert(out((typ, day.toString)) === users, s"($typ, $day)")
      }
    }
    assert(out.size === base.map(r => (r._1, r._2)).distinct.size)
  }
}
