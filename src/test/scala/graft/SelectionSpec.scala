package graft

import graft.operators.Selection
import org.apache.spark.sql.functions._

/** Histogram-refinement selection vs sorted-collect ground truth. */
class SelectionSpec extends SparkSpec {

  test("exactKth equals the sorted element for k across the range") {
    val v = Tables.events(spark, sfDir).select(
      (col("value").cast(org.apache.spark.sql.types.DecimalType(27, 6))
        * lit(1000000)).cast("long").as("x"))
    val sorted = v.collect().map(_.getLong(0)).sorted
    val n = sorted.length.toLong
    Seq(1L, 2L, n / 3, n / 2, n - 1, n).distinct.foreach { k =>
      assert(Selection.exactKth(v, "x", k) === sorted((k - 1).toInt),
        s"k=$k")
    }
  }

  test("exactKth handles negatives, duplicates, and a wide domain") {
    import spark.implicits._
    val vals: Seq[Long] = Seq(Long.MinValue / 4, -7L, -7L, -7L, 0L, 0L,
      3L, 3L, 1L << 40, Long.MaxValue / 4)
    val df = vals.toDF("x")
    val sorted = vals.sorted
    (1 to vals.size).foreach { k =>
      assert(Selection.exactKth(df, "x", k.toLong) === sorted(k - 1),
        s"k=$k")
    }
  }

  test("exactQuantiles uses the lower-element rule") {
    import spark.implicits._
    val df = (1L to 100L).toDF("x")
    val got = Selection.exactQuantiles(df, "x",
      Seq("p50" -> 0.5, "p90" -> 0.9, "p99" -> 0.99)).toMap
    assert(got === Map("p50" -> 50L, "p90" -> 90L, "p99" -> 99L))
  }
}
