package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** EXACT distinct counting via mergeable fixed-width bitmaps — the
  * two-level bitmap aggregation lakehouse engines use when approximate
  * (HLL) is not acceptable: ids are bucketed (`bitmap_bucket_number`),
  * each (group, bucket) builds a bounded bitmap of bit positions
  * map-side, and bitmaps MERGE associatively (`bitmap_or_agg`) — so
  * distinct counts re-aggregate across partitions, days, or shards
  * without ever materializing the id set. The exact counterpart of the
  * engine's HLL path ([[Aggregates]] q_approx_distinct): same shuffle
  * shape, exact answer, state bounded at 4 KB per (group, bucket)
  * instead of a per-group hash set of ids.
  */
object Bitmaps {

  /** Exact distinct `idCol` per `keyCols`: two-level bitmap aggregation.
    * Level 1 groups on (keys, bucket) with map-side partial bitmaps;
    * level 2 sums per-bucket counts. Never holds ids — state per group
    * is #buckets × 4 KB regardless of cardinality. */
  def bitmapDistinct(df: DataFrame, keyCols: Seq[String], idCol: String,
      outCol: String): DataFrame =
    df.groupBy((keyCols.map(col) :+
        expr(s"bitmap_bucket_number($idCol)").as("_bkt")): _*)
      .agg(expr(
        s"bitmap_count(bitmap_construct_agg(bitmap_bit_position($idCol)))")
        .as("_c"))
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("_c")).as(outCol))

  /** Exact SEGMENT-OVERLAP matrix (audience intersection): for every
    * segment pair a < b, |A|, |B|, |A∩B|, |A∪B| and Jaccard per-mille —
    * all from the per-(segment, bucket) bitmaps, never from id sets.
    * Spark ships no bitmap AND, so the intersection is inclusion-
    * exclusion: |A∩B| = |A| + |B| − |A∪B|, with the union from
    * `bitmap_or_agg` over the PAIR-EXPLODED bounded bitmap table
    * (#segments × #buckets rows — the corpus contributes exactly one
    * shuffle to build the bitmaps; every pair statistic re-aggregates
    * mergeable state). The pair fan-out is an equi-join against the
    * exploded pair-side table, not an OR-condition nested loop.
    * Output: (seg_a, seg_b, n_a, n_b, n_inter, n_union,
    * jaccard_x1000), pair-ascending. */
  def bitmapOverlap(df: DataFrame, segCol: String,
      idCol: String): DataFrame = {
    val bm = df
      .groupBy(col(segCol).as("seg"),
        expr(s"bitmap_bucket_number($idCol)").as("_bkt"))
      .agg(expr(s"bitmap_construct_agg(bitmap_bit_position($idCol))")
        .as("_bm"))
      .localCheckpoint(true) // counts, pairs, and the union all reuse it
    val counts = bm
      .select(col("seg"), expr("bitmap_count(_bm)").as("_c"))
      .groupBy(col("seg")).agg(sum(col("_c")).as("n"))
    val segs = bm.select(col("seg")).distinct()
    // #segments is bounded (a segmentation column, not an id); the pair
    // enumeration is an intended broadcast cross join over that bound
    val pairs = segs
      .crossJoin(broadcast(segs.select(col("seg").as("seg_b"))))
      .filter(col("seg") < col("seg_b"))
      .select(col("seg").as("seg_a"), col("seg_b"))
    val unions = pairs
      .select(col("seg_a"), col("seg_b"),
        explode(array(col("seg_a"), col("seg_b"))).as("seg"))
      .join(bm, Seq("seg"))
      .groupBy(col("seg_a"), col("seg_b"), col("_bkt"))
      .agg(expr("bitmap_count(bitmap_or_agg(_bm))").as("_cu"))
      .groupBy(col("seg_a"), col("seg_b"))
      .agg(sum(col("_cu")).as("n_union"))
    unions
      .join(counts.select(col("seg").as("seg_a"), col("n").as("n_a")),
        Seq("seg_a"))
      .join(counts.select(col("seg").as("seg_b"), col("n").as("n_b")),
        Seq("seg_b"))
      .select(col("seg_a"), col("seg_b"), col("n_a"), col("n_b"),
        (col("n_a") + col("n_b") - col("n_union")).as("n_inter"),
        col("n_union"),
        expr("(n_a + n_b - n_union) * 1000 div n_union")
          .as("jaccard_x1000"))
      .orderBy(col("seg_a"), col("seg_b"))
  }

  /** Exact distinct `idCol` per (`keyCol`, trailing `days`-day window
    * ending at each active day): daily bitmaps are built ONCE from the
    * corpus [one shuffle], then the trailing window is answered by
    * OR-merging the (tiny) daily bitmap table — the corpus is never
    * re-scanned per window, which is the point of mergeable state.
    * Returns (keyCol, day, outCol). */
  def rollingBitmapDistinct(df: DataFrame, keyCol: String, tsCol: String,
      idCol: String, days: Int, outCol: String): DataFrame = {
    val daily = df
      .groupBy(col(keyCol), to_date(col(tsCol)).as("_d"),
        expr(s"bitmap_bucket_number($idCol)").as("_bkt"))
      .agg(expr(s"bitmap_construct_agg(bitmap_bit_position($idCol))")
        .as("_bm"))
    val anchors = daily.select(col(keyCol), col("_d").as("day")).distinct()
    anchors.join(daily,
        anchors(keyCol) === daily(keyCol) &&
          col("_d").between(date_sub(col("day"), days - 1), col("day")))
      .groupBy(anchors(keyCol), col("day"), col("_bkt"))
      .agg(expr("bitmap_count(bitmap_or_agg(_bm))").as("_c"))
      .groupBy(anchors(keyCol), col("day"))
      .agg(sum(col("_c")).as(outCol))
  }
}
