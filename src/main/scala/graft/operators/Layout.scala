package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) data layout — multi-dimensional clustering for
  * min/max file skipping. Sorting 100 TB by one column prunes scans on
  * that column only; interleaving the bits of TWO filter columns into one
  * Z value and laying files out along it gives every file a tight
  * bounding box in BOTH dimensions, so a scan with a predicate on either
  * (or both) skips most files from footer stats alone. The same
  * technique lakehouse engines expose as OPTIMIZE ... ZORDER BY.
  *
  * Everything here is exact integer arithmetic on the low `bits` bits of
  * each dimension — codegen'd, shuffle-free, and reproducible in the
  * DuckDB twin bit for bit.
  */
object Layout {

  /** Interleaves the low `bits` bits of `x` (even positions) and `y`
    * (odd positions) into a Z value in [0, 4^bits). Pure projection.
    *
    * GUARDED precondition (was documented-only until round 10): both
    * coordinates must already sit in [0, 2^bits). A coordinate outside
    * the cell range would silently alias onto another cell's Z value —
    * the bounding boxes stay truthful (stats derive from the real x/y)
    * but the clustering geometry quietly degrades, which no correctness
    * gate can see. `assert_true` turns that silent degradation into a
    * per-row runtime error. */
  def zValue(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    val hi = 1L << bits
    val xl = x.cast("long"); val yl = y.cast("long")
    val guard = assert_true(
      xl >= 0L && xl < hi && yl >= 0L && yl < hi,
      concat_ws(" ", lit(s"zValue coordinate outside [0, $hi):"),
        xl.cast("string"), yl.cast("string")))
    val z = (0 until bits).map { i =>
      shiftright(xl, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)) +
        shiftright(yl, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1))
    }.reduce(_ + _)
    when(guard.isNull, z)
  }

  /** Assigns each row a layout file by the TOP `fileBits` bits of its Z
    * value — a fixed Z-range grid of 2^fileBits files. Map-side only: no
    * global sort is needed because the grid is defined by the value, not
    * the rank (a production rewrite would `repartitionByRange` on the
    * same `z` to balance file sizes; the pruning geometry is identical).
    * Returns the input plus (`z`, `file_id`). */
  def zOrderFiles(df: DataFrame, xCol: String, yCol: String, bits: Int,
      fileBits: Int): DataFrame = {
    require(fileBits >= 1 && fileBits <= 2 * bits, "fileBits out of range")
    df.withColumn("z", zValue(col(xCol), col(yCol), bits))
      .withColumn("file_id", shiftright(col("z"), 2 * bits - fileBits))
  }

  /** ZONE-MAP PRUNED SCAN over the Z-ordered layout: answers a 2D range
    * query by consulting per-file min/max stats FIRST and reading only
    * files whose bounding box intersects the predicate — the file-
    * skipping read path the layout exists for. Returns a one-row audit:
    * (files_total, files_scanned, rows_scanned, rows_matched,
    * sum_metric), so the gate pins BOTH that pruning loses no rows
    * (rows_matched/sum equal the plain predicate's) and how many files
    * the stats actually skipped.
    *
    * Here the stats table is derived in-query (the layout is synthetic);
    * in the production write path it is the parquet footer min/max that
    * [[zOrderFiles]]' write produced, read at planning time — zero data
    * touched for the skip decision. The candidate file list is bounded
    * by 2^fileBits and broadcast; the scan joins on file_id, so only
    * candidate partitions are read. */
  def zoneMapPrune(df: DataFrame, xCol: String, yCol: String,
      metricCol: String, bits: Int, fileBits: Int,
      xLo: Long, xHi: Long, yLo: Long, yHi: Long): DataFrame = {
    val laid = zOrderFiles(df, xCol, yCol, bits, fileBits)
    val stats = laid.groupBy(col("file_id"))
      .agg(min(col(xCol)).as("min_x"), max(col(xCol)).as("max_x"),
        min(col(yCol)).as("min_y"), max(col(yCol)).as("max_y"),
        count(lit(1)).as("n_rows"))
    val isCand = col("max_x") >= xLo && col("min_x") <= xHi &&
      col("max_y") >= yLo && col("min_y") <= yHi
    val cand = stats.filter(isCand)
    val scanned = laid.join(broadcast(cand.select(col("file_id"))),
      Seq("file_id"))
    val matched = scanned.filter(col(xCol).between(xLo, xHi) &&
      col(yCol).between(yLo, yHi))
    // one conditional pass over the stats table for all file counters;
    // the final assembly is a 1-row × 1-row cross join (PlanRegressionSpec
    // allowlists it — a literal equi-key would just constant-fold back
    // into a cross join anyway)
    stats.agg(count(lit(1)).as("files_total"),
        sum(isCand.cast("long")).as("files_scanned"),
        sum(when(isCand, col("n_rows")).otherwise(lit(0L)))
          .as("rows_scanned"))
      .crossJoin(matched.agg(count(lit(1)).as("rows_matched"),
        sum(col(metricCol)).as("sum_metric")))
  }
}
