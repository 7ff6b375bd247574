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
    * (odd positions) into a Z value in [0, 4^bits). Pure projection. */
  def zValue(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    (0 until bits).map { i =>
      shiftright(x.cast("long"), i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)) +
        shiftright(y.cast("long"), i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1))
    }.reduce(_ + _)
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
}
