package graft

import graft.operators.Layout
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zValue: interleaves bits exactly (known values)") {
    // x=3 (011), y=5 (101), bits=3:
    // z = x0 + 2*y0 + 4*x1 + 8*y1 + 16*x2 + 32*y2
    //   = 1  + 2    + 4    + 0    + 0     + 32   = 39
    val out = Seq((3L, 5L)).toDF("x", "y")
      .select(Layout.zValue(col("x"), col("y"), 3).as("z"))
      .as[Long].head()
    assert(out === 39L)
    // identity checks: z(0,0)=0, z(2^b-1, 2^b-1)=4^b-1
    val corners = Seq((0L, 0L), (255L, 255L)).toDF("x", "y")
      .select(Layout.zValue(col("x"), col("y"), 8).as("z"))
      .as[Long].collect().toSeq
    assert(corners === Seq(0L, 65535L))
  }

  test("zValue: out-of-range coordinates raise instead of silently aliasing") {
    // x=2^bits wraps onto cell 0's Z under the old unguarded packing —
    // quiet clustering degradation; the guard must make it an error
    for ((x, y) <- Seq((8L, 3L), (3L, 8L), (-1L, 3L), (3L, -1L))) {
      val ex = intercept[Exception] {
        Seq((x, y)).toDF("x", "y")
          .select(Layout.zValue(col("x"), col("y"), 3).as("z"))
          .collect()
      }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil
        else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(ex).exists(_.contains("zValue coordinate outside")),
        s"($x,$y): $ex")
    }
    // in-range values still compute the exact interleave under the guard
    val ok = Seq((7L, 7L)).toDF("x", "y")
      .select(Layout.zValue(col("x"), col("y"), 3).as("z"))
      .as[Long].head()
    assert(ok === 63L)
  }

  test("zOrderFiles: per-file bounding boxes are tight in BOTH dims") {
    // 64x64 grid of points; 16 z-range files => each file should cover a
    // 16x16 tile (bounding-box side 16), not a 64-wide stripe
    val pts = (for { x <- 0 until 64; y <- 0 until 64 }
      yield (x.toLong, y.toLong)).toDF("x", "y")
    val boxes = Layout.zOrderFiles(pts, "x", "y", bits = 6, fileBits = 4)
      .groupBy(col("file_id"))
      .agg((max(col("x")) - min(col("x"))).as("dx"),
        (max(col("y")) - min(col("y"))).as("dy"),
        count(lit(1)).as("n"))
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(boxes.size === 16)
    assert(boxes.forall { case (_, dx, dy, n) =>
      dx === 15L && dy === 15L && n === 256L },
      boxes.toString)
  }

  test("zOrderFiles: pure projection — zero exchanges before the caller's agg") {
    val pts = (0 until 100).map(i => (i.toLong, (i * 7 % 100).toLong))
      .toDF("x", "y")
    val plan = Layout.zOrderFiles(pts, "x", "y", 8, 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("zoneMapPrune: skips files, loses no rows") {
    val pts = Tables.documents(spark, sfDir).select(col("doc_id"),
      (col("doc_id") % 256).as("x"), (col("n_chars") % 256).as("y"))
    val row = Layout.zoneMapPrune(pts, "x", "y", "doc_id",
      bits = 8, fileBits = 4, xLo = 32, xHi = 63, yLo = 100, yHi = 140)
      .collect()(0)
    val (total, scanned) =
      (row.getAs[Long]("files_total"), row.getAs[Long]("files_scanned"))
    assert(scanned < total,
      s"zone maps should skip at least one file ($scanned/$total)")
    // zero-loss: matched rows equal the plain full-scan predicate
    val plain = pts.filter(col("x").between(32, 63) &&
      col("y").between(100, 140))
      .agg(count(lit(1)), sum(col("doc_id"))).collect()(0)
    assert(row.getAs[Long]("rows_matched") === plain.getLong(0))
    assert(row.getAs[Long]("sum_metric") === plain.getLong(1))
    assert(row.getAs[Long]("rows_scanned") >=
      row.getAs[Long]("rows_matched"))
  }
}
