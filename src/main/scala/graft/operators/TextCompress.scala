package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}

/** Compression-ratio quality signal: deflate(level 6) compressed size per
  * document. Highly compressible text is repetitive/templated (boiler-
  * plate, keyword stuffing, generated spam) — the classic corpus-quality
  * gate used alongside [[Reports]]' stopword/length features, and
  * complementary to [[Dedup]]: compression catches WITHIN-doc redundancy
  * that near-dup detection (between docs) never sees.
  *
  * Scale shape: per-row JVM work with NO shuffle; `mapPartitions` reuses
  * ONE `Deflater` per partition (`reset()` between rows — the codec
  * discipline of [[ImageCodec]]; per-row allocation of the native zlib
  * state would dominate at scale). zlib output at a fixed level is
  * deterministic and library-stable (Java's Deflater IS zlib), which is
  * what makes the golden oracle exact.
  */
object TextCompress {

  /** (id, group, raw_bytes, comp_bytes) per document — raw UTF-8 length
    * and deflate(6, zlib-wrapped) compressed length. */
  def docCompression(df: DataFrame, idCol: String, groupCol: String,
      textCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val in: Dataset[(Long, String, String)] = df
      .selectExpr(s"cast($idCol as long)", s"cast($groupCol as string)",
        s"cast($textCol as string)")
      .as[(Long, String, String)]
    in.mapPartitions { it =>
      val d = new java.util.zip.Deflater(6, false)
      val sink = new Array[Byte](64 * 1024)
      val out = it.map { case (id, g, text) =>
        val raw = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        d.reset()
        d.setInput(raw)
        d.finish()
        var n = 0L
        while (!d.finished()) n += d.deflate(sink)
        (id, g, raw.length.toLong, n)
      }
      // NOTE: Deflater holds native zlib state; Spark closes the iterator
      // at task end and the finalizer releases it — acceptable for a
      // bounded 1-per-partition allocation.
      out
    }.toDF(idCol, groupCol, "raw_bytes", "comp_bytes")
  }
}
