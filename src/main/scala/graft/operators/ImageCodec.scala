package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

/** REAL pure-JVM image codec (`javax.imageio` — ships with the JDK, no
  * external codec libraries): PNG encode and decode with pixel-statistics
  * feature extraction. This replaces the stub on the image path of the
  * multimodal pipeline; [[AudioCodec]] (WAV/PCM) and [[VideoCodec]]
  * (multi-frame GIF) do the same for audio and video — all three
  * modalities decode for real.
  *
  * Verifiability: [[synthPng]] renders pixels from a pure integer formula of
  * (media_id, x, y); PNG is lossless, so a REAL decode must reproduce those
  * exact pixels — the DuckDB twin of q_image_decode recomputes the expected
  * channel sums from the same formula over a generated (x, y) grid, putting
  * the whole encode → bytes → ImageIO decode → feature path under the
  * hash-exact gate. */
object ImageCodec {

  /** Deterministic channel values for pixel (x, y) of image `id` — pure
    * integer arithmetic, mirrored verbatim in SQL. */
  def red(id: Long, x: Int, y: Int): Int = ((id * 31 + x * 7 + y * 13) % 256).toInt
  def green(id: Long, x: Int, y: Int): Int = ((id * 17 + x * 5 + y * 11) % 256).toInt
  def blue(id: Long, x: Int, y: Int): Int = ((id * 23 + x * 3 + y * 19) % 256).toInt

  /** Render the deterministic test image for `id` and encode it as a real
    * PNG byte stream. */
  def synthPng(id: Long, w: Int, h: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y,
          (red(id, x, y) << 16) | (green(id, x, y) << 8) | blue(id, x, y))
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** REAL nearest-neighbor resize: output pixel (x, y) samples source pixel
    * (x·sw div dw, y·sh div dh) — pure integer index arithmetic with no
    * interpolation blending, so the resized raster is SQL-recomputable and
    * the re-encoded PNG stays lossless. (Bilinear would be the production
    * default; nearest is the one whose arithmetic an oracle can replay
    * exactly, and the Spark-side plumbing is identical.) */
  def resizeNearest(bytes: Array[Byte], dw: Int, dh: Int): Array[Byte] = {
    val src = ImageIO.read(new ByteArrayInputStream(bytes))
    require(src != null, "undecodable image payload")
    val out = new BufferedImage(dw, dh, BufferedImage.TYPE_INT_RGB)
    val sw = src.getWidth
    val sh = src.getHeight
    var y = 0
    while (y < dh) {
      var x = 0
      while (x < dw) {
        out.setRGB(x, y, src.getRGB(x * sw / dw, y * sh / dh))
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(out, "png", bos)
    bos.toByteArray
  }

  final case class ImageStats(width: Int, height: Int,
      sum_r: Long, sum_g: Long, sum_b: Long)

  /** REAL decode: parse the PNG byte stream and reduce the pixel raster to
    * exact integer channel sums (deterministic — no float arithmetic). */
  def decodeStats(bytes: Array[Byte]): ImageStats = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    require(img != null, "undecodable image payload")
    var sr = 0L; var sg = 0L; var sb = 0L
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val rgb = img.getRGB(x, y)
        sr += (rgb >> 16) & 0xff
        sg += (rgb >> 8) & 0xff
        sb += rgb & 0xff
        x += 1
      }
      y += 1
    }
    ImageStats(img.getWidth, img.getHeight, sr, sg, sb)
  }
}
