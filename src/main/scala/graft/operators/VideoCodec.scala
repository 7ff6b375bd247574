package graft.operators

import java.awt.image.{BufferedImage, IndexColorModel}
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.{IIOImage, ImageIO}

/** REAL pure-JVM video codec: multi-frame animated GIF via `javax.imageio`
  * (ships with the JDK — the GIF writer supports frame sequences). This
  * replaces the LAST stub in the multimodal pipeline: with [[ImageCodec]]
  * (PNG) and [[AudioCodec]] (WAV/PCM), all three modalities now decode for
  * real.
  *
  * Losslessness argument: frames are rendered as 8-bit INDEXED images over
  * an identity grayscale palette (entry v = rgb(v,v,v)), and GIF stores
  * indexed pixels exactly — no quantization can occur because the source
  * image already lives in the palette. A REAL decode must therefore
  * reproduce the exact per-frame sample values, so the DuckDB twin of
  * q_video_decode recomputes the expected per-frame gray sums analytically
  * from the same integer formula over a generated (frame, x, y) grid. */
object VideoCodec {

  /** Deterministic gray value of pixel (x, y) in frame `f` of clip `id` —
    * pure integer arithmetic, mirrored verbatim in SQL. */
  def gray(id: Long, f: Int, x: Int, y: Int): Int =
    ((id * 31L + f * 47L + x * 7L + y * 13L) % 256L).toInt

  /** Identity grayscale palette: index v maps to rgb(v, v, v). */
  private def grayPalette: IndexColorModel = {
    val ramp = Array.tabulate[Byte](256)(i => i.toByte)
    new IndexColorModel(8, 256, ramp, ramp, ramp)
  }

  /** Render the deterministic test clip for `id` and encode it as a real
    * multi-frame GIF byte stream. */
  def synthGif(id: Long, nFrames: Int, w: Int, h: Int): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    var f = 0
    while (f < nFrames) {
      val img = new BufferedImage(w, h,
        BufferedImage.TYPE_BYTE_INDEXED, grayPalette)
      val raster = img.getRaster
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          raster.setSample(x, y, 0, gray(id, f, x, y))
          x += 1
        }
        y += 1
      }
      writer.writeToSequence(new IIOImage(img, null, null), null)
      f += 1
    }
    writer.endWriteSequence()
    ios.close()
    writer.dispose()
    bos.toByteArray
  }

  /** Decode to raw frame images (for re-encode paths like frame
    * sampling). */
  def decodeFrames(bytes: Array[Byte]): Seq[BufferedImage] = {
    val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
    val reader = ImageIO.getImageReadersByFormatName("gif").next()
    reader.setInput(iis, false, true)
    val n = reader.getNumImages(true)
    val out = (0 until n).map(reader.read)
    reader.dispose()
    iis.close()
    out
  }

  /** Re-encode ONE frame as a standalone single-frame GIF — the payload a
    * frame-sampling stage emits must itself be valid, decodable media. The
    * frame is already indexed, so the re-encode is lossless too. */
  def encodeFrame(img: BufferedImage): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "gif", bos)
    bos.toByteArray
  }

  final case class FrameStats(frame_index: Int, width: Int, height: Int,
      sum_gray: Long)

  /** REAL decode: parse the GIF stream frame by frame and reduce each
    * frame's raster to an exact integer gray sum (the palette is an
    * identity ramp, so the red channel IS the stored sample). */
  def decodeStats(bytes: Array[Byte]): Seq[FrameStats] = {
    val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
    val reader = ImageIO.getImageReadersByFormatName("gif").next()
    reader.setInput(iis, false, true)
    val n = reader.getNumImages(true)
    val out = (0 until n).map { f =>
      val img = reader.read(f)
      var s = 0L
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) {
          s += (img.getRGB(x, y) >> 16) & 0xff
          x += 1
        }
        y += 1
      }
      FrameStats(f, img.getWidth, img.getHeight, s)
    }
    reader.dispose()
    iis.close()
    out
  }
}
