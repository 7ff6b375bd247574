package graft

import graft.operators.{ImageCodec, Multimodal}
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  lazy val media = Multimodal.mediaFromDocuments(spark,
    Tables.documents(spark, sfDir))

  test("media table has the canonical multimodal schema") {
    // names + types (nullability differs: lit() columns are non-nullable)
    assert(media.schema.map(f => (f.name, f.dataType.simpleString)) ===
      Multimodal.mediaSchema.map(f => (f.name, f.dataType.simpleString)))
    assert(media.count() === 500)
  }

  test("extractFeatures is deterministic and preserves rows") {
    val f1 = Multimodal.extractFeatures(spark, media)
    assert(f1.count() === 500)
    val v1 = f1.filter(col("media_id") === 7).head.feature.toSeq
    val v2 = Multimodal.extractFeatures(spark, media)
      .filter(col("media_id") === 7).head.feature.toSeq
    assert(v1 === v2)
    assert(v1.length === Multimodal.FakeCodec.featureDim)
    assert(v1.exists(_ != 0.0f))
  }

  test("sampleFrames explodes videos by stride, slices payload bytes") {
    val frames = Multimodal.sampleFrames(spark, media, stride = 2)
    val perVideo = frames.groupByKey(_.media_id).count().collect().toMap
    assert(perVideo.nonEmpty)
    val one = frames.filter(col("media_id") === perVideo.keys.head).collect()
    assert(one.map(_.frame_index).distinct.length === one.length)
    assert(one.forall(f => f.frame_ms == f.frame_index * 1000L))
  }

  test("ImageCodec: PNG encode -> decode round-trips the exact pixel formula") {
    import graft.operators.ImageCodec
    Seq((0L, 8, 8), (123L, 23, 19), (99999L, 16, 12)).foreach { case (id, w, h) =>
      val stats = ImageCodec.decodeStats(ImageCodec.synthPng(id, w, h))
      val grid = for { y <- 0 until h; x <- 0 until w } yield (x, y)
      assert(stats.width === w && stats.height === h)
      assert(stats.sum_r === grid.map { case (x, y) => ImageCodec.red(id, x, y).toLong }.sum)
      assert(stats.sum_g === grid.map { case (x, y) => ImageCodec.green(id, x, y).toLong }.sum)
      assert(stats.sum_b === grid.map { case (x, y) => ImageCodec.blue(id, x, y).toLong }.sum)
    }
  }

  test("decodeImages: real PNG payloads decode distributed, one row per image") {
    val withImages = Multimodal.mediaWithRealImages(spark,
      Tables.documents(spark, sfDir))
    val stats = Multimodal.decodeImages(spark, withImages)
    val nImages = media.filter(col("modality") === "image").count()
    assert(stats.count() === nImages)
    // PNG payloads are real: magic bytes present on every image row
    val magic = withImages.filter(col("modality") === "image")
      .select(col("content")).as[Array[Byte]].head
    assert(magic.take(4).toSeq === Seq[Byte](0x89.toByte, 'P', 'N', 'G'))
    // decoded dims come from the PARSED payload and match the meta rewrite
    val r = stats.filter(col("media_id") === 3).head
    assert(r.width === (3 % 16 + 8) && r.height === (3 % 12 + 8))
  }

  test("AudioCodec: WAV encode -> decode round-trips the exact PCM formula") {
    import graft.operators.AudioCodec
    Seq((0L, 100), (1L, 257), (99999L, 499)).foreach { case (id, n) =>
      val stats = AudioCodec.decodeStats(AudioCodec.synthWav(id, n, 16000))
      val samples = (0 until n).map(i => AudioCodec.sample(id, i).toLong)
      assert(stats.n_samples === n.toLong)
      assert(stats.sample_rate === 16000)
      assert(stats.sum_amp === samples.sum)
      assert(stats.sum_abs === samples.map(math.abs).sum)
      assert(stats.peak === samples.map(math.abs).max)
      // the formula actually exercises the signed range
      assert(samples.min < 0 && samples.max > 0)
    }
  }

  test("decodeAudio: real WAV payloads decode distributed, one row per clip") {
    val withAudio = Multimodal.mediaWithRealAudio(spark,
      Tables.documents(spark, sfDir))
    val stats = Multimodal.decodeAudio(spark, withAudio)
    val nAudio = media.filter(col("modality") === "audio").count()
    assert(stats.count() === nAudio)
    // WAV payloads are real: RIFF magic bytes present on every audio row
    val magic = withAudio.filter(col("modality") === "audio")
      .select(col("content")).as[Array[Byte]].head
    assert(magic.take(4).map(_.toChar).mkString === "RIFF")
    assert(magic.slice(8, 12).map(_.toChar).mkString === "WAVE")
    // decoded length comes from the PARSED payload and matches the synth size
    val r = stats.filter(col("media_id") === 1).head
    assert(r.n_samples === (1 % 400 + 100).toLong)
  }

  test("VideoCodec: GIF encode -> decode round-trips the exact frame formula") {
    import graft.operators.VideoCodec
    Seq((0L, 2, 6, 6), (5L, 4, 17, 9), (99999L, 6, 16, 12)).foreach {
      case (id, nf, w, h) =>
        val stats = VideoCodec.decodeStats(VideoCodec.synthGif(id, nf, w, h))
        assert(stats.length === nf)
        stats.foreach { fs =>
          assert(fs.width === w && fs.height === h)
          val expected = (for (y <- 0 until h; x <- 0 until w)
            yield VideoCodec.gray(id, fs.frame_index, x, y).toLong).sum
          assert(fs.sum_gray === expected)
        }
    }
  }

  test("decodeVideo: real GIF payloads decode distributed, one row per frame") {
    val withVideo = Multimodal.mediaWithRealVideo(spark,
      Tables.documents(spark, sfDir))
    val frames = Multimodal.decodeVideo(spark, withVideo)
    // GIF payloads are real: magic bytes present on every video row
    val magic = withVideo.filter(col("modality") === "video")
      .select(col("content")).as[Array[Byte]].head
    assert(magic.take(6).map(_.toChar).mkString === "GIF89a")
    // per-clip frame count comes from the PARSED payload
    val r = frames.filter(col("media_id") === 2).collect()
    assert(r.length === (2 % 5 + 2))
    assert(r.map(_.frame_index).sorted.toSeq === (0 until r.length))
  }

  test("bilinear resize matches the committed golden") {
    // generated once by graft.tools.GenBilinearGolden and committed —
    // interpolation arithmetic is not SQL-twin-replayable, so the recorded
    // channel sums are the correctness pin for this kernel
    val golden = Seq(
      (3L, 24, 15, 8, 8, 5, 4948L, 5884L, 4852L),
      (6L, 30, 18, 12, 12, 7, 10827L, 10430L, 11829L),
      (9L, 17, 17, 5, 5, 5, 3449L, 2990L, 3175L),
      (12L, 40, 10, 16, 16, 4, 8544L, 7488L, 9104L),
      (33L, 9, 27, 6, 2, 6, 1331L, 1507L, 1467L))
    golden.foreach { case (id, sw, sh, maxSide, ew, eh, er, eg, eb) =>
      val png = ImageCodec.synthPng(id, sw, sh)
      val m = math.max(sw, sh)
      val out = ImageCodec.resizeBilinear(png,
        math.max(1, sw * maxSide / m), math.max(1, sh * maxSide / m))
      val s = ImageCodec.decodeStats(out)
      assert((s.width, s.height, s.sum_r, s.sum_g, s.sum_b)
        === ((ew, eh, er, eg, eb)), s"golden mismatch for id=$id")
    }
  }

  test("bilinear resize invariants: identity is exact, constant stays constant") {
    // identity resize: every source coordinate lands exactly on a texel
    // center (fx = fy = 0) → output raster is bit-identical to the source
    val png = ImageCodec.synthPng(7L, 19, 13)
    assert(ImageCodec.decodeStats(ImageCodec.resizeBilinear(png, 19, 13))
      === ImageCodec.decodeStats(png))
    // constant-color image: any blend of equal values is that value
    val img = new java.awt.image.BufferedImage(20, 20,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until 20).foreach(y => (0 until 20).foreach(x =>
      img.setRGB(x, y, (37 << 16) | (141 << 8) | 200)))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val s = ImageCodec.decodeStats(ImageCodec.resizeBilinear(bos.toByteArray, 7, 3))
    assert((s.width, s.height) === ((7, 3)))
    assert((s.sum_r, s.sum_g, s.sum_b) === ((37L * 21, 141L * 21, 200L * 21)))
  }

  test("resizeImagesBilinear: distributed path caps dims, payloads re-decode") {
    val withImages = Multimodal.mediaWithRealImages(spark,
      Tables.documents(spark, sfDir))
    val resized = Multimodal.resizeImagesBilinear(spark, withImages, 10)
    val rows = resized.select(col("media_id"), col("content"),
        col("meta.width"), col("meta.height"))
      .as[(Long, Array[Byte], Int, Int)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, bytes, w, h) =>
      assert(w <= 10 && h <= 10, s"media $id not capped: ${w}x$h")
      val s = ImageCodec.decodeStats(bytes) // output is valid, decodable media
      assert((s.width, s.height) === ((w, h)), s"meta/raster mismatch for $id")
    }
  }

  test("resize caps dimensions preserving aspect ratio") {
    val resized = Multimodal.resize(media, 100, 100)
    val over = resized.filter(col("meta.width") > 100 ||
      col("meta.height") > 100).count()
    assert(over === 0)
    // a row already under the cap is untouched
    val small = media.filter(col("meta.width") <= 100 &&
      col("meta.height") <= 100).select("media_id").limit(1)
    if (small.count() > 0) {
      val id = small.head.getLong(0)
      val before = media.filter(col("media_id") === id)
        .select("meta.width").head.getInt(0)
      val after = resized.filter(col("media_id") === id)
        .select("meta.width").head.getInt(0)
      assert(before === after)
    }
  }

  test("dhash: halves are 32-bit positive, identical bytes hash equal") {
    val png = ImageCodec.synthPng(42L, 14, 10)
    val d1 = ImageCodec.dhash(png)
    val d2 = ImageCodec.dhash(ImageCodec.synthPng(42L, 14, 10))
    assert(d1 === d2)
    assert(d1.h1 >= 0L && d1.h1 < (1L << 32))
    assert(d1.h2 >= 0L && d1.h2 < (1L << 32))
    // a different image disagrees somewhere (formula varies with id)
    val d3 = ImageCodec.dhash(ImageCodec.synthPng(43L, 14, 10))
    assert(d1 !== d3)
  }

  test("phashDupPairs finds exactly the identical-hash plant at dist 0") {
    val h = Seq(
      (1L, 0x12345678L, 0x0abcdef0L),
      (2L, 0x12345678L, 0x0abcdef0L), // identical to 1
      (3L, 0x12345678L, 0x0abcdeffL), // 4 bits away from 1 in block 2
      (4L, 0x0f0f0f0fL, 0x70f0f0f0L)) // far from everything
      .toDF("media_id", "h1", "h2")
    val out = Multimodal.phashDupPairs(h, maxDist = 3)
      .as[(Long, Long, Long)].collect().toSeq
    assert(out === Seq((1L, 2L, 0L)))
  }
}
