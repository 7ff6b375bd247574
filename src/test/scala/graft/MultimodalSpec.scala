package graft

import graft.operators.Multimodal
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
}
