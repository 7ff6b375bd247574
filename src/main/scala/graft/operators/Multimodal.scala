package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns for training-data pipelines: image/audio/video as
  * opaque `binary` columns + typed metadata struct, with decode /
  * feature-extract / resize / frame-sample stages.
  *
  * ALL THREE modality decode paths are REAL pure-JVM codecs, each
  * oracle-gated end-to-end: [[ImageCodec]] (`javax.imageio` PNG,
  * q_image_decode), [[AudioCodec]] (`javax.sound.sampled` WAV/PCM,
  * q_audio_decode), and [[VideoCodec]] (`javax.imageio` multi-frame
  * animated GIF, q_video_decode). `FakeCodec` below is no longer a
  * modality stub — it survives only as the generic bytes→features
  * fallback for [[extractFeatures]]/[[sampleFrames]] over opaque
  * payloads. Everything
  * Spark-side is REAL and load-bearing at 100 TB: the schema, the
  * `mapPartitions` batch shape (one codec instance per partition, streamed
  * row iterator — the Scala analogue of `mapInPandas` batches), partition
  * sizing, and the explode-based frame sampling.
  */
object Multimodal {

  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType),
    StructField("sample_rate", IntegerType)))

  /** Canonical multimodal row: binary payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("modality", StringType), // image | audio | video
    StructField("content", BinaryType),
    StructField("meta", mediaMetaSchema)))

  case class MediaMeta(format: String, width: Int, height: Int,
      duration_ms: Long, sample_rate: Int)
  case class MediaRow(media_id: Long, modality: String,
      content: Array[Byte], meta: MediaMeta)
  case class DecodedFeatures(media_id: Long, modality: String,
      feature: Array[Float], n_bytes: Long)
  case class Frame(media_id: Long, frame_index: Int, frame_ms: Long,
      content: Array[Byte])

  /** ======== GENERIC BYTE-FEATURE FALLBACK =====================
    * Deterministic bytes→float[] reduction for OPAQUE payloads (formats
    * with no JVM codec — mp4, webm, ...). Not a modality stub anymore:
    * png/wav/gif decode for real above; this is the fallback feature
    * kernel [[extractFeatures]] applies to anything else, with
    * deterministic output so tests are stable. Swap for an ffmpeg binding
    * in production; nothing else changes. */
  object FakeCodec {
    val featureDim = 16
    def decodeToFeatures(bytes: Array[Byte]): Array[Float] = {
      val out = new Array[Float](featureDim)
      var i = 0
      while (i < bytes.length) {
        val b = bytes(i) & 0xff
        out(i % featureDim) += (b - 128) / 128.0f
        i += 1
      }
      out
    }
    def frameCount(meta: MediaMeta): Int =
      math.max(1, (meta.duration_ms / 1000L).toInt)
  }
  /** ======== END STUB ======================================== */

  /** Synthesize a media table from documents (text bytes as payload) —
    * harness for the plumbing; real pipelines read binary parquet. */
  def mediaFromDocuments(spark: SparkSession, docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("modality"),
      encode(col("text"), "UTF-8").as("content"),
      struct(
        lit("fake").as("format"),
        (col("doc_id") % 640 + 1).cast("int").as("width"),
        (col("doc_id") % 480 + 1).cast("int").as("height"),
        (col("n_chars") * 10).as("duration_ms"),
        lit(16000).as("sample_rate")).as("meta"))

  /** Media table with REAL PNG payloads on the image rows: image-modality
    * rows carry an actual PNG ([[ImageCodec.synthPng]], deterministic pixels
    * from media_id) with meta rewritten to the true dimensions; audio/video
    * rows keep the opaque stub payload. mapPartitions — encode runs
    * executor-side, streaming. */
  def mediaWithRealImages(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    mediaFromDocuments(spark, docs).as[MediaRow].mapPartitions { rows =>
      rows.map { r =>
        if (r.modality == "image") {
          val w = (r.media_id % 16 + 8).toInt
          val h = (r.media_id % 12 + 8).toInt
          r.copy(content = ImageCodec.synthPng(r.media_id, w, h),
            meta = r.meta.copy(format = "png", width = w, height = h))
        } else r
      }
    }.toDF()
  }

  /** Media table with REAL WAV payloads on the audio rows: audio-modality
    * rows carry an actual RIFF/WAV stream ([[AudioCodec.synthWav]],
    * deterministic 16-bit PCM from media_id) with meta rewritten to the true
    * duration; image/video rows keep the opaque payload. Same
    * mapPartitions batch shape as [[mediaWithRealImages]]. */
  def mediaWithRealAudio(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    mediaFromDocuments(spark, docs).as[MediaRow].mapPartitions { rows =>
      rows.map { r =>
        if (r.modality == "audio") {
          val n = (r.media_id % 400 + 100).toInt
          val rate = 16000
          r.copy(content = AudioCodec.synthWav(r.media_id, n, rate),
            meta = r.meta.copy(format = "wav",
              duration_ms = n * 1000L / rate, sample_rate = rate))
        } else r
      }
    }.toDF()
  }

  /** Media table with REAL multi-frame GIF payloads on the video rows:
    * video-modality rows carry an actual animated GIF
    * ([[VideoCodec.synthGif]], deterministic indexed-grayscale frames from
    * media_id) with meta rewritten to the true dimensions; image/audio rows
    * keep the opaque stub payload. Same mapPartitions batch shape as
    * [[mediaWithRealImages]]. */
  def mediaWithRealVideo(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    mediaFromDocuments(spark, docs).as[MediaRow].mapPartitions { rows =>
      rows.map { r =>
        if (r.modality == "video") {
          val nf = (r.media_id % 5 + 2).toInt
          val w = (r.media_id % 12 + 6).toInt
          val h = (r.media_id % 10 + 6).toInt
          r.copy(content = VideoCodec.synthGif(r.media_id, nf, w, h),
            meta = r.meta.copy(format = "gif", width = w, height = h,
              duration_ms = nf * 100L))
        } else r
      }
    }.toDF()
  }

  case class VideoFrameRow(media_id: Long, frame_index: Int, width: Int,
      height: Int, sum_gray: Long)

  /** REAL video decode over the binary column: GIF parse, one output row
    * per frame with exact gray sums, per-partition streamed. Non-video
    * rows are filtered before decode. */
  def decodeVideo(spark: SparkSession, media: DataFrame): Dataset[VideoFrameRow] = {
    import spark.implicits._
    media.filter(col("modality") === "video").as[MediaRow].flatMap { r =>
      VideoCodec.decodeStats(r.content).map(fs =>
        VideoFrameRow(r.media_id, fs.frame_index, fs.width, fs.height,
          fs.sum_gray))
    }
  }

  case class ImageStatsRow(media_id: Long, width: Int, height: Int,
      sum_r: Long, sum_g: Long, sum_b: Long)

  /** REAL image decode over the binary column: ImageIO parse + exact pixel
    * channel sums, per-partition streamed (same batch shape as
    * [[extractFeatures]]). Non-image rows are filtered before decode. */
  def decodeImages(spark: SparkSession, media: DataFrame): Dataset[ImageStatsRow] = {
    import spark.implicits._
    media.filter(col("modality") === "image").as[MediaRow].mapPartitions { rows =>
      rows.map { r =>
        val s = ImageCodec.decodeStats(r.content)
        ImageStatsRow(r.media_id, s.width, s.height, s.sum_r, s.sum_g, s.sum_b)
      }
    }
  }

  case class AudioStatsRow(media_id: Long, n_samples: Long,
      sample_rate: Int, sum_amp: Long, sum_abs: Long, peak: Long)

  /** REAL audio decode over the binary column: WAV parse + exact PCM sample
    * statistics, per-partition streamed. Non-audio rows are filtered before
    * decode. */
  def decodeAudio(spark: SparkSession, media: DataFrame): Dataset[AudioStatsRow] = {
    import spark.implicits._
    media.filter(col("modality") === "audio").as[MediaRow].mapPartitions { rows =>
      rows.map { r =>
        val s = AudioCodec.decodeStats(r.content)
        AudioStatsRow(r.media_id, s.n_samples, s.sample_rate,
          s.sum_amp, s.sum_abs, s.peak)
      }
    }
  }

  case class AudioFrameRow(media_id: Long, frame_id: Long, n: Long,
      sum_abs: Long, zcr: Long, peak: Long)

  /** Per-frame audio features (energy + zero-crossing rate — the VAD /
    * silence-trim front-end): REAL WAV decode, then [[AudioCodec
    * .decodeFrames]]'s exact integer per-window reduction. flatMap shape:
    * one input clip fans out to its frames executor-side; no sample array
    * ever crosses an exchange (frames are already reduced). */
  def audioFrames(spark: SparkSession, media: DataFrame,
      frameLen: Int = 160): Dataset[AudioFrameRow] = {
    import spark.implicits._
    media.filter(col("modality") === "audio").as[MediaRow].flatMap { r =>
      AudioCodec.decodeFrames(r.content, frameLen).map(f =>
        AudioFrameRow(r.media_id, f.frame_id, f.n, f.sum_abs, f.zcr, f.peak))
    }
  }

  /** VAD-style ACTIVE SEGMENTS over [[audioFrames]] output: a frame is
    * active iff its energy clears a per-sample threshold
    * (`sum_abs ≥ thrPerSample · n` — pure integers), and maximal runs of
    * consecutive active frames become segments (the classic
    * gaps-and-islands grouping: frame_id − row_number is constant within
    * a run). Per segment: bounds, length, and total energy — the
    * segment-selection step a speech pipeline runs before any expensive
    * model touches audio.
    *
    * Scale shape: input rows are already per-frame REDUCTIONS (tiny);
    * the island window and the segment agg both partition by clip, so
    * no global sort — per-clip state only. */
  def vadSegments(frames: DataFrame, thrPerSample: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("media_id")).orderBy(col("frame_id"))
    frames.filter(col("sum_abs") >= lit(thrPerSample) * col("n"))
      .withColumn("__grp", col("frame_id") - row_number().over(w))
      .groupBy(col("media_id"), col("__grp"))
      .agg(min(col("frame_id")).as("start_frame"),
        max(col("frame_id")).as("end_frame"),
        count(lit(1)).as("n_frames"),
        sum(col("sum_abs")).as("energy"))
      .withColumn("seg_id", row_number().over(
        Window.partitionBy(col("media_id")).orderBy(col("start_frame")))
        .cast("long"))
      .select(col("media_id"), col("seg_id"), col("start_frame"),
        col("end_frame"), col("n_frames"), col("energy"))
  }

  /** Feature extraction over binary content via mapPartitions: codec state
    * initialized once per partition, rows streamed (never materialized as a
    * list) — the batch shape that scales. */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[DecodedFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      // per-partition init point (real codec would allocate here, once)
      rows.map { r =>
        DecodedFeatures(r.media_id, r.modality,
          FakeCodec.decodeToFeatures(r.content), r.content.length.toLong)
      }
    }
  }

  /** REAL frame sampling over real video payloads: decode the GIF, keep
    * every `stride`-th frame, and re-encode each kept frame as a STANDALONE
    * single-frame GIF — a sampling stage's output must itself be valid,
    * decodable media, not a byte slice. Explosion happens executor-side in
    * the same flatMap batch shape; frame_ms comes from the synth cadence
    * (100 ms/frame). Oracle-gated end-to-end by q_frame_sample (the
    * re-encoded payloads are DECODED AGAIN and their sums compared to the
    * analytic twin). */
  def sampleFramesReal(spark: SparkSession, media: DataFrame,
      stride: Int): Dataset[Frame] = {
    import spark.implicits._
    media.filter(col("modality") === "video").as[MediaRow].flatMap { r =>
      VideoCodec.decodeFrames(r.content).zipWithIndex
        .filter(_._2 % stride == 0)
        .map { case (img, f) =>
          Frame(r.media_id, f, f * 100L, VideoCodec.encodeFrame(img))
        }
    }
  }

  /** Frame sampling: one row per sampled frame (video), `stride`-th frames
    * only. Row explosion happens executor-side; the binary payload is
    * sliced per frame (stub: byte-range slices). */
  def sampleFrames(spark: SparkSession, media: DataFrame,
      stride: Int): Dataset[Frame] = {
    import spark.implicits._
    media.filter(col("modality") === "video").as[MediaRow]
      .flatMap { r =>
        val n = FakeCodec.frameCount(r.meta)
        (0 until n by stride).map { f =>
          val from = (r.content.length.toLong * f / n).toInt
          val to = (r.content.length.toLong * (f + 1) / n).toInt
          Frame(r.media_id, f, f * 1000L, r.content.slice(from, to))
        }
      }
  }

  /** REAL image resize over real PNG payloads: decode, aspect-preserving
    * cap of the longest side to `maxSide` (pure INTEGER target-dimension
    * arithmetic: dw = w·maxSide div max(w,h), min 1 — an oracle can replay
    * it), nearest-neighbor resample ([[ImageCodec.resizeNearest]]),
    * re-encode. Images already inside the cap pass through untouched.
    * Oracle-gated end-to-end by q_image_resize (the resized payloads are
    * decoded again and their channel sums compared to the analytic twin
    * over the sampled source grid). */
  def resizeImagesReal(spark: SparkSession, media: DataFrame,
      maxSide: Int): DataFrame = {
    import spark.implicits._
    media.filter(col("modality") === "image").as[MediaRow].mapPartitions { rows =>
      rows.map { r =>
        val w = r.meta.width
        val h = r.meta.height
        val m = math.max(w, h)
        if (m <= maxSide) r
        else {
          val dw = math.max(1, w * maxSide / m)
          val dh = math.max(1, h * maxSide / m)
          r.copy(content = ImageCodec.resizeNearest(r.content, dw, dh),
            meta = r.meta.copy(width = dw, height = dh))
        }
      }
    }.toDF()
  }

  /** [[resizeImagesReal]] with the BILINEAR kernel
    * ([[ImageCodec.resizeBilinear]]) — the production-default resampler.
    * Same aspect-preserving integer target-dimension arithmetic and the
    * same mapPartitions batch shape; only the per-pixel kernel differs.
    * Interpolation is not SQL-replayable, so this path is golden-gated
    * (MultimodalSpec) rather than oracle-gated. */
  def resizeImagesBilinear(spark: SparkSession, media: DataFrame,
      maxSide: Int): DataFrame = {
    import spark.implicits._
    media.filter(col("modality") === "image").as[MediaRow].mapPartitions { rows =>
      rows.map { r =>
        val w = r.meta.width
        val h = r.meta.height
        val m = math.max(w, h)
        if (m <= maxSide) r
        else {
          val dw = math.max(1, w * maxSide / m)
          val dh = math.max(1, h * maxSide / m)
          r.copy(content = ImageCodec.resizeBilinear(r.content, dw, dh),
            meta = r.meta.copy(width = dw, height = dh))
        }
      }
    }.toDF()
  }

  /** Resize: metadata-level transform (stub keeps bytes, rewrites meta —
    * a real kernel would transcode in the same mapPartitions shape). */
  def resize(media: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    val scale = least(
      lit(maxW).cast("double") / col("meta.width"),
      lit(maxH).cast("double") / col("meta.height"),
      lit(1.0))
    media.withColumn("meta", struct(
      col("meta.format").as("format"),
      floor(col("meta.width") * scale).cast("int").as("width"),
      floor(col("meta.height") * scale).cast("int").as("height"),
      col("meta.duration_ms").as("duration_ms"),
      col("meta.sample_rate").as("sample_rate")))
  }

  case class DHashRow(media_id: Long, h1: Long, h2: Long)

  /** Perceptual dHash per image ([[ImageCodec.dhash]]) — REAL decode,
    * map-shape, two positive 32-bit halves per image. */
  def imageDHashes(spark: SparkSession, media: DataFrame)
      : Dataset[DHashRow] = {
    import spark.implicits._
    media.filter(col("modality") === "image").as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          val d = ImageCodec.dhash(r.content)
          DHashRow(r.media_id, d.h1, d.h2)
        }
      }
  }

  /** AUDIO FINGERPRINT (energy-delta hash, the dHash idea over TIME —
    * an echoprint-lite): REAL WAV decode to `frameLen`-sample frame
    * energies ([[audioFrames]]), then 64 bits recording whether each
    * of frames 1..64 is louder than its predecessor, split into two
    * positive 32-bit halves. Clips with fewer than 65 frames are
    * excluded (a fingerprint must cover the full bit span to be
    * comparable). Identical samples ⇒ identical halves; small edits
    * flip few bits — the property [[phashDupPairs]] exploits, making
    * the SAME pigeonhole pairing serve images AND audio. */
  def audioFingerprints(spark: SparkSession, media: DataFrame,
      frameLen: Int = 4): DataFrame = {
    val frames = audioFrames(spark, media, frameLen).toDF()
      .filter(col("frame_id") <= 64)
    val arrs = frames.groupBy(col("media_id"))
      .agg(sort_array(collect_list(
        struct(col("frame_id"), col("sum_abs")))).as("es"))
      .filter(size(col("es")) === 65)
    def e(i: Int) = element_at(col("es"), i)("sum_abs")
    val h1 = (0 until 32).map(i =>
      when(e(i + 2) > e(i + 1), lit(1L << i)).otherwise(lit(0L)))
      .reduce(_ + _)
    val h2 = (32 until 64).map(i =>
      when(e(i + 2) > e(i + 1), lit(1L << (i - 32))).otherwise(lit(0L)))
      .reduce(_ + _)
    arrs.select(col("media_id"), h1.as("h1"), h2.as("h2"))
  }

  /** IMAGE NEAR-DUP PAIRS by perceptual-hash Hamming distance — the
    * visual-dedup step of multimodal curation, blocked with the
    * [[graft.functions.SimHash]] pigeonhole: the 64 dHash bits split
    * into four 16-bit blocks, and any pair within Hamming distance
    * ≤ 3 < 4 must agree on at least one whole block, so candidates
    * come from four equi-joins (via one block explode), never an
    * all-pairs scan. Distance is `bit_count(xor)` on the halves —
    * exact integer ops with identical semantics cross-engine.
    * Output: (id_a, id_b, hamming). */
  def phashDupPairs(hashes: DataFrame, maxDist: Int = 3): DataFrame = {
    require(maxDist < 4, "4-block pigeonhole holds only for dist < 4")
    val blk = hashes.select(col("media_id"), col("h1"), col("h2"),
      explode(array(
        struct(lit(0).as("bi"), (col("h1") % 65536L).as("bv")),
        struct(lit(1).as("bi"), expr("h1 div 65536").as("bv")),
        struct(lit(2).as("bi"), (col("h2") % 65536L).as("bv")),
        struct(lit(3).as("bi"), expr("h2 div 65536").as("bv"))))
        .as("blk"))
      .select(col("media_id"), col("h1"), col("h2"),
        col("blk.bi").as("bi"), col("blk.bv").as("bv"))
    val a = blk.select(col("bi"), col("bv"), col("media_id").as("id_a"),
      col("h1").as("h1a"), col("h2").as("h2a"))
    val b = blk.select(col("bi"), col("bv"), col("media_id").as("id_b"),
      col("h1").as("h1b"), col("h2").as("h2b"))
    a.join(b, Seq("bi", "bv")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("h1a"), col("h2a"),
        col("h1b"), col("h2b"))
      .distinct()
      .withColumn("hamming",
        (bit_count(col("h1a").bitwiseXOR(col("h1b"))) +
          bit_count(col("h2a").bitwiseXOR(col("h2b")))).cast("long"))
      .filter(col("hamming") <= maxDist)
      .select(col("id_a"), col("id_b"), col("hamming"))
      .orderBy(col("id_a"), col("id_b"))
  }
}
