package graft.operators

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

/** REAL pure-JVM audio codec (`javax.sound.sampled` — ships with the JDK, no
  * external codec libraries): WAV/PCM encode and decode with exact
  * sample-statistics feature extraction. This replaces the stub on the AUDIO
  * path of the multimodal pipeline, the same move [[ImageCodec]] made for
  * images and [[VideoCodec]] for video (multi-frame GIF) — all three
  * modalities decode for real.
  *
  * Verifiability: [[synthWav]] renders 16-bit PCM samples from a pure integer
  * formula of (media_id, i); PCM-in-WAV is lossless, so a REAL decode must
  * reproduce those exact samples — the DuckDB twin of q_audio_decode
  * recomputes the expected amplitude sums from the same formula over a
  * generated sample-index range, putting the whole encode → RIFF bytes →
  * AudioSystem decode → feature path under the hash-exact gate.
  *
  * Reference shape: the multimodal ingestion surface (opaque payload +
  * typed metadata) of the reference's media handling; see SURVEY.md §2's
  * multimodal rows. */
object AudioCodec {

  /** Deterministic 16-bit signed sample i of clip `id` — pure integer
    * arithmetic, mirrored verbatim in SQL. Operands are non-negative so
    * Scala `%` and DuckDB `%` agree. Range: [-32768, 32767]. */
  def sample(id: Long, i: Int): Int =
    ((id * 31L + i.toLong * 7919L) % 65536L - 32768L).toInt

  /** Render the deterministic test clip for `id` (mono, 16-bit PCM,
    * little-endian) and encode it as a real WAV byte stream. */
  def synthWav(id: Long, nSamples: Int, sampleRate: Int): Array[Byte] = {
    val pcm = new Array[Byte](nSamples * 2)
    var i = 0
    while (i < nSamples) {
      val s = sample(id, i)
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
      sampleRate.toFloat, 16, 1, 2, sampleRate.toFloat, false)
    val ais = new AudioInputStream(
      new ByteArrayInputStream(pcm), fmt, nSamples.toLong)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  final case class AudioStats(n_samples: Long, sample_rate: Int,
      sum_amp: Long, sum_abs: Long, peak: Long)

  final case class AudioFrame(frame_id: Long, n: Long, sum_abs: Long,
      zcr: Long, peak: Long)

  /** REAL decode to PER-FRAME features — the energy + zero-crossing-rate
    * front-end every speech/audio pipeline runs before anything heavier
    * (VAD, silence trimming, segment selection). Frames are consecutive
    * non-overlapping `frameLen`-sample windows (the trailing partial frame
    * is kept with its true length). Exact integer semantics, mirrored
    * analytically by the q_audio_frames twin:
    *  - sum_abs / peak over the frame's samples;
    *  - zcr = count of ADJACENT-sample sign-bit changes WITHIN the frame
    *    ((prev < 0) ≠ (cur < 0); frame boundaries don't carry over). */
  def decodeFrames(bytes: Array[Byte], frameLen: Int): Seq[AudioFrame] = {
    require(frameLen >= 1)
    val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
    val fmt = ais.getFormat
    require(fmt.getEncoding == AudioFormat.Encoding.PCM_SIGNED &&
      fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1,
      s"unsupported audio format: $fmt")
    val data = ais.readAllBytes()
    ais.close()
    val bigEndian = fmt.isBigEndian
    val out = scala.collection.mutable.ArrayBuffer.empty[AudioFrame]
    var i = 0
    var inFrame = 0
    var sabs = 0L; var zcr = 0L; var peak = 0L
    var prevNeg = false
    while (i + 1 < data.length) {
      val lo = if (bigEndian) data(i + 1) else data(i)
      val hi = if (bigEndian) data(i) else data(i + 1)
      val s = (hi.toInt << 8) | (lo & 0xff)
      val neg = s < 0
      if (inFrame > 0 && neg != prevNeg) zcr += 1
      prevNeg = neg
      val a = math.abs(s.toLong)
      sabs += a
      if (a > peak) peak = a
      inFrame += 1
      if (inFrame == frameLen) {
        out += AudioFrame(out.size.toLong, inFrame.toLong, sabs, zcr, peak)
        inFrame = 0; sabs = 0L; zcr = 0L; peak = 0L
      }
      i += 2
    }
    if (inFrame > 0)
      out += AudioFrame(out.size.toLong, inFrame.toLong, sabs, zcr, peak)
    out.toSeq
  }

  /** REAL decode: parse the WAV byte stream and reduce the PCM samples to
    * exact integer statistics (deterministic — no float arithmetic).
    * Handles either endianness as declared by the parsed header. */
  def decodeStats(bytes: Array[Byte]): AudioStats = {
    val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
    val fmt = ais.getFormat
    require(fmt.getEncoding == AudioFormat.Encoding.PCM_SIGNED &&
      fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1,
      s"unsupported audio format: $fmt")
    val data = ais.readAllBytes()
    ais.close()
    val bigEndian = fmt.isBigEndian
    var i = 0; var sum = 0L; var sabs = 0L; var peak = 0L
    while (i + 1 < data.length) {
      val lo = if (bigEndian) data(i + 1) else data(i)
      val hi = if (bigEndian) data(i) else data(i + 1)
      val s = (hi.toInt << 8) | (lo & 0xff) // hi carries the sign
      sum += s
      val a = math.abs(s.toLong)
      sabs += a
      if (a > peak) peak = a
      i += 2
    }
    AudioStats(data.length / 2L, fmt.getSampleRate.toInt, sum, sabs, peak)
  }
}
