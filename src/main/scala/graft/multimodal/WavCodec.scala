package graft.multimodal

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

/** REAL audio codec over the JDK's built-in `javax.sound.sampled` readers
  * (WAV/AIFF/AU PCM — no external libraries), the audio sibling of
  * [[ImageIoCodec]]: it satisfies the same decode / feature-extract /
  * "resize" (here: resample) contract [[Multimodal.FakeCodec]] stubs for
  * formats the JDK cannot read (mp3/flac/ogg ship no decoder in this
  * container). Pure-JVM and headless-safe.
  */
object WavCodec {

  /** Formats the JDK decodes out of the box (lower-cased `meta.format`). */
  val formats: Set[String] = Set("wav", "wave", "aiff", "aif", "au")

  def handles(format: String): Boolean =
    format != null && formats.contains(format.toLowerCase)

  /** Decode to mono float samples in [-1, 1] + the source sample rate.
    * Non-PCM encodings (a-law/µ-law) and multi-channel input are converted
    * through the JDK's own conversion chain to 16-bit signed PCM first. */
  def decode(bytes: Array[Byte]): (Array[Float], Float) = {
    val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
    try {
      val src = in.getFormat
      val target = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
        src.getSampleRate, 16, src.getChannels,
        2 * src.getChannels, src.getSampleRate, false)
      val pcm = AudioSystem.getAudioInputStream(target, in)
      val raw = pcm.readAllBytes()
      val channels = target.getChannels
      val nFrames = raw.length / (2 * channels)
      val mono = new Array[Float](nFrames)
      var f = 0
      while (f < nFrames) {
        var acc = 0.0f
        var c = 0
        while (c < channels) {
          val o = (f * channels + c) * 2
          val s = ((raw(o + 1) << 8) | (raw(o) & 0xff)).toShort
          acc += s / 32768.0f
          c += 1
        }
        mono(f) = acc / channels
        f += 1
      }
      (mono, target.getSampleRate)
    } finally in.close()
  }

  /** Real decode → feature vector: dim-bin RMS energy envelope over the
    * mono signal, L1-normalized (bins sum to 1 for any non-silent input) —
    * the standard cheap audio descriptor (loudness contour). Deterministic
    * for identical sample content regardless of container. */
  def features(bytes: Array[Byte], dim: Int): Array[Float] = {
    require(dim > 0)
    val (mono, _) = decode(bytes)
    val out = new Array[Float](dim)
    if (mono.isEmpty) return out
    val binLen = math.max(1, mono.length / dim)
    var b = 0
    while (b < dim) {
      val start = b * binLen
      val end = if (b == dim - 1) mono.length else math.min(mono.length, start + binLen)
      var acc = 0.0
      var i = start
      while (i < end) { acc += mono(i) * mono(i); i += 1 }
      out(b) = if (end > start) math.sqrt(acc / (end - start)).toFloat else 0.0f
      b += 1
    }
    val sum = out.sum
    if (sum > 0) {
      var i = 0
      while (i < dim) { out(i) /= sum; i += 1 }
    }
    out
  }

  /** Duration straight from the frame count — a decode-free metadata probe
    * in spirit ([[Multimodal]] scans metadata without decoding media).
    * Some AU/streamed headers carry no frame count or rate
    * (`AudioSystem.NOT_SPECIFIED`, -1) — that's a corrupt-metadata error
    * here, same contract as `features()` on undecodable bytes, never a
    * silently negative duration. */
  def durationMs(bytes: Array[Byte]): Long = {
    val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
    try {
      val frames = in.getFrameLength
      val rate = in.getFormat.getFrameRate
      if (frames == AudioSystem.NOT_SPECIFIED || rate <= 0)
        throw new java.io.IOException(
          s"audio header carries no frame count/rate (frames=$frames, rate=$rate)")
      (frames * 1000.0 / rate).round
    } finally in.close()
  }

  /** The audio "resize": linear-interpolation resample to `targetHz`,
    * re-encoded as mono 16-bit PCM WAV bytes. Deterministic. */
  def resample(bytes: Array[Byte], targetHz: Int): Array[Byte] = {
    require(targetHz > 0)
    val (mono, srcHz) = decode(bytes)
    val ratio = srcHz / targetHz.toDouble
    // a structurally valid zero-frame WAV resamples to a zero-frame WAV
    // (outLen 0 — indexing mono would throw on the empty signal)
    val outLen = if (mono.isEmpty) 0 else math.max(1, (mono.length / ratio).toInt)
    val res = new Array[Byte](outLen * 2)
    var i = 0
    while (i < outLen) {
      val pos = i * ratio
      val i0 = math.min(mono.length - 1, pos.toInt)
      val i1 = math.min(mono.length - 1, i0 + 1)
      val frac = (pos - i0).toFloat
      val v = mono(i0) * (1 - frac) + mono(i1) * frac
      val s = math.max(-32768, math.min(32767, (v * 32767).round)).toShort
      res(i * 2) = (s & 0xff).toByte
      res(i * 2 + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
      targetHz.toFloat, 16, 1, 2, targetHz.toFloat, false)
    val stream = new AudioInputStream(
      new ByteArrayInputStream(res), fmt, outLen.toLong)
    val out = new ByteArrayOutputStream()
    AudioSystem.write(stream, AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** 64-bit perceptual audio hash — the audio sibling of
    * [[ImageIoCodec.aHash]]: the clip's duration is split into 64 equal
    * time windows, bit i set iff window i's mean POWER (Σ sample² / count,
    * accumulated in double, no sqrt) exceeds the 64-window mean, compared
    * cross-multiplied in the same scale-free way as the image grid. Time
    * normalization makes it container- and rate-robust: a WAV→AIFF→AU
    * re-encode of the same PCM hashes identically, and a resampled copy
    * lands within a few bits (the energy envelope survives linear
    * interpolation) — the near-dup regime `MediaDedup`'s Hamming banding
    * probes. Silence (all-zero or empty) hashes to 0L — and so does ANY
    * flat-envelope clip (loudness-normalized / constant-power content):
    * a per-clip-thresholded hash carries zero bits of signal for content
    * whose signature source is uniform, the same inherent property as the
    * image aHash on a flat image. Dedup pipelines must gate
    * low-information rows (popcount near 0 or 64) to exact content-hash
    * dedup instead — see MediaDedup.pairs' caveat. */
  def aHashAudio(bytes: Array[Byte]): Long = {
    val (mono, _) = decode(bytes)
    val n = mono.length
    if (n == 0) return 0L
    val e = new Array[Double](64)
    var w = 0
    while (w < 64) {
      val s0 = (w.toLong * n / 64).toInt
      val s1 = math.max(s0 + 1, ((w + 1).toLong * n / 64).toInt)
      var sum = 0.0
      var i = s0
      while (i < s1) { sum += mono(i).toDouble * mono(i); i += 1 }
      e(w) = sum / (s1 - s0)
      w += 1
    }
    var total = 0.0
    var i = 0
    while (i < 64) { total += e(i); i += 1 }
    var bits = 0L
    i = 0
    while (i < 64) {
      if (e(i) * 64 > total) bits |= (1L << i)
      i += 1
    }
    bits
  }
}
