package graft.multimodal

import java.io.ByteArrayOutputStream
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins [[WavCodec]] at the sample level on synthesized WAVs (the JDK both
  * writes and reads the fixtures — no external media needed), and the
  * Multimodal dispatch/failure contract around it. */
class WavCodecSpec extends SparkSpec {
  import spark.implicits._

  /** 16-bit mono PCM WAV of the given samples. */
  private def wav(samples: Array[Float], hz: Int): Array[Byte] = {
    val raw = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (v, i) =>
      val s = math.max(-32768, math.min(32767, (v * 32767).round)).toShort
      raw(i * 2) = (s & 0xff).toByte
      raw(i * 2 + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
      hz.toFloat, 16, 1, 2, hz.toFloat, false)
    val out = new ByteArrayOutputStream()
    AudioSystem.write(new AudioInputStream(
      new java.io.ByteArrayInputStream(raw), fmt, samples.length.toLong),
      AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  private def sine(n: Int, hz: Int, freq: Double, amp: Float): Array[Float] =
    Array.tabulate(n)(i => (amp * math.sin(2 * math.Pi * freq * i / hz)).toFloat)

  test("decode round-trips the written samples") {
    val src = sine(16000, 16000, 440, 0.5f)
    val (mono, rate) = WavCodec.decode(wav(src, 16000))
    assert(rate == 16000.0f && mono.length == 16000)
    assert(mono.zip(src).forall { case (a, b) => math.abs(a - b) < 1e-3 },
      "decoded samples must match written samples to quantization error")
  }

  test("features: the RMS envelope follows loudness, silence is zero") {
    // quiet first half, loud second half → rising envelope
    val quiet = sine(8000, 16000, 440, 0.1f)
    val loud = sine(8000, 16000, 440, 0.8f)
    val f = WavCodec.features(wav(quiet ++ loud, 16000), 8)
    assert(math.abs(f.sum - 1.0f) < 1e-3, "envelope is L1-normalized")
    assert(f.take(4).sum < f.drop(4).sum, s"envelope must rise: ${f.toSeq}")
    val silent = WavCodec.features(wav(new Array[Float](4000), 16000), 8)
    assert(silent.forall(_ == 0.0f), "silence has a zero envelope")
  }

  test("durationMs and resample: rate halves, duration survives") {
    val b = wav(sine(16000, 16000, 440, 0.5f), 16000)
    assert(WavCodec.durationMs(b) == 1000L)
    val down = WavCodec.resample(b, 8000)
    val (mono, rate) = WavCodec.decode(down)
    assert(rate == 8000.0f)
    assert(math.abs(mono.length - 8000) <= 1, s"got ${mono.length} samples")
    assert(WavCodec.durationMs(down) == 1000L)
  }

  test("Multimodal dispatch: wav rows take the real codec; corrupt audio yields NULL features") {
    val good = wav(sine(4000, 16000, 440, 0.5f), 16000)
    val bad = Array.tabulate[Byte](64)(_.toByte)
    val media = Seq(
      (1L, "audio", good, "wav"),
      (2L, "audio", bad, "wav"))
      .toDF("media_id", "modality", "bytes", "format")
      .withColumn("meta", struct(col("format"),
        lit(null).cast("int").as("width"), lit(null).cast("int").as("height"),
        lit(16000).as("sample_rate"), lit(null).cast("int").as("n_frames"),
        lit(null).cast("long").as("duration_ms")))
    val rows = Multimodal.extractFeatures(media, dim = 8)
      .collect().map(r => r.getAs[Long]("media_id") -> r).toMap
    val real = rows(1L).getAs[scala.collection.Seq[Float]]("features")
    assert(real != null && math.abs(real.sum - 1.0f) < 1e-3,
      "decodable wav must produce the real normalized envelope")
    assert(rows(2L).isNullAt(rows(2L).fieldIndex("features")),
      "undecodable bytes yield NULL features, never a job failure")
    // resampleAudio: wav halves its byte payload, failure passes through —
    // and the metadata struct follows the PAYLOAD: only the actually
    // rewritten row reads the new rate, the corrupt row keeps its old meta
    val resampled = Multimodal.resampleAudio(media, 8000)
      .collect().map(r => r.getAs[Long]("media_id") -> r).toMap
    val rb = resampled(1L).getAs[Array[Byte]]("bytes")
    assert(rb.length < good.length * 3 / 4, "downsample shrinks")
    assert(resampled(1L).getAs[org.apache.spark.sql.Row]("meta")
      .getAs[Int]("sample_rate") == 8000, "meta must track the new rate")
    assert(resampled(2L).getAs[Array[Byte]]("bytes").sameElements(bad),
      "undecodable audio passes through")
    assert(resampled(2L).getAs[org.apache.spark.sql.Row]("meta")
      .getAs[Int]("sample_rate") == 16000,
      "pass-through rows must keep their original metadata")
  }

  test("a zero-frame WAV resamples to a zero-frame WAV (no crash)") {
    val empty = wav(new Array[Float](0), 16000)
    val out = WavCodec.resample(empty, 8000)
    val (mono, rate) = WavCodec.decode(out)
    assert(mono.isEmpty && rate == 8000.0f)
  }

  test("readMediaDir classifies every WavCodec format as audio") {
    val dir = tmpDir("media-audio")
    val bytes = wav(sine(800, 16000, 440, 0.5f), 16000)
    Seq("a.wav", "b.aiff", "c.au", "d.mp3").foreach { name =>
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir, name), bytes)
    }
    val m = Multimodal.readMediaDir(spark, dir)
      .select("meta.format", "modality").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(m.values.forall(_ == "audio"), s"all audio extensions: $m")
  }
}
