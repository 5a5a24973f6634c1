package graft.operators

import graft.SparkSpec
import graft.multimodal.ImageIoCodec
import org.apache.spark.sql.functions._

/** Perceptual image near-dup (MediaDedup / q102): hash determinism and
  * invariances at the codec level, then the full banding pipeline pinned
  * for recall 1 on constructed twins and zero cross-image pairs.
  */
class MediaDedupSpec extends SparkSpec {
  import spark.implicits._

  private def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  test("aHash/dHash are deterministic and re-encode-invariant") {
    val img = MediaDedup.blockImage(7L)
    assert(ImageIoCodec.aHash(img) == ImageIoCodec.aHash(img))
    assert(ImageIoCodec.dHash(img) == ImageIoCodec.dHash(img))
    val reenc = ImageIoCodec.toPng(javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(img)))
    assert(ImageIoCodec.aHash(reenc) == ImageIoCodec.aHash(img))
    assert(ImageIoCodec.dHash(reenc) == ImageIoCodec.dHash(img))
  }

  test("downsample and jitter twins stay within the Hamming band; distinct images do not") {
    (0L until 24L).foreach { s =>
      val orig = MediaDedup.blockImage(s)
      val half = ImageIoCodec.downsample(orig, 32, 32)
      val jit = MediaDedup.blockImage(s, jitterBlock = (s % 64).toInt)
      assert(ham(ImageIoCodec.aHash(orig), ImageIoCodec.aHash(half)) <= 3,
        s"seed=$s half")
      assert(ham(ImageIoCodec.aHash(orig), ImageIoCodec.aHash(jit)) <= 3,
        s"seed=$s jitter")
      // dHash's 9-column grid cannot align with a 2× pool (9 ∤ 64), so a
      // rescale drifts a few gradient signs — the real dHash-under-resize
      // behavior; its ≤3 regime is same-geometry edits (jitter, below)
      assert(ham(ImageIoCodec.dHash(orig), ImageIoCodec.dHash(half)) <= 8,
        s"seed=$s half dhash")
      assert(ham(ImageIoCodec.dHash(orig), ImageIoCodec.dHash(jit)) <= 3,
        s"seed=$s jitter dhash")
    }
    // distinct random-block images are ~32 bits apart — far outside the band
    val hashes = (0L until 24L).map(s => ImageIoCodec.aHash(MediaDedup.blockImage(s)))
    for (i <- hashes.indices; j <- i + 1 until hashes.size)
      assert(ham(hashes(i), hashes(j)) > 3, s"pair $i,$j too close")
  }

  test("gradient image: aHash splits dark/bright halves; dHash is monotone-direction-sensitive") {
    // a horizontal gradient has exactly the left half below the mean
    val w = 64
    val img = new java.awt.image.BufferedImage(w, w,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until w; x <- 0 until w) {
      val v = x * 255 / (w - 1)
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bytes = ImageIoCodec.toPng(img)
    val a = ImageIoCodec.aHash(bytes)
    // bits are cell-major (row*8+col): each row's right 4 cells above mean
    (0 until 8).foreach { r =>
      (0 until 4).foreach(c => assert((a & (1L << (r * 8 + c))) == 0L))
      (4 until 8).foreach(c => assert((a & (1L << (r * 8 + c))) != 0L))
    }
    // dHash of a rising gradient: no cell is brighter than its right
    // neighbor, so all gradient-sign bits are 0
    assert(ImageIoCodec.dHash(bytes) == 0L)
  }

  test("q102 pipeline: recall 1 on constructed twins, no cross-image pairs") {
    val got = MediaDedup.q102(spark).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got.nonEmpty)
    def seedOf(k: String) = k.split(':')(1).toLong
    // precision: every emitted pair links two variants of the SAME image
    got.foreach { case (a, b, h) =>
      assert(seedOf(a) == seedOf(b), s"cross-image pair $a-$b")
      assert(h <= 3)
    }
    // recall: for every seed, all 4 variants form one clique — 6 pairs —
    // because reenc/half are Hamming-0 and jitter is within the band of
    // each (the spec above pins the pairwise distances)
    val bySeed = got.groupBy { case (a, _, _) => seedOf(a) }
    assert(bySeed.keySet == (0L until 24L).toSet)
    bySeed.foreach { case (s, ps) =>
      val links = ps.map { case (a, b, _) =>
        Set(a.split(':')(0), b.split(':')(0)) }.toSet
      // orig–reenc, orig–half, orig–jitter must all be present (reenc/half
      // may collapse to identical hashes but remain distinct ids)
      Seq("reenc", "half", "jitter").foreach(k =>
        assert(links.contains(Set("orig", k)), s"seed=$s missing orig-$k"))
    }
  }

  // ── audio ──────────────────────────────────────────────────────────

  /** Deterministic clip: 64 windows × 512 samples, window amplitude from
    * byteswap64(seed, w), samples alternating ±amp (power = amp², exactly
    * preserved by the aligned 2× resample). */
  private def clip(seed: Long): Array[Float] = {
    val out = new Array[Float](64 * 512)
    for (w <- 0 until 64) {
      val h = scala.util.hashing.byteswap64(seed * 64 + w)
      val amp = 0.1f + 0.8f * (((h >>> 32) & 0xff).toInt / 255f)
      for (i <- 0 until 512)
        out(w * 512 + i) = if (i % 2 == 0) amp else -amp
    }
    out
  }

  /** Encode mono 16-bit PCM in the container's endianness. */
  private def enc(samples: Array[Float], hz: Int,
      tpe: javax.sound.sampled.AudioFileFormat.Type,
      bigEndian: Boolean): Array[Byte] = {
    import javax.sound.sampled._
    val raw = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (v, i) =>
      val s = math.max(-32768, math.min(32767, (v * 32767).round)).toShort
      if (bigEndian) {
        raw(i * 2) = ((s >> 8) & 0xff).toByte; raw(i * 2 + 1) = (s & 0xff).toByte
      } else {
        raw(i * 2) = (s & 0xff).toByte; raw(i * 2 + 1) = ((s >> 8) & 0xff).toByte
      }
    }
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
      hz.toFloat, 16, 1, 2, hz.toFloat, bigEndian)
    val out = new java.io.ByteArrayOutputStream()
    AudioSystem.write(new AudioInputStream(
      new java.io.ByteArrayInputStream(raw), fmt, samples.length.toLong),
      tpe, out)
    out.toByteArray
  }

  test("audio hash: container-invariant, resample-robust, discriminative") {
    import javax.sound.sampled.AudioFileFormat.Type
    import graft.multimodal.WavCodec
    val hashes = (0L until 8L).map { s =>
      val pcm = clip(s)
      val wav = enc(pcm, 32768, Type.WAVE, bigEndian = false)
      val aiff = enc(pcm, 32768, Type.AIFF, bigEndian = true)
      val au = enc(pcm, 32768, Type.AU, bigEndian = true)
      val h = WavCodec.aHashAudio(wav)
      // same PCM in three containers → identical hash
      assert(WavCodec.aHashAudio(aiff) == h, s"seed=$s aiff")
      assert(WavCodec.aHashAudio(au) == h, s"seed=$s au")
      // aligned 2× resample preserves the power envelope
      val res = WavCodec.resample(wav, 16384)
      assert(ham(h, WavCodec.aHashAudio(res)) <= 3, s"seed=$s resample")
      h
    }
    for (i <- hashes.indices; j <- i + 1 until hashes.size)
      assert(ham(hashes(i), hashes(j)) > 3, s"clips $i,$j too close")
  }

  test("audioHashes + pairs: per-clip twin cliques, undecodable/foreign formats dropped") {
    import javax.sound.sampled.AudioFileFormat.Type
    val rows = (0L until 8L).flatMap { s =>
      val pcm = clip(s)
      Seq(
        (s"orig:$s", "wav", enc(pcm, 32768, Type.WAVE, bigEndian = false)),
        (s"aiff:$s", "aiff", enc(pcm, 32768, Type.AIFF, bigEndian = true)),
        (s"res:$s", "wav",
          graft.multimodal.WavCodec.resample(
            enc(pcm, 32768, Type.WAVE, bigEndian = false), 16384)))
    } ++ Seq(
      ("corrupt:0", "wav", Array[Byte](1, 2, 3)),       // decode fails → dropped
      ("foreign:0", "mp3", Array[Byte](4, 5, 6)))       // no JDK decoder → filtered
    val media = rows.toDF("key", "format", "bytes")
      .withColumn("media_id", xxhash64(col("key")))
      .withColumn("modality", lit("audio"))
      .withColumn("meta", struct(col("format")))
    val hashed = MediaDedup.audioHashes(media, keep = Seq("key"))
    assert(hashed.count() == 24) // corrupt + foreign rows gone, no crash
    val keyed = hashed.select(col("media_id"), col("key"))
    val got = MediaDedup.pairs(spark, hashed, "phash", "audio_test_buckets")
      .join(keyed.select(col("media_id").as("a_id"), col("key").as("a_key")), Seq("a_id"))
      .join(keyed.select(col("media_id").as("b_id"), col("key").as("b_key")), Seq("b_id"))
      .select("a_key", "b_key").collect()
      .map(r => (r.getString(0), r.getString(1)))
    def seedOf(k: String) = k.split(':')(1).toLong
    assert(got.nonEmpty)
    got.foreach { case (a, b) =>
      assert(seedOf(a) == seedOf(b), s"cross-clip pair $a-$b") }
    // every clip's three variants form a clique (3 pairs × 8 clips)
    assert(got.length == 24, s"got ${got.length} pairs")
  }

  test("q103 pipeline: every clip's orig/half/quarter variants form one clique") {
    val got = MediaDedup.q103(spark).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    def seedOf(k: String) = k.split(':')(1).toLong
    got.foreach { case (a, b, h) =>
      assert(seedOf(a) == seedOf(b), s"cross-clip pair $a-$b")
      assert(h <= 3)
    }
    // 16 clips × C(3,2) pairs — the 4× (quarter) twin must pair with BOTH
    // orig and half, pinning the row-count contract the ⚙ entry relies on
    assert(got.length == 48, s"got ${got.length} pairs")
    val bySeed = got.groupBy { case (a, _, _) => seedOf(a) }
    assert(bySeed.keySet == (0L until 16L).toSet)
    bySeed.foreach { case (s, ps) =>
      val links = ps.map { case (a, b, _) =>
        Set(a.split(':')(0), b.split(':')(0)) }.toSet
      assert(links == Set(Set("orig", "half"), Set("orig", "quarter"),
        Set("half", "quarter")), s"seed=$s links=$links")
    }
  }

  test("dHash banding finds the same twins through the shared pair stage") {
    // jitter twins: dHash's regime is same-geometry edits (see the band
    // test above for why rescale drifts it)
    val corpus = (0L until 8L).flatMap { s =>
      Seq((s"orig:$s", MediaDedup.blockImage(s)),
        (s"jit:$s", MediaDedup.blockImage(s, jitterBlock = (s % 64).toInt)))
    }.toDF("key", "bytes")
      .withColumn("media_id", xxhash64(col("key")))
      .withColumn("modality", lit("image"))
      .withColumn("meta", struct(lit("png").as("format")))
    val hashed = MediaDedup.imageHashes(corpus, keep = Seq("key"))
    val p = MediaDedup.pairs(spark, hashed, "dhash", "media_dhash_test")
    assert(p.count() == 8L)
  }
}
