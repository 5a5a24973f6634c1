package graft.operators

import graft.multimodal.ImageIoCodec
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Perceptual near-duplicate detection for images — the image-modality
  * member of the dedup family (the text side is q41/q42; the embedding
  * side q69/q70). An image's fingerprint is a 64-bit perceptual hash
  * (aHash: above-mean cells of an 8×8 average-pooled grayscale; dHash:
  * horizontal gradient signs of a 9×8 pool — [[ImageIoCodec.aHash]]/
  * [[ImageIoCodec.dHash]], pure-integer and JVM-deterministic), so
  * re-encoded, format-converted, uniformly-rescaled and mildly
  * re-brightened copies land within a few bits of their original.
  *
  * The pair stage is NOT new machinery: a 64-bit perceptual hash is
  * banding-compatible with a 64-bit SimHash, so candidate generation
  * reuses [[DedupQueries.simhashBandPairs]] verbatim — 4×16-bit chunk
  * buckets, per-bucket pair expansion under the capacity cap with star
  * reduction for oversized buckets, exact Hamming ≤ 3 filter (pigeonhole:
  * any pair within Hamming ≤ 3 shares ≥ 1 of 4 chunks, so recall is
  * exact over the candidate space). At 100 TB of images the scan cost is
  * the DECODE, not the join: hashes are computed once at ingest (64
  * bits/image stored beside the metadata — [[imageHashes]] is the
  * write-time call), and the pair stage shuffles only (id, hash).
  *
  * The decode step wraps the JDK codec ([[ImageIoCodec]]) in a udf — the
  * repo-wide exception to the no-udf rule: a BufferedImage decode cannot
  * be a Catalyst expression. Everything after the 64-bit hash is native.
  */
object MediaDedup {

  // decode failure (truncated file, misdeclared format, CMYK JPEG the JDK
  // returns null for) → null hash, never an exception: one bad row must
  // not fail the corpus job — the Multimodal.featuresFor contract
  private val aHashUdf = udf((b: Array[Byte]) =>
    try java.lang.Long.valueOf(ImageIoCodec.aHash(b))
    catch { case scala.util.control.NonFatal(_) => null })
  private val dHashUdf = udf((b: Array[Byte]) =>
    try java.lang.Long.valueOf(ImageIoCodec.dHash(b))
    catch { case scala.util.control.NonFatal(_) => null })

  /** Per-image perceptual hashes over a [[Multimodal.readMediaDir]] frame:
    * JDK-decodable images only (the dispatch contract — tiff etc. have no
    * JDK reader), both hashes in one decode-bearing projection; rows whose
    * bytes fail to decode are dropped (null-hash filter). Columns:
    * media_id, phash (aHash), dhash (+ passthrough of `keep`). */
  def imageHashes(media: DataFrame, keep: Seq[String] = Nil): DataFrame = {
    val decodable = ImageIoCodec.formats.toSeq.sorted
    media
      .filter(col("modality") === "image" &&
        col("meta.format").isin(decodable: _*))
      .select(Seq(col("media_id"), aHashUdf(col("bytes")).as("phash"),
        dHashUdf(col("bytes")).as("dhash")) ++ keep.map(col): _*)
      .filter(col("phash").isNotNull && col("dhash").isNotNull)
  }

  private val audioHashUdf = udf((b: Array[Byte]) =>
    try java.lang.Long.valueOf(graft.multimodal.WavCodec.aHashAudio(b))
    catch { case scala.util.control.NonFatal(_) => null })

  /** Per-clip perceptual hash over a media frame: JDK-decodable audio only
    * ([[graft.multimodal.WavCodec.formats]] — mp3/flac/ogg have no JDK
    * decoder), undecodable rows dropped like [[imageHashes]]. Column
    * `phash` so [[pairs]] applies unchanged — a 64-bit energy-envelope
    * hash bands exactly like an image aHash or a SimHash. */
  def audioHashes(media: DataFrame, keep: Seq[String] = Nil): DataFrame = {
    val decodable = graft.multimodal.WavCodec.formats.toSeq.sorted
    media
      .filter(col("modality") === "audio" &&
        col("meta.format").isin(decodable: _*))
      .select(Seq(col("media_id"),
        audioHashUdf(col("bytes")).as("phash")) ++ keep.map(col): _*)
      .filter(col("phash").isNotNull)
  }

  /** Near-dup pair generation over (media_id, <hashCol>): banding + capped
    * bucket pair expansion + exact Hamming ≤ 3, via the shared SimHash
    * pair stage. `block` is the bucket-key modality label — pass distinct
    * labels if one frame ever mixes modalities, so images and audio never
    * band together. Emits (a_id, b_id, hamming), a_id < b_id.
    *
    * Low-information caveat (inherent to the whole aHash family, image
    * AND audio): content with a flat signature source — a uniform image,
    * a loudness-normalized/constant-power clip — hashes near 0L or a
    * coin-flip pattern, so two DIFFERENT flat items can collide at small
    * Hamming. Corpus pipelines should gate such rows out first (e.g.
    * `filter(bit_count(col("phash")) between 4 and 60)`) or route them to
    * content-hash exact dedup; the hash carries no signal to distinguish
    * them, by construction. */
  def pairs(spark: SparkSession, hashed: DataFrame,
      hashCol: String = "phash",
      metric: String = "media_phash_buckets",
      block: String = "media"): DataFrame =
    DedupQueries.simhashBandPairs(spark,
      hashed.select(col("media_id").as("doc_id"), lit(block).as("source"),
        col(hashCol).as("simhash")),
      chunks = 4, bits = 16, metric = metric)

  /** Shared tail of the q102/q103 pipelines: banded pairs re-keyed to the
    * human-readable "kind:seed" endpoints, deterministically ordered. */
  private def keyedPairs(spark: SparkSession, hashed0: DataFrame,
      metric: String, block: String): DataFrame = {
    // persist the decode-bearing hash projection: the final plan consumes
    // it FOUR times (banded exact branch, star branch, and both key-join
    // sides), and every consumption re-ran the per-row media codec UDFs
    // (PNG/WAV decode + hash — the only genuinely expensive per-row work
    // in this family; guide §2.4). Run-scoped: the IMR is visible in the
    // final plan (no nested persist inside simhashBandPairs), so the
    // query's own action releases it.
    val hashed = hashed0.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    RunScopedCache.releaseAfterRun(spark, hashed)
    val keyed = hashed.select(col("media_id"), col("key"))
    pairs(spark, hashed, "phash", metric, block)
      .join(keyed.select(col("media_id").as("a_id"), col("key").as("a_key")),
        Seq("a_id"))
      .join(keyed.select(col("media_id").as("b_id"), col("key").as("b_key")),
        Seq("b_id"))
      .select(col("a_key"), col("b_key"), col("hamming"))
      .orderBy("a_key", "b_key")
  }

  /** Deterministic synthetic photo stand-in: a 64-px square of 8×8 gray
    * blocks whose levels derive from byteswap64(seed, block) — piecewise-
    * constant content whose pooled grid aligns with the hash grid, the
    * way real photographs present stable region statistics. Every byte is
    * a pure function of the seed (the committed media fixtures are
    * deliberately non-decodable stand-in bytes, so perceptual-dedup
    * corpora are generated, like MultimodalSpec's gradient PNGs).
    * `jitter` nudges ONE block's gray by +24 — a near-dup within a few
    * phash bits, never an identical one. */
  private[operators] def blockImage(seed: Long, px: Int = 64,
      jitterBlock: Int = -1): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(px, px,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bs = math.max(1, px / 8)
    var by = 0
    while (by < 8) {
      var bx = 0
      while (bx < 8) {
        val blk = by * 8 + bx
        val h = scala.util.hashing.byteswap64(seed * 64 + blk)
        var v = ((h >>> 32) & 0xff).toInt
        if (blk == jitterBlock) v = math.min(255, v + 24)
        val rgb = (v << 16) | (v << 8) | v
        var y = by * bs
        while (y < math.min(px, (by + 1) * bs)) {
          var x = bx * bs
          while (x < math.min(px, (bx + 1) * bs)) {
            img.setRGB(x, y, rgb); x += 1
          }
          y += 1
        }
        bx += 1
      }
      by += 1
    }
    ImageIoCodec.toPng(img)
  }

  /** Deterministic synthetic clip for [[q103]] — 64 windows × 512 samples
    * of alternating ±amp with per-window amplitude from byteswap64, as
    * mono 16-bit WAV: the audio stand-in [[blockImage]] is for images
    * (power envelope = the content signature; exactly preserved by the
    * window-aligned resample). */
  private[operators] def clipWav(seed: Long): Array[Byte] = {
    import javax.sound.sampled._
    val nWin = 64; val win = 512
    val raw = new Array[Byte](nWin * win * 2)
    var w = 0
    while (w < nWin) {
      val h = scala.util.hashing.byteswap64(seed * 64 + w)
      val amp = 0.1f + 0.8f * (((h >>> 32) & 0xff).toInt / 255f)
      var i = 0
      while (i < win) {
        val v = if (i % 2 == 0) amp else -amp
        val s = math.max(-32768, math.min(32767, (v * 32767).round)).toShort
        val k = (w * win + i) * 2
        raw(k) = (s & 0xff).toByte; raw(k + 1) = ((s >> 8) & 0xff).toByte
        i += 1
      }
      w += 1
    }
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
      32768f, 16, 1, 2, 32768f, false)
    val out = new java.io.ByteArrayOutputStream()
    AudioSystem.write(new AudioInputStream(
      new java.io.ByteArrayInputStream(raw), fmt, (nWin * win).toLong),
      AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** Q103 (⚙ rows-only: DuckDB cannot decode WAVs): the audio member of
    * the perceptual-dedup family, end to end — generated deterministic
    * clips with resampled twins (2× and 4× down, window-aligned so the
    * energy envelope survives), hashed by
    * [[graft.multimodal.WavCodec.aHashAudio]] and paired through the same
    * shared banding as images/SimHash. Invariances and recall are
    * spec-pinned in MediaDedupSpec; output keys are "kind:seed". */
  def q103(spark: SparkSession): DataFrame =
    keyedPairs(spark, audioHashes(audioCorpus(spark), keep = Seq("key")),
      "q103_buckets", "audio")

  /** The deterministic generated audio corpus q103 runs on — exposed so
    * MediaFixtureSpec can re-derive the frozen fingerprint fixture
    * ([[MediaQueries.audFixture]]) and print a refresh on codec drift. */
  private[graft] def audioCorpus(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val genUdf = udf((kind: String, s: Long) => kind match {
      case "orig" => clipWav(s)
      case "half" => graft.multimodal.WavCodec.resample(clipWav(s), 16384)
      case _ => graft.multimodal.WavCodec.resample(clipWav(s), 8192)
    })
    (0 until 16).map(_.toLong).toDF("seed")
      .crossJoin(Seq("orig", "half", "quarter").toDF("kind"))
      .repartition(8)
      .select(concat(col("kind"), lit(":"), col("seed")).as("key"),
        genUdf(col("kind"), col("seed")).as("bytes"))
      .withColumn("media_id", xxhash64(col("key")))
      .withColumn("modality", lit("audio"))
      .withColumn("meta", struct(lit("wav").as("format")))
  }

  /** Q102 (⚙ rows-only: DuckDB cannot decode PNGs): the perceptual-dedup
    * pipeline driven end-to-end over a deterministic generated image
    * corpus — 24 distinct base images, each with three constructed
    * near-dup twins: `reenc` (decode → PNG re-encode: pixel-identical ⇒
    * Hamming 0), `half` (2× [[ImageIoCodec.downsample]] — integer
    * pooling, grid-aligned ⇒ Hamming 0), and `jitter` (one block's gray
    * nudged ⇒ Hamming ≥ 0, within the band). Recall 1 on all twin pairs
    * and zero cross-seed pairs are spec-pinned (MediaDedupSpec), so the
    * row count is stable and non-empty. Output keys are "kind:seed". */
  def q102(spark: SparkSession): DataFrame =
    keyedPairs(spark, imageHashes(imageCorpus(spark), keep = Seq("key")),
      "q102_buckets", "img")

  /** The deterministic generated image corpus q102 runs on — exposed for
    * the same fixture-refresh path as [[audioCorpus]]. */
  private[graft] def imageCorpus(spark: SparkSession): DataFrame = {
    import spark.implicits._
    // generation runs ON EXECUTORS (udf over the seed×kind grid) — the
    // driver never materializes image bytes, same discipline as the
    // production decode path
    val genUdf = udf((kind: String, s: Long) => kind match {
      case "orig" => blockImage(s)
      case "reenc" => ImageIoCodec.toPng(javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(blockImage(s))))
      case "half" => ImageIoCodec.downsample(blockImage(s), 32, 32)
      case _ => blockImage(s, jitterBlock = (s % 64).toInt)
    })
    (0 until 24).map(_.toLong).toDF("seed")
      .crossJoin(Seq("orig", "reenc", "half", "jitter").toDF("kind"))
      .repartition(8)
      .select(concat(col("kind"), lit(":"), col("seed")).as("key"),
        genUdf(col("kind"), col("seed")).as("bytes"))
      .withColumn("media_id", xxhash64(col("key")))
      .withColumn("modality", lit("image"))
      .withColumn("meta", struct(lit("png").as("format")))
  }
}
