package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The multimodal plumbing is real (schema, pruning, batch shape, UDF
  * signatures); only the codec is a deterministic fake. */
class MultimodalSpec extends SparkSpec {

  private lazy val media = Multimodal.synthesize(spark, sfDir).cache()

  test("synthesized media matches the declared schema") {
    val got = media.schema.fieldNames.toSeq
    assert(got == Seq("media_id", "modality", "bytes", "meta"))
    assert(media.schema("bytes").dataType.typeName == "binary")
    assert(media.count() == 300)
  }

  test("feature extraction: fixed-dim float vectors, deterministic") {
    val f1 = Multimodal.extractFeatures(media, 64).orderBy("media_id").collect()
    val f2 = Multimodal.extractFeatures(media, 64).orderBy("media_id").collect()
    assert(f1.length == 300)
    assert(f1.head.getSeq[Float](1).length == 64)
    assert(f1.map(_.getSeq[Float](1).toList).toList ==
      f2.map(_.getSeq[Float](1).toList).toList)
    // content-sensitive: different media → different features
    assert(f1.map(_.getSeq[Float](1).toList).distinct.length > 290)
  }

  test("batched (mapPartitions) extraction equals the per-row UDF path") {
    val a = Multimodal.extractFeatures(media, 16).orderBy("media_id").collect()
    val b = Multimodal.extractFeaturesBatched(media, 16).orderBy("media_id").collect()
    assert(a.map(r => (r.getLong(0), r.getSeq[Float](1).toList)).toList ==
      b.map(r => (r.getLong(0), r.getSeq[Float](1).toList)).toList)
  }

  test("features flow into the similarity operators (cosine over fake embeddings)") {
    val feats = Multimodal.extractFeatures(media, 32)
    val q = feats.filter(col("media_id") === 0).select(col("features").as("q"))
    val scored = feats.crossJoin(broadcast(q))
      .select(col("media_id"),
        graft.functions.VectorFunctions.cosineNative(col("features"), col("q")).as("cos"))
      .orderBy(col("cos").desc_nulls_last, col("media_id"))
    val top = scored.limit(3).collect()
    assert(top.head.getLong(0) == 0L) // self-similarity = 1.0 ranks first
    assert(math.abs(top.head.getDouble(1) - 1.0) < 1e-9)
  }

  test("resize touches only images; audio/video bytes unchanged") {
    val resized = Multimodal.resizeImages(media, 8, 8)
    val joined = media.select(col("media_id"), col("modality"), col("bytes").as("orig"))
      .join(resized.select(col("media_id"), col("bytes").as("now")), "media_id")
    val changed = joined.filter(col("modality") === "image")
      .filter(length(col("now")) =!= length(col("orig"))).count()
    val untouched = joined.filter(col("modality") =!= "image")
      .filter(length(col("now")) =!= length(col("orig"))).count()
    assert(changed == 100) // every image (64..255 bytes) shrinks to 8*8=64
    assert(untouched == 0)
  }

  test("frame sampling explodes videos into every-k-th frame rows") {
    val frames = Multimodal.sampleFrames(media, k = 3)
    // 100 videos × ceil(12/3)=4 frames
    assert(frames.count() == 400)
    assert(frames.schema.fieldNames.toSeq == Seq("media_id", "frame_idx", "frame_bytes"))
    assert(frames.agg(max("frame_idx")).head().getInt(0) == 3)
  }

  test("media round-trips through partitioned parquet (binary + struct intact)") {
    val out = tmpDir("media-out")
    media.write.mode("overwrite").partitionBy("modality").parquet(out)
    val back = spark.read.parquet(out)
    assert(back.count() == 300)
    val a = media.select("media_id", "bytes").orderBy("media_id")
      .collect().map(r => r.getAs[Array[Byte]]("bytes").toSeq)
    val b = back.select("media_id", "bytes").orderBy("media_id")
      .collect().map(r => r.getAs[Array[Byte]]("bytes").toSeq)
    assert(a.toSeq == b.toSeq)
    assert(back.select("meta.n_frames").distinct().count() == 2) // 12 and null
  }
}
