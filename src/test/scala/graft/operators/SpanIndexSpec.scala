package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pins [[SpanIndex]]'s incremental claim: cleaning an ingest wave
  * against the stored shingle-ownership index is ROW-IDENTICAL to
  * running full-batch [[CorpusOps.removeDuplicatedSpans]] over
  * (history ∪ wave) and keeping the wave's rows — under monotonic
  * doc_ids, two waves deep, and through the bucketed parquet lake
  * (write → extend → read), whose layout stays frozen at the creation
  * bucket count. */
class SpanIndexSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sfDir)
    .filter(col("text").isNotNull)

  private def cleanedVia(full: DataFrame, lo: Long): DataFrame =
    CorpusOps.removeDuplicatedSpans(full, "doc_id")
      .filter(col("doc_id") >= lo)

  private def rowsEqual(a: DataFrame, b: DataFrame): Unit = {
    assert(a.count() == b.count())
    assert(a.except(b).isEmpty && b.except(a).isEmpty)
  }

  test("cleanAgainst ≡ full-batch q109 restricted to the wave (in-plan index)") {
    val cut = 250L
    val idx = SpanIndex.fromCorpus(docs.filter(col("doc_id") < cut), "doc_id")
    val got = SpanIndex.cleanAgainst(idx, docs.filter(col("doc_id") >= cut),
      "doc_id")
    rowsEqual(got, cleanedVia(docs, cut))
  }

  test("two waves through the stored lake: write → clean+extend → clean, each ≡ full batch") {
    val dir = tmpDir("span-idx")
    val (c1, c2) = (150L, 350L)
    val w0 = docs.filter(col("doc_id") < c1)
    val w1 = docs.filter(col("doc_id") >= c1 && col("doc_id") < c2)
    val w2 = docs.filter(col("doc_id") >= c2)
    SpanIndex.write(SpanIndex.fromCorpus(w0, "doc_id"), dir, buckets = 8)

    // wave 1 cleans against the stored snapshot-0 index
    val got1 = SpanIndex.cleanAgainst(SpanIndex.read(spark, dir), w1, "doc_id")
    rowsEqual(got1,
      cleanedVia(docs.filter(col("doc_id") < c2), c1))
    SpanIndex.extend(spark, dir, w1, "doc_id", buckets = 8)

    // wave 2 cleans against the EXTENDED index (history never re-read)
    val got2 = SpanIndex.cleanAgainst(SpanIndex.read(spark, dir), w2, "doc_id")
    rowsEqual(got2, cleanedVia(docs, c2))

    // the extended lake still equals the from-scratch derivation
    val rebuilt = SpanIndex.fromCorpus(docs.filter(col("doc_id") < c2), "doc_id")
    val stored = SpanIndex.read(spark, dir)
    // owners may differ only where a shingle is unique per snapshot but
    // duplicated across them — no: first-writer = min id under monotonic
    // ids, so the stored index must equal the derivation exactly
    rowsEqual(stored, rebuilt)

    // frozen layout: every written bucket id is within the creation count
    val buckets = spark.read.parquet(dir)
      .select(col("bucket").cast("int")).distinct()
      .collect().map(_.getInt(0)).toSet
    assert(buckets.forall(b => b >= 0 && b < 8), buckets.toString)
  }

  test("index-only removal: a wave doc fully covered by history comes back empty") {
    import spark.implicits._
    val hist = Seq((1L, "a b c d e f g h")).toDF("doc_id", "text")
    val wave = Seq(
      (10L, "a b c d e f g h"),   // exact copy → fully removed
      (11L, "z y x w v u t s")    // untouched
    ).toDF("doc_id", "text")
    val out = SpanIndex.cleanAgainst(
      SpanIndex.fromCorpus(hist, "doc_id"), wave, "doc_id")
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getString(3))).toMap
    assert(out(10L) == ((8L, "")), out(10L).toString)
    assert(out(11L) == ((0L, "z y x w v u t s")))
  }
}
