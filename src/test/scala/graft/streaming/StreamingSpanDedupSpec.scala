package graft.streaming

import graft.SparkSpec
import graft.operators.SpanIndex
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming twins of batch q151 (incremental cross-document span dedup):
  *  - [[CorpusStream.spanDedupAgainstIndex]] — the in-plan watermarked
  *    stream-static probe: must equal `SpanIndex.cleanAgainst` row for
  *    row on index-owned spans (the in-batch novel-dup rule is the
  *    documented out-of-scope — covered by the pipeline form);
  *  - [[CorpusStream.startSpanDedupStream]] — the full foreachBatch
  *    pipeline: wave-for-wave identical to the batch protocol INCLUDING
  *    in-wave ownership and the per-wave index extend. */
class StreamingSpanDedupSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  // corpus: two docs whose 3-shingles seed the ownership index
  private val corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "pack my box with five dozen liquor jugs"))
    .toDF("doc_id", "text")

  test("in-plan probe ≡ batch cleanAgainst on index-owned spans (multi-wave, short docs, clean docs)") {
    implicit val sc = spark.sqlContext
    val index = SpanIndex.fromCorpus(corpus, "doc_id", k = 3)
    val waves = Seq(
      // cuts mid-text: carries a corpus-owned 3-shingle run
      (10L, "watch the quick brown fox flee north", ts(0)),
      // clean: no indexed shingle
      (11L, "entirely novel words that match nothing at all", ts(0)),
      // shingle-less short doc: survives untouched
      (12L, "too short", ts(1)),
      // second wave, still inside the horizon
      (13L, "she said pack my box with five dozen pearls", ts(3)))
    val expected = SpanIndex.cleanAgainst(index,
        waves.toDF("doc_id", "text", "ts"), "doc_id", k = 3)
      .as[(Long, Long, Long, String)].collect().toSet
    assert(expected.exists(_._3 > 0), "fixture must cut something")
    assert(expected.exists(_._3 == 0), "fixture must keep something whole")

    val mem = MemoryStream[(Long, String, Timestamp)]
    val out = CorpusStream.spanDedupAgainstIndex(
      mem.toDS().toDF("doc_id", "text", "ts"), index, "doc_id",
      "ts", "10 minutes", k = 3)
    val q = out.writeStream.format("memory").queryName("spandedup")
      .outputMode("append").start()
    try {
      mem.addData(waves.take(3): _*)
      q.processAllAvailable()
      mem.addData(waves.drop(3): _*)
      q.processAllAvailable()
      // flush: a far-future doc advances the watermark past every wave
      mem.addData((99L, "flush marker document", ts(30)))
      q.processAllAvailable()
      val got = spark.table("spandedup")
        .filter(col("doc_id") =!= 99L)
        .as[(Long, Long, Long, String)].collect().toSet
      assert(got == expected,
        s"stream/batch drift:\n  got      $got\n  expected $expected")
    } finally q.stop()
  }

  test("foreachBatch pipeline ≡ batch protocol wave-for-wave, extends the index, replay-safe output") {
    implicit val sc = spark.sqlContext
    val indexDir = tmpDir("spanidx")
    val outDir = tmpDir("spanout")
    val ckpt = tmpDir("spanckpt")
    SpanIndex.write(SpanIndex.fromCorpus(corpus, "doc_id", k = 3), indexDir,
      buckets = 8)

    // wave 1 carries an IN-WAVE novel duplicated span ("silver moons rise
    // tonight" shared by 20/21): min-id 20 keeps it, 21 cuts it — the
    // batch rule the in-plan probe documents away, exact here
    val wave1 = Seq(
      (20L, "silver moons rise tonight over the harbor", ts(0)),
      (21L, "we saw silver moons rise tonight again", ts(0)))
    // wave 2 re-uses wave 1's span — cut via the EXTENDED index — plus a
    // corpus-owned span
    val wave2 = Seq(
      (30L, "silver moons rise tonight once more", ts(5)),
      (31L, "the quick brown fox returns", ts(5)))

    val idx0 = SpanIndex.read(spark, indexDir)
      .as[(String, Long)].collect().toSet
    val expected1 = SpanIndex.cleanAgainst(
        SpanIndex.read(spark, indexDir),
        wave1.toDF("doc_id", "text", "ts"), "doc_id", k = 3)
      .as[(Long, Long, Long, String)].collect().toSet

    val mem = MemoryStream[(Long, String, Timestamp)]
    val q = CorpusStream.startSpanDedupStream(
      mem.toDS().toDF("doc_id", "text", "ts"), indexDir, outDir, ckpt,
      "doc_id", k = 3, buckets = 8)
    try {
      mem.addData(wave1: _*)
      q.processAllAvailable()
      val got1 = spark.read.parquet(s"$outDir/batch=0")
        .as[(Long, Long, Long, String)].collect().toSet
      assert(got1 == expected1, s"wave 1 drift: $got1 vs $expected1")
      assert(got1.exists(t => t._1 == 21L && t._3 > 0),
        "in-wave novel dup must cut in the non-owner doc")
      assert(got1.exists(t => t._1 == 20L && t._3 == 0),
        "in-wave min-id owner must keep its span")

      // the wave's delta landed: expected2 computes against the index AS
      // EXTENDED by wave 1 — the cross-wave ownership the pipeline exists
      // for
      val expected2 = SpanIndex.cleanAgainst(
          SpanIndex.read(spark, indexDir),
          wave2.toDF("doc_id", "text", "ts"), "doc_id", k = 3)
        .as[(Long, Long, Long, String)].collect().toSet
      mem.addData(wave2: _*)
      q.processAllAvailable()
      val got2 = spark.read.parquet(s"$outDir/batch=1")
        .as[(Long, Long, Long, String)].collect().toSet
      assert(got2 == expected2, s"wave 2 drift: $got2 vs $expected2")
      assert(got2.exists(t => t._1 == 30L && t._3 > 0),
        "wave-1 span must cut in wave 2 via the extended index")

      // index ≡ the batch protocol's: corpus + both waves, first-writer
      // ownership (monotonic ids)
      val expectedIdx = SpanIndex.fromCorpus(
          corpus.unionByName((wave1 ++ wave2).map(t => (t._1, t._2))
            .toDF("doc_id", "text")), "doc_id", k = 3)
        .as[(String, Long)].collect().toSet
      val gotIdx = SpanIndex.read(spark, indexDir)
        .as[(String, Long)].collect().toSet
      assert(gotIdx == expectedIdx)
      assert(idx0.subsetOf(gotIdx),
        "extend must never rewrite existing ownership")
    } finally q.stop()

    // replay safety: re-running wave 1's foreachBatch body against the
    // NOW-extended index must not rewrite the published output (the
    // _SUCCESS skip), so the owner doc is never over-cut on a replay
    val before = spark.read.parquet(s"$outDir/batch=0")
      .as[(Long, Long, Long, String)].collect().toSet
    val mem2 = MemoryStream[(Long, String, Timestamp)]
    val ckpt2 = tmpDir("spanckpt2")
    val q2 = CorpusStream.startSpanDedupStream(
      mem2.toDS().toDF("doc_id", "text", "ts"), indexDir, outDir, ckpt2,
      "doc_id", k = 3, buckets = 8)
    try {
      mem2.addData(wave1: _*) // fresh checkpoint → batch id 0 again
      q2.processAllAvailable()
      val after = spark.read.parquet(s"$outDir/batch=0")
        .as[(Long, Long, Long, String)].collect().toSet
      assert(after == before, "replayed wave must not rewrite its output")
    } finally q2.stop()
  }
}
