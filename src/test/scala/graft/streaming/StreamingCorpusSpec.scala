package graft.streaming

import graft.{SparkEntry, SparkSpec}
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** CorpusStream: ingestion-time quality gating + watermark-bounded exact
  * dedup (the streaming twin of batch q73's first two stages). */
class StreamingCorpusSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
  private val good = (1 to 30).map(i => s"w$i").mkString(" ")
  private val junk = "r r r r r r r r r r"

  test("quality gate and cross-batch exact dedup, state bounded by watermark") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Long, String, Timestamp)]
    val out = CorpusStream.clean(
      mem.toDS().toDF("doc_id", "text", "ts"), "ts", "10 minutes")
    val q = out.writeStream.format("memory").queryName("scorpus")
      .outputMode("append").start()
    try {
      // batch 1: one good doc, one junk doc, one in-batch duplicate of good
      mem.addData((1L, good, ts(0)), (2L, junk, ts(0)), (3L, good, ts(1)))
      q.processAllAvailable()
      // batch 2: a duplicate arriving 2 minutes later — inside the
      // watermark horizon, must be dropped
      mem.addData((4L, good, ts(3)))
      q.processAllAvailable()
      val ids = spark.table("scorpus").select("doc_id").as[Long].collect().toSet
      assert(ids.contains(1L), "good doc must pass")
      assert(!ids.contains(2L), "junk doc must fail the quality gate")
      assert(!ids.contains(3L), "in-batch duplicate must be dropped")
      assert(!ids.contains(4L), "within-watermark duplicate must be dropped")
    } finally q.stop()
  }

  test("incremental dedup vs a static corpus index: known fingerprints never land") {
    implicit val sc = spark.sqlContext
    // the "existing corpus": doc A verbatim, doc B as a reordered bag
    val corpus = Seq("a b c d e", "p q r s t").toDF("text")
    val index = CorpusStream.corpusIndex(corpus)
    val mem = MemoryStream[(Long, String, Timestamp)]
    val out = CorpusStream.dedupAgainstCorpus(
      mem.toDS().toDF("doc_id", "text", "ts"), index, "ts", "10 minutes")
    val q = out.writeStream.format("memory").queryName("incdedup")
      .outputMode("append").start()
    try {
      mem.addData(
        (1L, "a b c d e", ts(0)),   // exact copy of corpus doc A → drop
        (2L, "e d c b a", ts(0)),   // reordered bag of corpus doc A → drop
        (3L, "x y z w v", ts(0)),   // genuinely new → keep
        (4L, "z y x w v", ts(1)))   // same bag as 3, in-stream → drop
      q.processAllAvailable()
      // next batch: another reordering of doc 3's bag, inside the
      // watermark horizon → still dropped by stream state
      mem.addData((5L, "v w x y z", ts(2)))
      q.processAllAvailable()
      val ids = spark.table("incdedup").select("doc_id").as[Long].collect().toSet
      assert(ids == Set(3L), s"only the new doc may land, got $ids")
    } finally q.stop()
  }

  test("incremental dedup also runs on a batch frame (backfill path)") {
    val corpus = Seq("a b c d e").toDF("text")
    val index = CorpusStream.corpusIndex(corpus)
    val batch = Seq(
      (1L, "e d c b a", ts(0)),   // bag exists in corpus → drop
      (2L, "x y z w v", ts(0)),   // new → keep
      (3L, "z y x w v", ts(1)))   // same bag as 2 → one of them survives
      .toDF("doc_id", "text", "ts")
    val out = CorpusStream.dedupAgainstCorpus(batch, index, "ts", "10 minutes")
      .select("doc_id").as[Long].collect().toSet
    assert(!out.contains(1L), "corpus-known bag must drop in batch mode")
    assert(out.size == 1 && (out == Set(2L) || out == Set(3L)),
      s"exactly one of the tied bags survives, got $out")
    // clean() / dedupExactWithinWatermark must also accept a batch frame
    // (dropDuplicatesWithinWatermark is streaming-only under the hood)
    val cleaned = CorpusStream.clean(
      Seq((1L, good, ts(0)), (2L, good, ts(1)), (3L, junk, ts(0)))
        .toDF("doc_id", "text", "ts"), "ts", "10 minutes")
      .select("doc_id").as[Long].collect().toSet
    assert(cleaned.size == 1 && !cleaned.contains(3L),
      s"batch clean: one copy of the good doc, junk gated; got $cleaned")
  }

  test("file-arrival ingest: clean docs land in a partitioned lake, dedup state survives restart") {
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.types.StructType
    val srcDir = tmpDir("corpus-in")
    val lake = tmpDir("corpus-lake")
    val ckpt = tmpDir("corpus-ckpt")
    val schema = StructType.fromDDL(
      "doc_id BIGINT, text STRING, source STRING, ts TIMESTAMP")
    def land(batch: Seq[(Long, String, String, Timestamp)], name: String): Unit =
      batch.toDF("doc_id", "text", "source", "ts")
        .coalesce(1).write.mode("append").parquet(srcDir)
    def runOnce(): Unit = {
      val stream = spark.readStream.schema(schema).parquet(srcDir)
      val q = CorpusStream.clean(stream, "ts", "10 minutes")
        .writeStream.format("parquet")
        .option("path", lake).option("checkpointLocation", ckpt)
        .partitionBy("source")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    // arrival 1: good doc (webA), junk doc, good doc (webB)
    land(Seq((1L, good, "webA", ts(0)), (2L, junk, "webA", ts(0)),
      (3L, good + " distinct tail", "webB", ts(1))), "b1")
    runOnce()
    // arrival 2 — a NEW query instance (restart): an exact duplicate of
    // doc 1 inside the watermark horizon plus one fresh doc. The duplicate
    // must be dropped from checkpointed state, not batch-local memory.
    land(Seq((4L, good, "webA", ts(2)), (5L, good + " another tail", "webB", ts(2))), "b2")
    runOnce()
    val landed = spark.read.parquet(lake)
    val ids = landed.select("doc_id").as[Long].collect().toSet
    assert(ids == Set(1L, 3L, 5L), s"lake holds $ids")
    // the lake is physically partitioned by source
    val parts = new java.io.File(lake).listFiles().map(_.getName)
      .filter(_.startsWith("source=")).toSet
    assert(parts == Set("source=webA", "source=webB"), s"partitions: $parts")
    // quality features ride along into the lake
    assert(landed.columns.contains("uniq_ratio"))

    // maintenance: a writeStream-parquet lake is manifest-managed
    // (_spark_metadata pins exact file names) — compaction routes through
    // the manifest-aware protocol (rewrite invisibly, atomically swap the
    // manifest's file list, vacuum originals) with the query stopped.
    // Identical reads, manifest intact, no refusal.
    val before = landed.collect().toSet
    val report = graft.etl.LakeCompaction.compact(spark, lake, 512L * 1024, allowManifested = true)
    assert(report.binsRewritten >= 1, s"nothing compacted: $report")
    assert(spark.read.parquet(lake).collect().toSet == before,
      "post-compaction lake must read identically")
    val fs = new org.apache.hadoop.fs.Path(lake)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new org.apache.hadoop.fs.Path(lake, "_spark_metadata")),
      "the manifest must survive the compaction")
  }

  test("decontaminate drops benchmark-overlapping docs at ingest, stateless") {
    implicit val sc = spark.sqlContext
    val bench = Seq((100L, "b1 b2 b3 b4 b5")).toDF("doc_id", "text")
    val mem = MemoryStream[(Long, String)]
    val out = CorpusStream.decontaminate(mem.toDS().toDF("doc_id", "text"), bench)
    val q = out.writeStream.format("memory").queryName("sdecon")
      .outputMode("append").start()
    try {
      mem.addData(
        (1L, "x1 x2 b1 b2 b3 b4 x3"), // contains benchmark 4-gram → dropped
        (2L, "x1 x2 x3 x4 x5 x6"),    // clean → passes
        (3L, "b1 b2 b3"))             // only a 3-token prefix → passes at k=4
      q.processAllAvailable()
      val ids = spark.table("sdecon").select("doc_id").as[Long].collect().toSet
      assert(ids == Set(2L, 3L), s"got $ids")
    } finally q.stop()
  }

  test("decontaminateLarge keeps exactly what decontaminate keeps (streaming)") {
    implicit val sc = spark.sqlContext
    val bench = Seq((100L, "b1 b2 b3 b4 b5"), (101L, "c1 c2 c3 c4")).toDF("doc_id", "text")
    val fixture = Seq(
      (1L, "x1 x2 b1 b2 b3 b4 x3", ts(0)), // benchmark 4-gram → dropped
      (2L, "x1 x2 x3 x4 x5 x6", ts(0)),    // clean → kept
      (3L, "b1 b2 b3", ts(1)),             // 3-token prefix, no 4-gram → kept
      (4L, "z c1 c2 c3 c4 z", ts(1)),      // second benchmark's 4-gram → dropped
      (5L, "q1 q2", ts(2)))                // too short for any 4-gram → kept
    val mem = MemoryStream[(Long, String, Timestamp)]
    val out = CorpusStream.decontaminateLarge(
      mem.toDS().toDF("doc_id", "text", "ts"), bench, "ts", "10 minutes")
    val q = out.writeStream.format("memory").queryName("sdeconlarge")
      .outputMode("append").start()
    try {
      mem.addData(fixture: _*)
      q.processAllAvailable()
      // append-mode aggregation emits only once the watermark passes the
      // group's event time — push it forward with a late sentinel batch
      mem.addData((99L, "advance the watermark", ts(50)))
      q.processAllAvailable()
      val largeKept = spark.table("sdeconlarge")
        .select("doc_id").as[Long].collect().toSet
      val literalKept = CorpusStream.decontaminate(
        fixture.toDF("doc_id", "text", "ts"), bench)
        .select("doc_id").as[Long].collect().toSet
      assert(largeKept == literalKept,
        s"path divergence: large=$largeKept literal=$literalKept")
      assert(literalKept == Set(2L, 3L, 5L), s"got $literalKept")
    } finally q.stop()
  }

  test("decontaminateLarge batch path: identical keeps incl. NULL-text edge") {
    val bench = Seq((100L, "b1 b2 b3 b4 b5")).toDF("doc_id", "text")
    val fixture = Seq(
      (1L, "x1 x2 b1 b2 b3 b4 x3", ts(0)),
      (2L, "x1 x2 x3 x4 x5 x6", ts(0)),
      (3L, null.asInstanceOf[String], ts(1)), // NULL text: both paths drop
      (4L, "q1 q2", ts(1)))
      .toDF("doc_id", "text", "ts")
    val largeKept = CorpusStream.decontaminateLarge(fixture, bench, "ts", "10 minutes")
      .select("doc_id").as[Long].collect().toSet
    val literalKept = CorpusStream.decontaminate(fixture, bench)
      .select("doc_id").as[Long].collect().toSet
    assert(largeKept == literalKept,
      s"path divergence: large=$largeKept literal=$literalKept")
    assert(largeKept == Set(2L, 4L), s"got $largeKept")
  }

  test("decontaminateBloom: no false negatives, keeps a subset of the exact path, stateless on a stream") {
    implicit val sc = spark.sqlContext
    val bench = Seq((100L, "b1 b2 b3 b4 b5"), (101L, "c1 c2 c3 c4")).toDF("doc_id", "text")
    val fixture = Seq(
      (1L, "x1 x2 b1 b2 b3 b4 x3", ts(0)), // contaminated → MUST drop
      (2L, "x1 x2 x3 x4 x5 x6", ts(0)),
      (3L, "b1 b2 b3", ts(1)),
      (4L, "z c1 c2 c3 c4 z", ts(1)),      // contaminated → MUST drop
      (5L, "q1 q2", ts(2)))
    val batch = fixture.toDF("doc_id", "text", "ts")
    val exact = CorpusStream.decontaminate(batch, bench)
      .select("doc_id").as[Long].collect().toSet
    val bloomKept = CorpusStream.decontaminateBloom(batch, bench)
      .select("doc_id").as[Long].collect().toSet
    // one-sided error: every contaminated doc dropped (no false negatives)
    assert(!bloomKept.contains(1L) && !bloomKept.contains(4L))
    assert(bloomKept.subsetOf(exact), s"bloom=$bloomKept exact=$exact")
    // FP probability at construction ≈ (clean probes)·fpp ≈ 3×10⁻³; the
    // sketch is DETERMINISTIC for fixed inputs/params, so having observed
    // equality once it is stable — re-tuning k/fpp or growing the fixture
    // re-rolls that (small) dice
    assert(bloomKept == exact, s"bloom=$bloomKept exact=$exact")
    // and the probe is stateless on a stream: no watermark, append mode
    val mem = MemoryStream[(Long, String, Timestamp)]
    val out = CorpusStream.decontaminateBloom(
      mem.toDS().toDF("doc_id", "text", "ts"), bench)
    val q = out.writeStream.format("memory").queryName("sbloom")
      .outputMode("append").start()
    try {
      mem.addData(fixture: _*)
      q.processAllAvailable()
      val ids = spark.table("sbloom").select("doc_id").as[Long].collect().toSet
      assert(ids == exact, s"stream bloom=$ids exact=$exact")
    } finally q.stop()
  }

  test("chunkWindows and packShards building blocks run at ingest: the chunker is stateless on a stream") {
    implicit val sc = spark.sqlContext
    // chunkWindows is filter+explode only — no state, no watermark, so it
    // composes directly into an ingest query (chunk-at-ingest is how
    // long-context corpora land pre-chunked in the lake)
    val mem = MemoryStream[(Long, String)]
    val out = graft.operators.CorpusOps.chunkWindows(
      mem.toDS().toDF("doc_id", "text"), "doc_id", 30, 20)
    val q = out.writeStream.format("memory").queryName("schunk")
      .outputMode("append").start()
    try {
      mem.addData(
        (1L, (1 to 50).map(i => s"t$i").mkString(" ")), // 2 chunks
        (2L, null.asInstanceOf[String]))                // dropped
      q.processAllAvailable()
      val rows = spark.table("schunk")
        .select("doc_id", "chunk_idx").as[(Long, Int)].collect().toSet
      assert(rows == Set((1L, 0), (1L, 1)), s"got $rows")
    } finally q.stop()
  }

  test("stream gate thresholds equal the batch q73 gate (parity on the fixture)") {
    // run the batch quality stage and the stream gate over the SAME rows;
    // the survivor sets must agree (q73 then applies dedup+cap on top)
    val rows = Seq(
      (1L, good, "en", "srcA", good.length.toLong),
      (2L, junk, "en", "srcA", junk.length.toLong),
      (3L, (1 to 10).map(i => s"x$i").mkString(" ") + " extra extra extra extra extra extra extra extra",
        "en", "srcA", 0L))
    val dir = tmpDir("scorpus-parity")
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val batchKept = SparkEntry.queries("q73_pipeline_clean")(spark, dir)
      .select("doc_id").as[Long].collect().toSet
    val streamGateKept = CorpusStream.qualityGate(
      spark.read.parquet(s"$dir/documents.parquet"))
      .select("doc_id").as[Long].collect().toSet
    assert(streamGateKept == batchKept,
      s"gate parity broke: stream=$streamGateKept batch=$batchKept")
    // sanity: the repetitive doc 3 (8× "extra") fails BOTH gates
    assert(!streamGateKept.contains(3L))
  }
}
