package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** DedupStream: ingestion-time near-dup flagging with cross-micro-batch
  * state (the streaming twin of batch q41's candidate generation). */
class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  private val textA = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
  private val textA2 = "alpha beta gamma delta epsilon zeta eta theta iota lambda"
  private val textB = "completely different words about some other topic entirely here now"

  test("near-dups are flagged as they arrive, across micro-batches") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val out = DedupStream.nearDupCandidates(mem.toDS().toDF("doc_id", "text"))
    val q = out.writeStream.format("memory").queryName("sdedup")
      .outputMode("append").start()
    try {
      // batch 1: an in-batch duplicate (2 of 1) and an unrelated doc
      mem.addData((1L, textA), (2L, textA), (5L, textB))
      q.processAllAvailable()
      // batch 2: a near-dup of doc 1 arrives later; doc 9 is fresh
      mem.addData((7L, textA2), (9L, textB + " with extra trailing words appended"))
      q.processAllAvailable()
      val flagged = spark.table("sdedup")
        .select("doc_id", "dup_of").distinct()
        .as[(Long, Long)].collect().toSet
      assert(flagged.contains(2L -> 1L), s"in-batch duplicate: $flagged")
      assert(flagged.contains(7L -> 1L), s"cross-batch near-dup: $flagged")
      assert(!flagged.exists(_._1 == 5L), s"unrelated doc flagged: $flagged")
      assert(!flagged.exists(_._1 == 1L), "the representative itself is never flagged")
    } finally q.stop()
  }

  test("short documents (<3 tokens, no shingles) are never flagged against each other") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val out = DedupStream.nearDupCandidates(mem.toDS().toDF("doc_id", "text"))
    val q = out.writeStream.format("memory").queryName("sdedup3")
      .outputMode("append").start()
    try {
      mem.addData((1L, "hi"), (2L, "totally unrelated"), (3L, "ok then"))
      q.processAllAvailable()
      assert(spark.table("sdedup3").count() == 0,
        "unrelated short docs share no real shingle bucket")
    } finally q.stop()
  }

  test("representatives persist in state: a bucket's first doc wins forever") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val out = DedupStream.nearDupCandidates(mem.toDS().toDF("doc_id", "text"))
    val q = out.writeStream.format("memory").queryName("sdedup2")
      .outputMode("append").start()
    try {
      mem.addData((10L, textA))
      q.processAllAvailable()
      // a SMALLER id arriving later is still flagged against the earlier rep
      mem.addData((3L, textA))
      q.processAllAvailable()
      val flagged = spark.table("sdedup2")
        .select("doc_id", "dup_of").distinct()
        .as[(Long, Long)].collect().toSet
      assert(flagged == Set(3L -> 10L), s"got $flagged")
    } finally q.stop()
  }
}

/** PackStream: ingest-time shard packing with one long of state per
  * source — continuity across micro-batches and first-batch parity with
  * the batch q91 operator. */
class PackStreamSpec extends graft.SparkSpec {
  import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
  import spark.implicits._

  test("shards keep filling across micro-batches; first batch matches the batch operator") {
    implicit val sc = spark.sqlContext
    def doc(i: Long, n: Int, src: String) =
      (i, (1 to n).map(j => s"w$j").mkString(" "), src)
    val b1 = Seq(doc(1, 30, "srcA"), doc(2, 30, "srcA"), doc(3, 30, "srcA"))
    val b2 = Seq(doc(4, 30, "srcA"), doc(5, 30, "srcB"))
    val mem = MemoryStream[(Long, String, String)]
    val out = PackStream.packShards(
      mem.toDS().toDF("doc_id", "text", "source"), budget = 50L)
    val q = out.writeStream.format("memory").queryName("spack")
      .outputMode("append").start()
    try {
      mem.addData(b1: _*)
      q.processAllAvailable()
      val first = spark.table("spack")
        .select("doc_id", "shard").as[(Long, Long)].collect().toMap
      // parity: an empty-state first batch ≡ the batch operator
      val batchRef = graft.operators.CorpusOps.packShards(
        b1.toDF("doc_id", "text", "source"), "doc_id", 50L)
        .select("doc_id", "shard").as[(Long, Long)].collect().toMap
      assert(first == batchRef, s"stream=$first batch=$batchRef")
      // 3 docs × 30 tokens at budget 50: starts 0/30/60 → shards 0,0,1
      assert(first.values.toSeq.sorted == Seq(0L, 0L, 1L))
      mem.addData(b2: _*)
      q.processAllAvailable()
      val all = spark.table("spack")
        .select("doc_id", "source", "shard").as[(Long, String, Long)]
        .collect().map(r => r._1 -> ((r._2, r._3))).toMap
      // srcA resumed at cum=90: doc 4 starts at 90 → shard 1 (not 0!)
      assert(all(4L) == ("srcA", 1L), s"got ${all(4L)}")
      // srcB starts fresh → shard 0
      assert(all(5L) == ("srcB", 0L), s"got ${all(5L)}")
    } finally q.stop()
  }
}
