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
