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

  test("recall under drift: streaming flags are sound vs the batch LSH buckets and component-complete over 4 arrival batches") {
    import graft.Tables
    import org.apache.spark.sql.functions._
    implicit val sc = spark.sqlContext
    // the corpus, split into 4 deterministic arrival batches — the drift
    // scenario: duplicates of early documents keep arriving later
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
      .filter(col("text").isNotNull)
      .as[(Long, String)].collect().sortBy(_._1)
    // batch ground truth: the SAME shingle→minhash→band kernel as
    // nearDupCandidates (k=3 shingles, 16 hashes, band size 4), bucket
    // co-membership pairs with no star reduction or cap
    val banded = Tables.documents(spark, sfDir)
      .filter(col("text").isNotNull)
      .select(col("doc_id"),
        call_function("word_shingles",
          graft.functions.TextFunctions.tokens(col("text")), lit(3)).as("sh"))
      .filter(size(col("sh")) > 0)
      .select(col("doc_id"),
        posexplode(call_function("minhash_bands", col("sh"), lit(16), lit(4)))
          .as(Seq("band_idx", "band_hash")))
      .as[(Long, Int, Long)].collect()
    val coBucket: Set[(Long, Long)] = banded
      .groupBy(r => (r._2, r._3)).values
      .flatMap { rows =>
        val ids = rows.map(_._1).distinct.sorted.toSeq
        for (a <- ids; b <- ids if a < b) yield (a, b)
      }.toSet
    assert(coBucket.nonEmpty, "fixture must produce LSH candidates")

    val mem = MemoryStream[(Long, String)]
    val out = DedupStream.nearDupCandidates(mem.toDS().toDF("doc_id", "text"))
    val q = out.writeStream.format("memory").queryName("sdedup_drift")
      .outputMode("append").start()
    val flags =
      try {
        docs.grouped(math.max(1, docs.length / 4 + 1)).foreach { batch =>
          mem.addData(batch.toIndexedSeq: _*)
          q.processAllAvailable()
        }
        spark.table("sdedup_drift").select("doc_id", "dup_of").distinct()
          .as[(Long, Long)].collect().toSet
      } finally q.stop()

    // soundness: every streaming flag pair really shares a band bucket
    flags.foreach { case (d, rep) =>
      val p = (math.min(d, rep), math.max(d, rep))
      assert(coBucket.contains(p), s"flagged pair $p shares no batch bucket")
    }
    // component recall = 1.0: NoTimeout state never expires, so every
    // batch candidate pair must be connected through the streaming star
    // flags (a bucket's non-first docs all flag against its first-seen
    // representative, whichever arrival batch they came in)
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    def union(a: Long, b: Long): Unit = { parent(find(a)) = find(b) }
    flags.foreach { case (d, rep) => union(d, rep) }
    val missed = coBucket.filterNot { case (a, b) => find(a) == find(b) }
    assert(missed.isEmpty,
      s"${missed.size} batch candidate pairs not connected by streaming flags: ${missed.take(3)}")
    // star shape: with sorted arrival every bucket's first-seen doc is its
    // min id, so a component's min-id doc is a representative everywhere
    // it appears and is never flagged (a component can hold SEVERAL
    // unflagged bucket-minima bridged by a shared member — only the
    // global min is guaranteed)
    val flaggedDocs = flags.map(_._1)
    val compDocs = coBucket.flatMap(p => Seq(p._1, p._2))
    compDocs.groupBy(find).foreach { case (_, members) =>
      assert(!flaggedDocs.contains(members.min),
        "a component's first-arrived (min-id) doc is never flagged")
    }
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
