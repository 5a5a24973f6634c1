package graft.streaming

import graft.SparkSpec
import graft.operators.UnigramLm
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Tokenize-at-ingest: the stateless subword-encode stage must produce
  * identical pieces on a stream and on the same frame as a batch, and the
  * kernels must obey their family's segmentation rule. */
class StreamingTokenizeSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  // singles a..e + two multis; no 'x' so words with it become [UNK]
  private val wp = Seq("a", "b", "c", "d", "e", "##a", "##b", "##c", "##d",
    "##e", "ab", "##cd")

  test("wordpiece: greedy longest-match, [UNK] on uncovered words") {
    val docs = Seq((1L, "abcde cab xe"), (2L, "ab abcd")).toDF("doc_id", "text")
    val out = CorpusStream.tokenizeWordPiece(docs, wp)
      .select("doc_id", "pieces", "n_pieces", "n_unk")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Seq[String]]("pieces"), r.getAs[Long]("n_pieces"),
          r.getAs[Long]("n_unk")))).toMap
    // abcde → ab ##cd ##e; cab → c ##a ##b; xe → [UNK]
    assert(out(1L) == ((Seq("ab", "##cd", "##e", "c", "##a", "##b", "[UNK]"),
      7L, 1L)))
    // ab → ab; abcd → ab ##cd
    assert(out(2L) == ((Seq("ab", "ab", "##cd"), 3L, 0L)))
  }

  test("unigram: Viterbi picks the higher-probability segmentation") {
    // "ab" as one piece (p=.3) beats a(.2)·b(.2)=.04; for "abc" the only
    // covering paths are ab·c (.3·.2) and a·b·c (.008) → ab c
    val model = UnigramLm.Vocab(Seq(
      "a" -> 0.2, "b" -> 0.2, "c" -> 0.2, "ab" -> 0.3))
    val docs = Seq((1L, "ab abc")).toDF("doc_id", "text")
    val out = CorpusStream.tokenizeUnigram(docs, model)
      .select("pieces").as[Seq[String]].head()
    assert(out == Seq("ab", "ab", "c"))
  }

  test("stream ≡ batch: identical pieces per doc, composes after clean()") {
    implicit val sc = spark.sqlContext
    val rows = Seq((1L, "abcde cab", ts(0)), (2L, "ab abcd xe", ts(1)))
    val mem = MemoryStream[(Long, String, Timestamp)]
    val stream = CorpusStream.tokenizeWordPiece(
      mem.toDS().toDF("doc_id", "text", "ts"), wp)
      .select("doc_id", "pieces", "n_pieces", "n_unk")
    val q = stream.writeStream.format("memory").queryName("tokingest")
      .outputMode("append").start()
    try {
      mem.addData(rows: _*)
      q.processAllAvailable()
      val streamed = spark.table("tokingest").collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Seq[String]]("pieces"),
          r.getAs[Long]("n_pieces"), r.getAs[Long]("n_unk"))).toSet
      val batch = CorpusStream.tokenizeWordPiece(
        rows.toDF("doc_id", "text", "ts"), wp)
        .select("doc_id", "pieces", "n_pieces", "n_unk").collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Seq[String]]("pieces"),
          r.getAs[Long]("n_pieces"), r.getAs[Long]("n_unk"))).toSet
      assert(streamed == batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("screenBlocklist: stateless AC screening drops by the q172 thresholds, stream ≡ batch") {
    implicit val sc = spark.sqlContext
    val pats = Seq("bad word", "worse")
    val rows = Seq(
      (1L, "a clean document", ts(0)),            // keep: 0 hits
      (2L, "one bad word here", ts(1)),           // keep: 1 distinct < 2
      (3L, "bad word and worse stuff", ts(2)),    // drop: 2 distinct
      (4L, "worse worse worse worse worse worse worse worse x", ts(3))) // drop: 8 occ
    val batch = CorpusStream.screenBlocklist(
      rows.toDF("doc_id", "text", "ts"), pats)
    val kept = batch.select("doc_id", "bl_hits", "bl_occ").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    assert(kept == Set((1L, 0, 0), (2L, 1, 1)))
    val mem = MemoryStream[(Long, String, Timestamp)]
    val q = CorpusStream.screenBlocklist(
        mem.toDS().toDF("doc_id", "text", "ts"), pats)
      .select("doc_id", "bl_hits", "bl_occ")
      .writeStream.format("memory").queryName("blscreen")
      .outputMode("append").start()
    try {
      mem.addData(rows: _*)
      q.processAllAvailable()
      val streamed = spark.table("blscreen").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
      assert(streamed == kept)
    } finally q.stop()
  }
}
