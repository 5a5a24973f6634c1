package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** Pins [[CorpusOps.redact]] with the standard [[CorpusOps.PiiRules]] on
  * constructed text: every rule's matches and deliberate non-matches, the
  * counts-on-original-text contract, rule-order chaining, and null
  * propagation. The declared q81 runs the same operator with
  * corpus-matching rules under the DuckDB oracle; this spec covers the
  * real PII patterns the driver corpus cannot exercise (it has no digits).
  */
class PiiRedactSpec extends SparkSpec {
  import spark.implicits._

  private def redactOne(text: String): (String, Long, Long, Long) = {
    val r = CorpusOps.redact(
      Seq((1L, text)).toDF("doc_id", "text"), CorpusOps.PiiRules)
      .select("redacted", "n_email", "n_phone", "n_ipv4").collect().head
    (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))
  }

  test("each PII rule redacts its shape and counts it") {
    assert(redactOne("mail john.doe+spam@example.co.uk today") ==
      (("mail [EMAIL] today", 1L, 0L, 0L)))
    assert(redactOne("call 555-123-4567 or 555.987.6543 now") ==
      (("call [PHONE] or [PHONE] now", 0L, 2L, 0L)))
    assert(redactOne("host 192.168.0.1 gateway 10.0.0.254") ==
      (("host [IP] gateway [IP]", 0L, 0L, 2L)))
  }

  test("non-matches survive: bare words, short digit runs, dotted abbreviations") {
    assert(redactOne("at example.com v1.2 build 12-34 x") ==
      (("at example.com v1.2 build 12-34 x", 0L, 0L, 0L)))
  }

  test("mixed text applies every rule; counts are measured on the original text") {
    val (red, e, p, i) =
      redactOne("a@b.io pinged 10.1.2.3 then dialed 555-000-1111")
    assert(red == "[EMAIL] pinged [IP] then dialed [PHONE]")
    assert((e, p, i) == ((1L, 1L, 1L)))
  }

  test("null text propagates as null redaction and null counts") {
    val r = CorpusOps.redact(
      Seq((1L, null: String)).toDF("doc_id", "text"), CorpusOps.PiiRules)
      .collect().head
    assert(r.isNullAt(r.fieldIndex("redacted")) &&
      r.isNullAt(r.fieldIndex("n_email")))
  }

  test("q81 corpus binding: redacted text never contains a scrubbed term") {
    val dir = tmpDir("redact")
    Seq((1L, "the customer met the spark customer", "en", "srcA", 35L),
      (2L, "no match here", "en", "srcA", 13L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = graft.SparkEntry.queries("q81_text_redact")(spark, dir)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(rows(1L).getAs[String]("redacted") ==
      "the [NAME] met the [ORG] [NAME]")
    assert(rows(1L).getAs[Long]("n_name") == 2L &&
      rows(1L).getAs[Long]("n_org") == 1L)
    assert(rows(2L).getAs[Long]("n_name") == 0L)
  }
}
