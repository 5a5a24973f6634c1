package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins [[MarkupStrip]] semantics on explicit fixtures: script/style
  * payloads (with raw `<`, `&&`, braces) vanish wholesale, multi-line
  * comments vanish, tags become word boundaries, entities decode in
  * `&amp;`-last order (no double decode), horizontal whitespace
  * collapses while newlines survive, and template-line mining drops
  * per-source chrome without touching unique content. */
class MarkupStripSpec extends SparkSpec {
  import spark.implicits._

  private def strip(s: String): String =
    Seq(s).toDF("text")
      .select(MarkupStrip.stripMarkup(col("text")).as("s"))
      .head().getString(0)

  test("script/style payloads vanish wholesale, raw < and && included") {
    assert(strip("a<script type=\"x\">if (i < 2 && j > 1) { f(); }</script>b")
      == "a b")
    assert(strip("a<style>p > em { color: #fff }</style>b") == "a b")
    // case-insensitive, multi-line payload
    assert(strip("x<SCRIPT>\nvar y = 1;\n</SCRIPT>y") == "x y")
  }

  test("comments vanish across lines; tags are word boundaries") {
    assert(strip("a<!-- one\ntwo -->b") == "a b")
    assert(strip("a<br>b<div class=\"c\">d</div>") == "a b d")
    assert(strip("<p>hello</p>") == "hello")
  }

  test("entities decode once, &amp; last — &amp;lt; yields literal &lt;") {
    assert(strip("Home &amp; Search &lt;beta&gt;") == "Home & Search <beta>")
    assert(strip("x &amp;lt; y") == "x &lt; y")
    assert(strip("&quot;q&quot; &#39;a&apos; A&nbsp;B") == "\"q\" 'a' A B")
  }

  test("horizontal whitespace collapses; newlines survive; null stays null") {
    assert(strip("a\t\t b\r\nc  d") == "a b \nc d")
    val n = Seq((1, null: String)).toDF("k", "text")
      .select(MarkupStrip.stripMarkup(col("text"))).head()
    assert(n.isNullAt(0))
  }

  test("dropTemplateLines removes per-source chrome, keeps unique content") {
    // 4 docs in source s1 share a footer; doc 5 in s2 has the SAME footer
    // but below threshold there; doc 3's content is entirely template
    val docs = Seq(
      (1L, "s1", "unique one\nfooter nav"),
      (2L, "s1", "unique two\nfooter nav"),
      (3L, "s1", "footer nav"),
      (4L, "s1", "unique four\n  footer nav  \n\n"),
      (5L, "s2", "solo content\nfooter nav")
    ).toDF("doc_id", "source", "text")
    val out = MarkupStrip.dropTemplateLines(docs, minDocs = 3)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(out(1L) == "unique one")
    assert(out(2L) == "unique two")
    assert(out(3L) == "", "all-template doc keeps its row, loses its text")
    assert(out(4L) == "unique four", "trimmed match; blank lines dropped")
    assert(out(5L) == "solo content\nfooter nav",
      "threshold is per-source: s2's footer appears once")
  }

  test("stripMarkup → dropTemplateLines round-trips the q150 synthesis") {
    val docs = graft.Tables.documents(spark, sfDir)
      .filter(col("text").isNotNull).limit(120)
      .select(col("doc_id"), lit("s").as("source"), col("text"))
    val page = concat(
      lit("<head><title>doc</title><script>a < b && c</script></head>\n<p>"),
      col("text"), lit("</p>\n<div>Home &amp; Search</div>"))
    val cleaned = MarkupStrip.dropTemplateLines(
      docs.select(col("doc_id"), col("source"),
        MarkupStrip.stripMarkup(page).as("text")), minDocs = 30)
    // the title and nav lines are template (every doc), so the cleaned
    // text is the original body modulo whitespace collapse
    val joined = cleaned.join(docs.withColumnRenamed("text", "orig"), "doc_id")
      .select(col("clean"),
        trim(regexp_replace(col("orig"), lit("[ \\t\\r\\f]+"), lit(" ")))
          .as("want"))
    assert(joined.filter(col("clean") =!= col("want")).count() == 0)
  }
}
