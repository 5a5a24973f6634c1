package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML/markup boilerplate stripping — the text-extraction step every
  * web-crawl corpus runs BEFORE any quality rule (the trafilatura/
  * jusText stage): remove script/style payloads, comments and tags,
  * decode the common entities, collapse horizontal whitespace, then
  * drop per-source TEMPLATE lines (nav bars, footers, cookie banners —
  * chrome repeated across a site's pages) by document-frequency mining.
  * Feeds the existing hygiene chain: q115's Gopher rules, q116's
  * repetition collapse, q73's cleaning pipeline all assume markup-free
  * text; q93 MINES boilerplate n-grams — this is the operator that
  * REMOVES the structural kind.
  *
  * Determinism contract: every pattern sits in the Java∩RE2 regex
  * intersection (the q81 redaction convention — no backrefs, no
  * lookaround, inline (?is) flags only), entity decoding is plain
  * string replacement in a fixed order (`&amp;` LAST, so `&amp;lt;`
  * single-decodes to `&lt;` — never double-decodes), and template
  * mining uses exact integer distinct-counts. DuckDB mirrors the whole
  * chain op-for-op (q150).
  *
  * Scale shape: [[stripMarkup]] is a pure per-row column expression —
  * codegen'd regexp/replace chains, zero shuffle, runs AT THE SCAN.
  * [[dropTemplateLines]] adds one grouped distinct-count over trimmed
  * lines (bounded by distinct line content per source — template lines
  * are by definition few and repeated; unique body lines aggregate at
  * count 1 and map-side-combine absorbs them) and one anti-join of the
  * line table against the (small) template set, then a per-doc window
  * regroup. No stage touches more than the exploded line table.
  */
object MarkupStrip {

  /** `(?is)` script/style blocks: tag + attributes + PAYLOAD + closing
    * tag — the payload is code, not text, and may contain raw `<`/`&`
    * (q150's fixture does), so it must go before generic tag removal. */
  private[operators] val scriptPat = "(?is)<script\\b[^>]*>.*?</script\\s*>"
  private[operators] val stylePat = "(?is)<style\\b[^>]*>.*?</style\\s*>"
  private[operators] val commentPat = "(?s)<!--.*?-->"
  private[operators] val tagPat = "<[^>]+>"

  /** Decode order is load-bearing: `&amp;` last (see class doc). */
  private[operators] val entities: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&#39;" -> "'",
    "&apos;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")

  /** Strip markup from a text column: script/style/comment payloads and
    * all tags become spaces (a tag boundary is a word boundary — `a<br>b`
    * must not fuse to `ab`), entities decode, horizontal whitespace
    * collapses to single spaces. NEWLINES SURVIVE — they are the line
    * structure [[dropTemplateLines]] mines; callers that want one-line
    * text compose with their own collapse. Null text stays null. */
  def stripMarkup(text: Column): Column = {
    val noScript = regexp_replace(text, lit(scriptPat), lit(" "))
    val noStyle = regexp_replace(noScript, lit(stylePat), lit(" "))
    val noComment = regexp_replace(noStyle, lit(commentPat), lit(" "))
    val noTags = regexp_replace(noComment, lit(tagPat), lit(" "))
    val decoded = entities.foldLeft(noTags) { case (c, (e, r)) =>
      replace(c, lit(e), lit(r))
    }
    trim(regexp_replace(decoded, lit("[ \\t\\r\\f]+"), lit(" ")))
  }

  /** Drop template lines: a trimmed non-empty line occurring in at least
    * `minDocs` DISTINCT documents of the same `source` is chrome and is
    * removed from every document. Returns (doc_id, source, clean) with
    * `clean` the surviving trimmed lines rejoined by `\n` (empty string
    * when every line was template/blank — the q109 full-copy convention:
    * the row survives, its content does not). Input needs
    * (doc_id, source, text). */
  def dropTemplateLines(docs: DataFrame, minDocs: Long): DataFrame = {
    require(minDocs >= 2, s"minDocs must be >= 2: $minDocs")
    val lines = docs
      .select(col("doc_id"), col("source"),
        posexplode(split(col("text"), "\n")).as(Seq("ln", "line")))
      .withColumn("norm", trim(col("line")))
      .filter(col("norm") =!= "")
    val tpl = lines.groupBy("source", "norm")
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= minDocs)
      .select(col("source"), col("norm"))
    val kept = lines.join(tpl, Seq("source", "norm"), "left_anti")
      .groupBy("doc_id")
      .agg(concat_ws("\n", expr(
        "transform(array_sort(collect_list(struct(ln, norm))), s -> s.norm)"))
        .as("clean"))
    docs.select(col("doc_id"), col("source"))
      .join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"), col("source"),
        coalesce(col("clean"), lit("")).as("clean"))
  }
}
