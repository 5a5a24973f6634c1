package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column builders: tokenization, n-gram shingles, document
  * fingerprints, quality features, a tiny stopword-overlap language scorer.
  * All built-ins / higher-order functions — codegen-friendly, no UDFs.
  */
object TextFunctions {

  /** Shared stopword list (used by quality features and top-word queries). */
  val stopwords: Seq[String] = Seq("the", "a", "to", "of", "and", "in", "is")

  /** Whitespace tokens, lower-cased. */
  def tokens(text: Column): Column = split(lower(text), " ")

  /** Distinct token set (for Jaccard / fingerprints). */
  def tokenSet(text: Column): Column = array_distinct(tokens(text))

  /** OpenRefine-style fingerprint: md5 of the sorted distinct token set.
    * Collisions == same bag of words → near-dup candidates. */
  def fingerprint(text: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(split(lower(text), " ")))))

  /** Word n-gram shingles (n consecutive tokens joined by a space);
    * documents with fewer than n tokens yield an empty array (a bare
    * sequence(1, 0) would DESCEND and index element 0 — a runtime error
    * under ANSI). */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(k => element_at(toks, i + k)): _*)))

  /** Rolling fingerprint over the token stream: a polynomial hash
    * `acc · 31 + h(token) (mod 1e9+7)` where `h` is the first 8 hex digits
    * of md5 — order sensitive, deterministic, and ANSI-overflow-safe
    * (acc < 2³⁰, so acc·31 + h < 2³⁶). Every primitive (md5 hex prefix,
    * modular fold) is engine-independent, so the fingerprint is
    * oracle-checkable: DuckDB mirrors it with
    * `list_reduce(list_prepend(0, list_transform(toks,
    * t -> ('0x' || substr(md5(t),1,8))::BIGINT)), (acc,h) -> …)`.
    * Computed by the native codegen expression [[graft.plans.RollingFp]]
    * (one digest + integer ops per token) rather than an interpreted
    * `aggregate` lambda — RollingFpSpec pins the equivalence of native,
    * HOF, and built-in-conv formulations. */
  def rollingFingerprint(toks: Column): Column =
    call_function("rolling_fp", toks)

  /** Number of tokens from `toks` found in `wordlist` (repeats counted).
    * Native codegen expression (graft.plans.KeywordOverlap): the word list
    * folds to one hash set at plan time and each token is a single probe —
    * replaces the interpreted `size(filter(toks, isin(...)))` lambda that
    * scanned the list per token (q44 runs this 5× per document). */
  def overlap(toks: Column, wordlist: Seq[String]): Column =
    call_function("keyword_overlap", toks, array(wordlist.map(lit): _*))

  /** Tiny per-"language" keyword lists for the n-gram/stopword language-ID
    * heuristic. (The driver corpus is synthetic; the scorer's job is to be a
    * deterministic, scalable shape — per-row array overlap, no shuffle.) */
  val langKeywords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "is", "in"),
    "fr" -> Seq("le", "la", "de", "et", "un", "est", "dans"),
    "es" -> Seq("el", "la", "de", "y", "un", "es", "en"),
    "de" -> Seq("der", "die", "das", "und", "ein", "ist", "in"),
    "zh" -> Seq("的", "是", "在", "和", "了", "有", "我"))

  /** Language guess = argmax keyword overlap (ties → lexicographically LAST
    * language — deterministic), 'und' when nothing matches. */
  def langGuess(toks: Column): Column = {
    val scored = langKeywords.toSeq.sortBy(_._1).map { case (lang, words) =>
      struct(overlap(toks, words).as("score"), lit(lang).as("lang"))
    }
    val best = array_max(array(scored: _*))
    when(best.getField("score") > 0, best.getField("lang")).otherwise(lit("und"))
  }
}
