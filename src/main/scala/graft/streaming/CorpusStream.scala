package graft.streaming

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming corpus hygiene — the ingestion-time twin of the batch cleaning
  * pipeline (CorpusQueries q73): gate quality per-row and drop exact
  * duplicates AS DOCUMENTS ARRIVE, so dirty/duplicated content never lands
  * in the lake at all (the reference's whole architecture is
  * filter-on-ingest, StreamingEtl.java:87-149 — this applies the same stance
  * to corpus quality).
  *
  * Stage shapes and their streaming-scale contracts:
  *
  *  - [[qualityGate]] is stateless per-row column math (the q45/q71
  *    signals) — no state store, no watermark requirement, safe on any
  *    unbounded stream.
  *  - [[dedupExactWithinWatermark]] keys state on a 128-bit content hash
  *    and bounds it with `dropDuplicatesWithinWatermark`: state holds only
  *    hashes younger than the watermark, so an unbounded stream cannot
  *    accumulate unbounded dedup state. The trade is explicit and mirrors
  *    every production dedup-at-ingest: a duplicate arriving farther apart
  *    than the watermark delay is NOT caught (the batch q35/q73 pass
  *    remains the periodic full-history sweep).
  *  - near-dup flagging at ingest is [[DedupStream.nearDupCandidates]] —
  *    composes after the gate on the same stream.
  */
object CorpusStream {

  /** Default thresholds match batch q73 so a doc passing the stream gate
    * passes the batch gate and vice versa (parity is spec-pinned). */
  val MinUniqRatio = 0.35
  val MaxDup2gramFrac = 0.10

  private def dup2gramFrac(toks: Column): Column = {
    val g2 = call_function("word_shingles", toks, lit(2))
    when(size(g2) === 0, 0.0)
      .otherwise(lit(1.0) - size(array_distinct(g2)).cast("double") / size(g2))
  }

  /** Per-row quality gate over a streaming (or batch) DataFrame with a
    * `text` column: keeps rows with uniq_ratio ≥ [[MinUniqRatio]] and
    * dup-2-gram fraction ≤ [[MaxDup2gramFrac]], carrying both features in
    * the output for downstream routing/metrics. */
  def qualityGate(docs: DataFrame,
      minUniq: Double = MinUniqRatio,
      maxDup2: Double = MaxDup2gramFrac): DataFrame = {
    val toks = TextFunctions.tokens(col("text"))
    docs
      .withColumn("uniq_ratio",
        size(array_distinct(toks)).cast("double") / size(toks))
      .withColumn("dup_2gram_frac", dup2gramFrac(toks))
      .filter(col("uniq_ratio") >= minUniq && col("dup_2gram_frac") <= maxDup2)
  }

  /** Exact-dedup on content hash with watermark-bounded state: the first
    * document bearing a given md5(lower(trim(text))) within the watermark
    * horizon passes; later copies are dropped. `eventTimeCol` must be the
    * stream's event-time column (the watermark is applied here if the
    * input does not already carry one). */
  def dedupExactWithinWatermark(docs: DataFrame, eventTimeCol: String,
      delay: String): DataFrame = {
    val withMark =
      if (docs.isStreaming) docs.withWatermark(eventTimeCol, delay) else docs
    withMark
      .withColumn("content_h", md5(lower(trim(col("text")))))
      .dropDuplicatesWithinWatermark("content_h")
      .drop("content_h")
  }

  /** The composed ingest-hygiene pipeline: quality gate → watermarked
    * exact dedup. Returns the cleaned stream with the quality features
    * attached. */
  def clean(docs: DataFrame, eventTimeCol: String, delay: String): DataFrame =
    dedupExactWithinWatermark(qualityGate(docs), eventTimeCol, delay)
}
