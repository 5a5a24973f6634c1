package graft.streaming

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming near-duplicate detection — the ingestion-time twin of the batch
  * MinHash+LSH pipeline (DedupQueries q41): every incoming document's band
  * hashes are checked against the buckets seen SO FAR, so mass-duplicated
  * content is flagged as it arrives instead of in a nightly batch job. The
  * intersection of the reference's domain (streaming ingest) and the
  * training-data north star (dedup before the corpus lands).
  *
  * Emission semantics mirror the batch star-reduction: per band bucket the
  * first-seen document becomes the representative, and every later document
  * in that bucket emits one (doc_id, dup_of=representative, band_idx) row —
  * O(1) per arrival, never a quadratic pair expansion. A pair surfacing
  * through k bands emits k rows (band_idx disambiguates); downstream either
  * distincts the pairs or exact-verifies them with the same one-shot set
  * join as the batch path.
  *
  * Scale shape: state is ONE long (the representative id) per distinct
  * (band_idx, band_hash) bucket — linear in corpus bands, constant per
  * document, and RocksDB-backed via the usual state-store provider conf for
  * corpora whose band universe exceeds executor heap.
  *
  * Recall vs the batch pipeline (spec-pinned, StreamingDedupSpec "recall
  * under drift"): state uses NoTimeout, so buckets never expire and a
  * duplicate is flagged no matter how many micro-batches separate it from
  * its representative — streaming flags are SOUND (every flagged pair
  * shares a batch band bucket) and component-COMPLETE (every batch LSH
  * candidate pair is connected through the streaming star flags).
  * Unbounded retention is the price; a deployment that instead bounds
  * state with a TTL/watermark horizon re-introduces the
  * [[CorpusStream.dedupExactWithinWatermark]] trade — dups farther apart
  * than the horizon are missed and the nightly batch sweep (q41) remains
  * the backstop.
  */
object DedupStream {

  /** @param docs streaming DataFrame with (doc_id: bigint, text: string)
    * @return streaming (doc_id, dup_of, band_idx): `doc_id` shares
    *         `band_idx`'s MinHash band bucket with earlier-seen `dup_of`
    */
  def nearDupCandidates(docs: DataFrame, numHashes: Int = 16,
                        bandSize: Int = 4): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // docs under 3 tokens have NO shingles, and minhash_bands of an empty
    // array is the same constant signature for every such doc — without
    // this filter all short content would flag against one arbitrary
    // representative (and pile into one permanent hot state bucket)
    val banded = docs.select(col("doc_id"),
      call_function("word_shingles", TextFunctions.tokens(col("text")), lit(3))
        .as("sh"))
      .filter(size(col("sh")) > 0)
      .select(col("doc_id"),
        posexplode(call_function("minhash_bands", col("sh"),
          lit(numHashes), lit(bandSize))).as(Seq("band_idx", "band_hash")))
      .as[(Long, Int, Long)]
    banded
      .groupByKey { case (_, idx, hash) => (idx, hash) }
      .flatMapGroupsWithState[Long, (Long, Long, Int)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case ((bandIdx, _), rows, state: GroupState[Long]) =>
          // within one micro-batch the bucket's arrivals sort by doc_id so
          // the representative choice is deterministic under re-execution
          val ids = rows.map(_._1).toSeq.distinct.sorted
          val rep = state.getOption.getOrElse(ids.head)
          if (!state.exists) state.update(rep)
          ids.filter(_ != rep).map(d => (d, rep, bandIdx)).iterator
      }
      .toDF("doc_id", "dup_of", "band_idx")
  }
}

/** Ingest-time shard packing — the streaming twin of batch q91
  * ([[graft.operators.CorpusOps.packShards]]): arriving documents are laid
  * into fixed-token-budget training shards per source, with ONE long of
  * state per source (its cumulative token count), so shards keep filling
  * across micro-batches and a restart resumes mid-shard from the
  * checkpoint. Within a micro-batch arrivals order by (md5(id), id) — the
  * batch path's deterministic shuffle — so re-execution of a batch
  * reassigns identically; ACROSS batches the order is arrival order, the
  * streaming-inherent difference from the batch form (which md5-orders the
  * whole corpus at once). The first micro-batch over an empty state is
  * bit-identical to [[graft.operators.CorpusOps.packShards]] on the same
  * rows (spec-pinned).
  */
object PackStream {

  /** @param docs streaming (or batch) frame with (doc_id, source, text)
    * @return (doc_id, source, n_tok, shard) — shard = the budget bucket
    *         the doc's running start offset falls in, per source */
  def packShards(docs: org.apache.spark.sql.DataFrame,
      budget: Long): org.apache.spark.sql.DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val keyed = docs.filter(col("text").isNotNull)
      .select(col("doc_id"), col("source"),
        size(TextFunctions.tokens(col("text"))).cast("long").as("n_tok"),
        md5(col("doc_id").cast("string")).as("o"))
      .as[(Long, String, Long, String)]
    keyed.groupByKey(_._2)
      .flatMapGroupsWithState[Long, (Long, String, Long, Long)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (source, rows, state: GroupState[Long]) =>
          var cum = state.getOption.getOrElse(0L)
          val out = rows.toSeq.sortBy(r => (r._4, r._1)).map { r =>
            val shard = cum / budget
            cum += r._3
            (r._1, source, r._3, shard)
          }
          state.update(cum)
          out.iterator
      }
      .toDF("doc_id", "source", "n_tok", "shard")
  }
}
