package graft.operators

import graft.Tables
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

/** Scale-path near-duplicate detection: MinHash+LSH and SimHash (SURVEY §2B
  * Q35 ⚙ / training-data-pipeline dedup). Both are engine-only (⚙): their
  * guarantees are probabilistic, verified by ScalaTest property tests
  * (Jaccard estimate bounds, Hamming vs cosine of token sets) rather than a
  * row-hash oracle.
  *
  * Shape notes for 100 TB:
  *  - signatures are computed per-row with codegen'd higher-order functions
  *    (no UDF, no shuffle);
  *  - candidate generation is ONE shuffle on (band_idx, band_hash) — never an
  *    all-pairs join;
  *  - exact Jaccard is only computed for candidate pairs (tiny).
  */
object DedupQueries extends QueryGroup {

  private val numHashes = 16
  private val bandSize = 4 // 4 bands × 4 rows

  /** Q41 ⚙: MinHash + LSH banding → candidate pairs → exact Jaccard.
    *
    * Perf shape: each shingle string is hashed to a long ONCE; the k minhash
    * functions are integer-only re-hashes (xxhash64(seed, h)) of that long —
    * k× cheaper than k string hashes per shingle, and the whole signature
    * computation is per-row codegen with no shuffle. */
  private val q41: Q = (s, d) => {
    val docs = Tables.documents(s, d).select(
      col("doc_id"), col("source"),
      call_function("word_shingles",
        TextFunctions.tokens(col("text")), lit(3)).as("sh"),
      TextFunctions.tokenSet(col("text")).as("w"))
    // native one-pass signature+banding (graft.plans.MinHashBands); only
    // (doc_id, band) goes through the shuffle — token arrays never do.
    val banded = docs.select(col("doc_id"),
      posexplode(call_function("minhash_bands", col("sh"),
        lit(numHashes), lit(bandSize))).as(Seq("band_idx", "band_hash")))
    val a = banded.select(col("doc_id").as("a_id"), col("band_idx"), col("band_hash"))
    val b = banded.select(col("doc_id").as("b_id"),
      col("band_idx").as("b_idx"), col("band_hash").as("b_hash"))
    val cands = a.join(b, col("band_idx") === col("b_idx") &&
        col("band_hash") === col("b_hash") && col("a_id") < col("b_id"))
      .select("a_id", "b_id").distinct()
    // exact-verify candidates only (tiny) against the token sets
    val sets = docs.select(col("doc_id"), col("w"))
    cands
      .join(broadcast(sets.select(col("doc_id").as("a_id"), col("w").as("a_w"))), "a_id")
      .join(broadcast(sets.select(col("doc_id").as("b_id"), col("w").as("b_w"))), "b_id")
      .withColumn("jaccard",
        size(array_intersect(col("a_w"), col("b_w"))).cast("double") /
          size(array_union(col("a_w"), col("b_w"))))
      .select("a_id", "b_id", "jaccard")
      .orderBy("a_id", "b_id")
  }

  /** Q42 ⚙: SimHash signatures + near-pairs by Hamming distance within a
    * source block. 64-bit signature built from per-token hash bit votes. */
  private val q42: Q = (s, d) => {
    // bit i vote = Σ_tokens (bit i of xxhash64(token) ? +1 : -1); sig bit i
    // set iff vote > 0 — computed by the native graft.plans.SimHash64
    // expression (one string hash per token + 64 integer ops, inside
    // whole-stage codegen).
    val sigged = Tables.documents(s, d)
      .withColumn("simhash",
        call_function("simhash64", TextFunctions.tokenSet(col("text"))))
      .select("doc_id", "source", "simhash")
    val a = sigged.select(col("doc_id").as("a_id"), col("source"),
      col("simhash").as("a_sig"))
    val b = sigged.select(col("doc_id").as("b_id"), col("source").as("b_source"),
      col("simhash").as("b_sig"))
    a.join(b, col("source") === col("b_source") && col("a_id") < col("b_id"))
      .withColumn("hamming", expr("bit_count(a_sig ^ b_sig)").cast("long"))
      .filter(col("hamming") <= 16)
      .select("a_id", "b_id", "hamming")
      .orderBy("a_id", "b_id")
  }

  val queries: Seq[(String, Q)] = Seq(
    "q41_dedup_minhash_lsh" -> q41,
    "q42_dedup_simhash" -> q42,
  )

  val oracles: Map[String, String] = Map.empty
}
