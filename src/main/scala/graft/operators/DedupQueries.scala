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

  /** Q41 ⚙: MinHash + LSH banding → candidate pairs → exact Jaccard. */
  private val q41: Q = (s, d) => {
    val docs = Tables.documents(s, d).select(
      col("doc_id"), col("source"),
      TextFunctions.shingles(TextFunctions.tokens(col("text")), 3).as("sh"),
      TextFunctions.tokenSet(col("text")).as("w"))
    // minhash signature: for seed k, min over shingles of xxhash64(shingle#k)
    val sigCols = (0 until numHashes).map { k =>
      expr(s"array_min(transform(sh, x -> xxhash64(concat(x, '#$k'))))").as(s"h$k")
    }
    val sigged = docs.select(col("doc_id") +: col("w") +: sigCols: _*)
    // band hash = xxhash64 of the band's 4 minhashes
    val banded = sigged.select(col("doc_id"), col("w"),
      explode(array((0 until numHashes / bandSize).map { bIdx =>
        val cols = (0 until bandSize).map(r => col(s"h${bIdx * bandSize + r}"))
        struct(lit(bIdx).as("band_idx"), xxhash64(cols: _*).as("band_hash"))
      }: _*)).as("band"))
      .select(col("doc_id"), col("w"),
        col("band.band_idx").as("band_idx"), col("band.band_hash").as("band_hash"))
    val a = banded.select(col("doc_id").as("a_id"), col("w").as("a_w"),
      col("band_idx"), col("band_hash"))
    val b = banded.select(col("doc_id").as("b_id"), col("w").as("b_w"),
      col("band_idx").as("b_idx"), col("band_hash").as("b_hash"))
    a.join(b, col("band_idx") === col("b_idx") &&
        col("band_hash") === col("b_hash") && col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"), col("a_w"), col("b_w")).distinct()
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
    // set iff vote > 0. Computed as one fold producing the packed long.
    val sigExpr =
      """aggregate(sequence(0, 63), CAST(0 AS BIGINT),
        |  (acc, i) -> acc + IF(
        |    aggregate(toks, 0, (v, t) -> v + IF((shiftright(xxhash64(t), i) & 1) = 1, 1, -1)) > 0,
        |    shiftleft(CAST(1 AS BIGINT), i), CAST(0 AS BIGINT)))""".stripMargin
    val sigged = Tables.documents(s, d)
      .withColumn("toks", TextFunctions.tokenSet(col("text")))
      .withColumn("simhash", expr(sigExpr))
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
