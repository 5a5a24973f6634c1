package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact τ-Jaccard self-join over token sets, with two interchangeable
  * physical strategies (results are provably identical):
  *
  *  - [[postingsCount]]: explode → equi-join on (block, token) → count
  *    per pair. One shuffle; pair-rows = Σ_token (docs-with-token choose 2).
  *    Wins when the vocabulary is small/flat (each token's posting list is
  *    huge but there's no rare prefix to exploit — e.g. the synthetic
  *    fixtures here).
  *  - [[prefixFilter]] (PPJoin-style): order tokens by ascending global
  *    frequency, index only each set's prefix (nw − ⌈τ·nw⌉ + 1 rarest
  *    tokens), length-filter inside the join, verify candidates exactly.
  *    Wins on realistic Zipfian vocabularies, where prefix postings are
  *    tiny — the strategy that survives 100 TB corpora.
  *
  * Input: (id: bigint, block: string, w: array<string>) — `block` bounds
  * candidate scope (e.g. source, language, shard); `w` must be distinct.
  * Output: (a_id, b_id, jaccard) with a_id < b_id and jaccard ≥ tau,
  * jaccard computed as inter/(na+nb−inter) on exact ints.
  */
object SimilarityJoin {

  def postingsCount(docs: DataFrame, tau: Double): DataFrame = {
    val toks = docs.select(col("id"), col("block"), size(col("w")).as("nw"),
      explode(col("w")).as("tok"))
      .select(col("id"), col("block"), col("nw"), xxhash64(col("tok")).as("token"))
    val a = toks.select(col("id").as("a_id"), col("block"), col("nw").as("na"),
      col("token"))
    val b = toks.select(col("id").as("b_id"), col("block").as("b_block"),
      col("nw").as("nb"), col("token").as("b_token"))
    // length filter inside the join: J ≥ τ requires τ·max(na,nb) ≤ min —
    // prunes cross-size pairs before they ever reach the count aggregation.
    // na/nb ride through the join and come out of the aggregation (constant
    // per pair), so no extra joins back to a sizes relation are needed —
    // one scan, one shuffle, done.
    a.join(b,
        col("block") === col("b_block") && col("token") === col("b_token") &&
          col("a_id") < col("b_id") &&
          // epsilon guards FP rounding of na*tau landing ABOVE an integer
          // bound (would silently prune an exact-boundary pair); errors can
          // only be over-inclusive, and the final jaccard filter is exact
          col("na") * tau <= col("nb") + lit(1e-7) &&
          col("nb") * tau <= col("na") + lit(1e-7))
      // candidate volume = Σ_token C(df,2)-ish — THE postings-join cost
      // driver; surfaced so runs can see an exploding token before it
      // becomes a dead executor (ZipfJaccardSpec compares strategies on it;
      // names are per-strategy so one plan can hold both, e.g. equivalence
      // tests diffing the two)
      .observe("sj_candidates_postings", count(lit(1)).as("candidates"))
      .groupBy("a_id", "b_id")
      .agg(count(lit(1)).as("inter"), max(col("na")).as("na"),
        max(col("nb")).as("nb"))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
      .filter(col("jaccard") >= tau)
      .select("a_id", "b_id", "jaccard")
  }

  def prefixFilter(docs: DataFrame, tau: Double): DataFrame = {
    val freq = docs.select(explode(col("w")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("f"))
    // plain shuffle join on tok: the global token-frequency table is
    // vocabulary-sized (billions of rows on a web corpus), so it must never
    // be broadcast — AQE demotes this to a broadcast join by itself when the
    // vocabulary actually is small (the test fixtures).
    val prefixes = docs
      .select(col("id"), col("block"), explode(col("w")).as("tok"))
      .join(freq, "tok")
      .groupBy("id", "block")
      .agg(expr("transform(array_sort(collect_list(struct(f, tok))), s -> s.tok)")
        .as("sorted_toks"))
      .select(col("id"), col("block"), size(col("sorted_toks")).as("nw"),
        explode(expr(s"slice(sorted_toks, 1, size(sorted_toks) - CAST(ceil($tau * size(sorted_toks)) AS INT) + 1)"))
          .as("ptok"))
    val a = prefixes.select(col("id").as("a_id"), col("block"),
      col("nw").as("na"), col("ptok"))
    val b = prefixes.select(col("id").as("b_id"), col("block").as("b_block"),
      col("nw").as("nb"), col("ptok").as("b_ptok"))
    val cands = a.join(b,
        col("block") === col("b_block") && col("ptok") === col("b_ptok") &&
          col("a_id") < col("b_id") &&
          col("na") * tau <= col("nb") + lit(1e-7) &&
          col("nb") * tau <= col("na") + lit(1e-7))
      // same metric as postingsCount, measured on the prefix-postings join:
      // on Zipfian vocabularies this is the volume the prefix filter saves
      .observe("sj_candidates_prefix", count(lit(1)).as("candidates"))
      .select("a_id", "b_id").distinct()
    // verify: unpivot each candidate pair to two (pair, id) rows and join
    // the token sets ONCE with a plain shuffle join — sets cross the wire
    // once and only for documents in some candidate pair; the corpus is
    // never broadcast (AQE broadcasts the candidate side when it is small).
    val sides = cands.select(col("a_id"), col("b_id"),
      explode(array(col("a_id"), col("b_id"))).as("id"))
    sides.join(docs.select(col("id"), col("w")), "id")
      .groupBy("a_id", "b_id")
      .agg(min_by(col("w"), col("id")).as("a_w"),
        max_by(col("w"), col("id")).as("b_w"))
      .withColumn("inter", size(array_intersect(col("a_w"), col("b_w"))))
      .withColumn("jaccard", col("inter").cast("double") /
        (size(col("a_w")) + size(col("b_w")) - col("inter")))
      .filter(col("jaccard") >= tau)
      .select("a_id", "b_id", "jaccard")
  }
}
