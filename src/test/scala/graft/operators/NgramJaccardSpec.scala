package graft.operators

import graft.{SparkEntry, SparkSpec}

/** q67 (shingle Jaccard) vs q37 (token Jaccard) semantics: shingles see
  * word order, token sets do not. */
class NgramJaccardSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(rows: (Long, String)*): String = {
    val dir = tmpDir("ngram")
    rows.map { case (id, text) => (id, text, "en", "webA", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def pairs(query: String, dir: String): Set[(Long, Long)] =
    SparkEntry.queries(query)(spark, dir).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet

  test("a one-word edit pairs under both; a full reorder pairs only under tokens") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val edited = "alpha beta gamma delta epsilon zeta eta theta iota lambda"
    val reordered = "kappa iota theta eta zeta epsilon delta gamma beta alpha"
    val dir = corpus((1L, base), (2L, edited), (3L, reordered))
    val tokenPairs = pairs("q37_dedup_jaccard", dir)
    val shinglePairs = pairs("q67_dedup_ngram_jaccard", dir)
    // tokens: (1,2) differ in 1 of 11 distinct tokens (J=9/11≥0.8);
    // (1,3) identical token sets (J=1)
    assert(tokenPairs.contains(1L -> 2L) && tokenPairs.contains(1L -> 3L))
    // shingles: the edit keeps 7 of 8 shingles shared prefix (J=7/9≥0.5);
    // the reorder shares NO 3-gram shingle with the original
    assert(shinglePairs.contains(1L -> 2L))
    assert(!shinglePairs.exists { case (a, b) => b == 3L || a == 3L },
      s"reordered doc must not shingle-pair: $shinglePairs")
  }

  test("documents under 3 tokens are excluded, not erroring") {
    val dir = corpus((1L, "one two"), (2L, "one two"), (3L, "x y z w"), (4L, "x y z w"))
    assert(pairs("q67_dedup_ngram_jaccard", dir) == Set(3L -> 4L))
  }
}
