package graft.operators

import graft.{SparkEntry, SparkSpec}

/** Pins the semantics of the corpus-hygiene queries (q71–q73) on
  * constructed fixtures: exact repetition fractions, span island merging
  * vs splitting, and each pipeline stage's drop reason.
  */
class CorpusQueriesSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(rows: (Long, String)*): String = corpusSrc(
    rows.map { case (id, t) => (id, t, "srcA") }: _*)

  private def corpusSrc(rows: (Long, String, String)*): String = {
    val dir = tmpDir("corpus")
    rows.map { case (id, text, src) => (id, text, "en", src, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q71: exact n-gram repetition fractions") {
    val dir = corpus(
      (1L, "a b a b a"), // g2 = [ab, ba, ab, ba]: 4 total / 2 distinct
      (2L, "x y z"),     // g2 = [xy, yz] distinct; g3 = [xyz]
      (3L, "q"))         // no 2-grams at all
    val rows = SparkEntry.queries("q71_text_repetition")(spark, dir)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_2grams"), r.getAs[Double]("dup_2gram_frac"),
          r.getAs[Double]("dup_3gram_frac"), r.getAs[Double]("top_2gram_frac"))))
      .toMap
    assert(rows(1L) == ((4L, 0.5, 1.0 - 2.0 / 3.0, 0.5)))
    assert(rows(2L) == ((2L, 0.0, 0.0, 0.5)))
    assert(rows(3L) == ((0L, 0.0, 0.0, 0.0)))
  }

  test("q72: covered windows merge when ≤ k apart, split on larger gaps") {
    // doc 1 repeats doc 2's opening 5 tokens at positions 1..5 AND doc 3's
    // 5 tokens at 12..16; the covered starts {1, 12} are 11 apart → 2 spans.
    // doc 4 = two shared 5-blocks back-to-back (starts {1, 6}, exactly k
    // apart) → merged into ONE 10-token span.
    val dir = corpus(
      (1L, "a1 a2 a3 a4 a5 f1 f2 f3 f4 f5 f6 c1 c2 c3 c4 c5"),
      (2L, "a1 a2 a3 a4 a5 g1 g2 g3 g4 g5"),
      (3L, "h1 h2 h3 h4 h5 c1 c2 c3 c4 c5"),
      (4L, "d1 d2 d3 d4 d5 e1 e2 e3 e4 e5"),
      (5L, "d1 d2 d3 d4 d5 i1 i2 i3 i4 i5"),
      (6L, "j1 j2 j3 j4 j5 e1 e2 e3 e4 e5"))
    val rows = SparkEntry.queries("q72_dedup_spans")(spark, dir)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_spans"), r.getAs[Long]("covered_tokens"),
          r.getAs[Double]("span_frac"))))
      .toMap
    assert(rows(1L) == ((2L, 10L, 10.0 / 16.0)))
    assert(rows(4L) == ((1L, 10L, 1.0)))
    // the single-block sharers each get one 5-token span
    assert(rows(2L) == ((1L, 5L, 0.5)) && rows(3L) == ((1L, 5L, 0.5)))
  }

  test("q73: each stage drops its own failure mode") {
    val filler = (1 to 30).map(i => s"w$i").mkString(" ")
    val dupText = s"$filler dup marker"
    val rows =
      // 16 good docs in srcA: the cap (15) must drop exactly one
      (1L to 16L).map(i => (i, s"$filler only$i", "srcA")) ++ Seq(
        (20L, "r r r r r r r r r r", "srcB"),  // uniq_ratio 1/10 → quality drop
        (21L, dupText, "srcB"),                 // exact-dup keeper (min id)
        (22L, dupText, "srcB"),                 // exact-dup loser
        (23L, s"$filler fine", "srcB"))
    val dir = corpusSrc(rows: _*)
    val out = SparkEntry.queries("q73_pipeline_clean")(spark, dir).collect()
    val ids = out.map(_.getAs[Long]("doc_id")).toSet
    assert(!ids.contains(20L), "low-uniqueness doc must fail the quality gate")
    assert(ids.contains(21L) && !ids.contains(22L),
      "exact-dup group keeps only the min doc_id")
    assert(ids.contains(23L))
    assert(out.count(_.getAs[String]("source") == "srcA") == 15,
      "per-domain cap must keep exactly 15 of 16")
    assert(out.forall(_.getAs[Long]("rk") <= 15L))
  }

  test("q74: containment pairs what Jaccard misses, bounded by τ") {
    val big = (1 to 20).map(i => s"t$i").mkString(" ")
    val dir = corpus(
      (1L, big),
      (2L, "t1 t2 t3 t4 t5"),     // ⊂ doc 1: overlap 1.0, jaccard 0.25
      (3L, "t1 t2 t3 u1 u2"))     // inter 3, overlap 0.6 → below τ
    val overlapPairs = SparkEntry.queries("q74_dedup_containment")(spark, dir)
      .collect().map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"),
        r.getAs[Double]("overlap"))).toSet
    assert(overlapPairs == Set((1L, 2L, 1.0)))
    val jaccardPairs = SparkEntry.queries("q37_dedup_jaccard")(spark, dir)
      .collect().map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
    assert(jaccardPairs.isEmpty,
      s"Jaccard τ=0.8 must not see the containment pair: $jaccardPairs")
  }
}
