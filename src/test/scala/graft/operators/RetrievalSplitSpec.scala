package graft.operators

import graft.{SparkEntry, SparkSpec}

/** Pins q105 (BM25-family retrieval scoring) and q106 (deterministic
  * stratified split) on constructed fixtures: exact scores recomputed with
  * the same double-op chain, and the split-stability additivity property
  * that makes the hash split leakage-safe across corpus snapshots.
  */
class RetrievalSplitSpec extends SparkSpec {
  import spark.implicits._

  private def writeDocs(dir: String, rows: Seq[(Long, String, String, String)]): Unit =
    rows.map { case (id, text, lang, src) => (id, text, lang, src, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

  // the q105 per-term contribution, in EXACTLY the expression's double-op
  // order — the test is a bit-exact pin, not an approximate one
  private def contrib(tf: Long, df: Long, dl: Long, n: Long, avgdl: Double): Double =
    (n.toDouble - df.toDouble + 0.5) / (df.toDouble + 0.5) *
      ((tf.toDouble * 2.2) /
        (tf.toDouble + 1.2 * (0.25 + 0.75 * (dl.toDouble / avgdl))))

  test("q105: exact BM25-rational scores, term-sorted fold order, no-match docs absent") {
    val dir = tmpDir("bm25")
    writeDocs(dir, Seq(
      (1L, "vector merge f1 f2", "en", "srcA"),   // 2 terms, dl=4
      (2L, "vector vector f1 f2", "en", "srcA"),  // tf=2, dl=4
      (3L, "f1 f2 f3 f4", "en", "srcA"),          // no query terms
      (4L, "vector f1 f2 f3 f4 f5 f6 f7", "en", "srcA"))) // tf=1, dl=8
    val n = 4L; val avgdl = 20.0 / 4 // sum_dl=20 over N=4 docs
    val rows = SparkEntry.queries("q105_text_bm25")(spark, dir)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_terms"), r.getAs[Double]("score")))).toMap
    // df: vector appears in docs 1,2,4 → 3; merge in doc 1 → 1
    assert(rows(1L) == ((2L,
      0.0 + contrib(1, 1, 4, n, avgdl) + contrib(1, 3, 4, n, avgdl))))
    assert(rows(2L) == ((1L, 0.0 + contrib(2, 3, 4, n, avgdl))))
    assert(rows(4L) == ((1L, 0.0 + contrib(1, 3, 8, n, avgdl))))
    assert(!rows.contains(3L), "a doc matching no query term must not score")
    // the rare term (df=1) dominates: doc 1 outranks the tf=2 doc 2
    assert(rows(1L)._2 > rows(2L)._2)
    // tf saturation: tf 1→2 at fixed dl gains less than the first hit
    assert(rows(2L)._2 - contrib(1, 3, 4, n, avgdl) < contrib(1, 3, 4, n, avgdl))
    // length normalization: same tf, longer doc scores lower
    assert(rows(4L)._2 < contrib(1, 3, 4, n, avgdl))
  }

  test("q106: cells partition the corpus and fractions close per stratum") {
    val dir = tmpDir("split")
    writeDocs(dir, (1L to 200L).map(i =>
      (i, s"tok a b c$i", if (i % 2 == 0) "en" else "de", s"src${i % 3}")))
    val cells = SparkEntry.queries("q106_split_stratified")(spark, dir).collect()
    assert(cells.map(_.getAs[Long]("n_docs")).sum == 200L)
    assert(cells.map(_.getAs[Long]("sum_doc_id")).sum == (1L to 200L).sum)
    val byStratum = cells.groupBy(r =>
      (r.getAs[String]("lang"), r.getAs[String]("source")))
    byStratum.values.foreach { cs =>
      assert(math.abs(cs.map(_.getAs[Double]("stratum_frac")).sum - 1.0) < 1e-12)
    }
    // all three splits materialize somewhere at this corpus size
    assert(cells.map(_.getAs[String]("split")).toSet == Set("train", "val", "test"))
  }

  test("q106: assignments are stable under corpus growth (checksum additivity)") {
    // If any doc of A migrated between splits when B's docs arrive, some
    // (lang, source, split) cell's Σdoc_id would deviate from the sum of
    // the separate runs — the membership checksum makes drift visible.
    val a = (1L to 120L).map(i => (i, s"alpha beta g$i", "en", s"src${i % 2}"))
    val b = (121L to 180L).map(i => (i, s"gamma delta g$i", "en", s"src${i % 2}"))
    val dirA = tmpDir("splitA"); val dirB = tmpDir("splitB"); val dirAB = tmpDir("splitAB")
    writeDocs(dirA, a); writeDocs(dirB, b); writeDocs(dirAB, a ++ b)
    def cells(dir: String): Map[(String, String, String), (Long, Long)] =
      SparkEntry.queries("q106_split_stratified")(spark, dir).collect()
        .map(r => (r.getAs[String]("lang"), r.getAs[String]("source"),
          r.getAs[String]("split")) ->
          ((r.getAs[Long]("n_docs"), r.getAs[Long]("sum_doc_id")))).toMap
    val ca = cells(dirA); val cb = cells(dirB); val cab = cells(dirAB)
    assert(cab.keySet == ca.keySet ++ cb.keySet)
    cab.foreach { case (k, (n, s)) =>
      val (na, sa) = ca.getOrElse(k, (0L, 0L))
      val (nb, sb) = cb.getOrElse(k, (0L, 0L))
      assert(n == na + nb && s == sa + sb,
        s"cell $k drifted: ($n,$s) != ($na,$sa)+($nb,$sb)")
    }
  }

  test("q131: Kneser–Ney scores are bit-exact across all four branches") {
    val dir = tmpDir("kneserney")
    writeDocs(dir, Seq(
      (1L, "a b x", "en", "srcA"),   // seen pair + unseen continuation
      (2L, "a b a c", "en", "srcA"), // train
      (3L, "c a b", "en", "srcA"),   // "c a": c SEEN as unigram but never
                                     // starts a training bigram → fert=0
      (4L, "a b d", "en", "srcA"),   // train
      (7L, "x b", "en", "srcA")))    // unseen HISTORY → pure continuation
    // model (even ids): c1 = {a:3, b:2, c:1, d:1};
    // c2 = {"a b":2, "b a":1, "a c":1, "b d":1};
    // fert = {a:2, b:2}; cont = {a:1, b:1, c:1, d:1}; btypes = 4
    val rows = SparkEntry.queries("q131_text_kneser_ney")(spark, dir)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_pairs"), r.getAs[Long]("n_unseen"),
          r.getAs[Double]("score"), r.getAs[Double]("mean_p")))).toMap
    // each p in the query's written op order: discounted term + weight·Pcont
    val pAb = 5.0 / 12.0 + (6.0 / 12.0) * (1.0 / 4.0) // c2=2: (8−3)/12
    val pBx = 0.0 / 8.0 + (6.0 / 8.0) * (0.0 / 4.0)   // unseen pair, x no cont
    val pBa = 1.0 / 8.0 + (6.0 / 8.0) * (1.0 / 4.0)   // c2=1: max(1,0)/8
    val pAc = 1.0 / 12.0 + (6.0 / 12.0) * (1.0 / 4.0)
    val pCa = 0.0 / 4.0 + (0.0 / 4.0) * (1.0 / 4.0)   // fert(c)=0 → 0
    val pXb = 1.0 / 4.0                               // cont(b)/btypes
    val s1 = (0.0 + pAb) + pBx
    val s2 = ((0.0 + pAb) + pBa) + pAc
    val s3 = (0.0 + pCa) + pAb
    val s4 = (0.0 + pAb) + pBa // "b d" scores exactly like "b a" here
    assert(rows(1L) == ((2L, 0L, s1, s1 / 2L)))
    assert(rows(2L) == ((3L, 0L, s2, s2 / 3L)))
    assert(rows(3L) == ((2L, 0L, s3, s3 / 2L)))
    assert(rows(4L) == ((2L, 0L, s4, s4 / 2L)))
    assert(rows(7L) == ((1L, 1L, pXb, pXb)))
    // KN discount: a doubly-seen pair outscores a once-seen pair
    assert(pAb > pAc)
  }

  test("q111: bigram backoff scores are bit-exact; unseen pairs back off, short docs drop") {
    val dir = tmpDir("bigram")
    writeDocs(dir, Seq(
      (1L, "a b x", "en", "srcA"),  // "a b" seen; "b x" unseen, x unseen → 0
      (2L, "a b a c", "en", "srcA"), // train
      (3L, "c a b", "en", "srcA"),  // "c a" unseen (a seen → 0.4·c1(a)/T); "a b" seen
      (4L, "a b d", "en", "srcA"),  // train
      (5L, "z", "en", "srcA")))     // single token: no pairs, absent
    // model (even ids): c1 = {a:3, b:2, c:1, d:1}, T = 7;
    // c2 = {"a b":2, "b a":1, "a c":1, "b d":1}
    val rows = SparkEntry.queries("q111_text_bigram_backoff")(spark, dir)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_pairs"), r.getAs[Long]("n_backoff"),
          r.getAs[Double]("score"), r.getAs[Double]("mean_p")))).toMap
    val s1 = 0.0 + 2.0 / 3.0 + 0.4 * (0.0 / 7.0)
    val s2 = 0.0 + 2.0 / 3.0 + 1.0 / 2.0 + 1.0 / 3.0
    val s3 = 0.0 + 0.4 * (3.0 / 7.0) + 2.0 / 3.0
    val s4 = 0.0 + 2.0 / 3.0 + 1.0 / 2.0
    assert(rows(1L) == ((2L, 1L, s1, s1 / 2L)))
    assert(rows(2L) == ((3L, 0L, s2, s2 / 3L)))
    assert(rows(3L) == ((2L, 1L, s3, s3 / 2L)))
    assert(rows(4L) == ((2L, 0L, s4, s4 / 2L)))
    assert(!rows.contains(5L), "a pairless doc must not score")
    // in-model text scores above out-of-model text of the same length
    assert(rows(2L)._4 > rows(1L)._4)
  }
}
