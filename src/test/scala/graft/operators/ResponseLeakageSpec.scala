package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q193 core ([[CorpusOps.responseLeakage]]): constructed leaked and clean
  * (prompt, response) pairs against a constructed pretraining corpus —
  * the semantic invariants the driver hash can't express. */
class ResponseLeakageSpec extends SparkSpec {
  import spark.implicits._

  // pretraining corpus: two documents with known content
  private def corpus = Seq(
    (1L, "alpha beta gamma delta epsilon zeta eta theta"),
    (2L, "one two three four five six seven eight nine ten"))
    .toDF("doc_id", "text")

  private def probe(pairs: Seq[(Long, String)]) =
    CorpusOps.responseLeakage(pairs.toDF("pair_id", "resp"), corpus, "pair_id")
      .orderBy("pair_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(4))) // (id, n_sh, n_leaked, is_leaked)

  test("fully-leaked, partially-leaked and clean responses score exactly") {
    val rows = probe(Seq(
      // verbatim corpus span: every 4-shingle leaks (5 tokens → 2 shingles)
      10L -> "alpha beta gamma delta epsilon",
      // half-leaked: 4 corpus tokens then 4 novel ones (5 shingles, 1 hit)
      20L -> "one two three four nova vela lyra crux",
      // clean: no 4-gram appears in the corpus
      30L -> "red blue green yellow purple"))
    assert(rows.toSeq == Seq(
      (10L, 2L, 2L, true),   // 2/2 leaked ⇒ flagged
      (20L, 5L, 1L, true),   // 1·5 ≥ 5 ⇒ exactly at the 20% boundary
      (30L, 2L, 0L, false)))
  }

  test("repeated leaked shingles count per POSITION, not per distinct value") {
    // "one two three four one two three four" = 5 shingle positions; the
    // positions 1 and 5 are the same corpus 4-gram — both must count
    val rows = probe(Seq(40L -> "one two three four one two three four"))
    assert(rows.toSeq == Seq((40L, 5L, 2L, true)))
  }

  test("leakage is directional: corpus-internal duplication is irrelevant") {
    // a response sharing tokens but no 4-gram with the corpus stays clean
    val rows = probe(Seq(50L -> "alpha two gamma four epsilon six"))
    assert(rows.toSeq == Seq((50L, 3L, 0L, false)))
  }

  test("q193 declared query: verdicts are consistent and src0-only") {
    val df = graft.SparkEntry.queries("q193_sft_contamination")(spark, sfDir)
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nSh = r.getAs[Long]("n_resp_shingles")
      val nLeaked = r.getAs[Long]("n_leaked")
      assert(nSh >= 2, "clean pairs have ≥5 response tokens ⇒ ≥2 shingles")
      assert(nLeaked >= 0 && nLeaked <= nSh)
      assert(r.getAs[Boolean]("is_leaked") == (nLeaked * 5 >= nSh))
      assert(math.abs(r.getAs[Double]("leak_frac") -
        nLeaked.toDouble / nSh) == 0.0)
    }
  }
}
