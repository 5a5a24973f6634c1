package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the unigram-LM tokenizer family ([[UnigramLm]] +
  * `unigram_encode`/`unigram_expected`) against INDEPENDENT references
  * built on full segmentation ENUMERATION — exponential-in-word-length
  * math that shares no code path (and no iteration order) with the
  * kernels' DP/forward–backward:
  *
  *  - Viterbi encode: the kernel's segmentation must achieve the
  *    enumeration's maximum product; pinned fixtures cover the exact-tie
  *    tie-break, probability-beats-longest, UNK and empty edges.
  *  - E-step expected counts: posterior piece masses from enumeration
  *    (Σ_seg count·P(seg)/Z) match the kernel's α/β lattice within
  *    1e-9 relative (different summation orders — tolerance, not bits).
  *  - EM training: [[UnigramLm.train]] over a corpus small enough that
  *    the seed keeps every substring reproduces the reference EM's
  *    probabilities within 1e-9, and is bit-identical across input
  *    partitionings (the DECIMAL-sum discipline).
  */
class UnigramLmSpec extends SparkSpec {
  import spark.implicits._

  private def enumerate(word: String,
      vocab: Map[String, Double]): Seq[Seq[String]] = {
    val maxLen = if (vocab.isEmpty) 0 else vocab.keys.map(_.length).max
    def rec(pos: Int): Seq[Seq[String]] =
      if (pos == word.length) Seq(Seq.empty)
      else (1 to math.min(maxLen, word.length - pos)).flatMap { l =>
        val piece = word.substring(pos, pos + l)
        if (vocab.contains(piece)) rec(pos + l).map(piece +: _)
        else Seq.empty
      }
    rec(0)
  }

  private def refExpected(word: String,
      vocab: Map[String, Double]): Map[String, Double] = {
    val segs = enumerate(word, vocab)
    if (segs.isEmpty) Map.empty
    else {
      val probs = segs.map(_.map(vocab).product)
      val z = probs.sum
      val mass = scala.collection.mutable.Map[String, Double]()
      segs.zip(probs).foreach { case (seg, p) =>
        seg.foreach(piece =>
          mass(piece) = mass.getOrElse(piece, 0.0) + p / z)
      }
      mass.toMap
    }
  }

  // the q149 fixture model: 25 singles (no 'q') at 2, multis at 40,
  // 'stream' trapped at 1
  private val fixtureNums: Seq[(String, Long)] = TextQueries.ugVocab
  private val fixture: Map[String, Double] = {
    val t = fixtureNums.map(_._2).sum.toDouble
    fixtureNums.map { case (p, n) => p -> (n.toDouble / t) }.toMap
  }
  private def fixtureVocab = UnigramLm.Vocab(fixture.toSeq.sortBy(_._1))

  private def encode(words: Seq[String]): Map[String, Seq[String]] =
    words.toDF("w")
      .select(col("w"), call_function("unigram_encode", col("w"),
        fixtureVocab.lit).as("sp"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap

  test("unigram_encode achieves the enumeration optimum; pinned edges") {
    val words = Seq("stream", "sort", "agg", "customer", "query", "",
      "data", "sostream", "aggg", "streamsort")
    val got = encode(words)
    for (w <- words if w.nonEmpty) {
      val segs = enumerate(w, fixture)
      if (segs.isEmpty)
        assert(got(w) == Seq("[UNK]"), s"'$w' should be [UNK]: ${got(w)}")
      else {
        val best = segs.map(_.map(fixture).product).max
        assert(got(w).mkString == w, s"'$w' pieces must respell the word")
        val kernelScore = got(w).map(fixture).product
        assert(kernelScore == best,
          s"'$w': kernel ${got(w)} score $kernelScore != optimum $best")
      }
    }
    // the distinguishing unigram behavior: probability beats longest match
    assert(got("stream") == Seq("st", "ream"))
    // high-probability whole piece beats its split
    assert(got("sort") == Seq("sort"))
    // exact double tie (p(ag)·p(g) ≡ p(a)·p(gg)) → shortest final piece
    assert(got("agg") == Seq("ag", "g"))
    assert(got("query") == Seq("[UNK]"))
    assert(got("") == Seq.empty)
  }

  test("unigram_encode null word → null; non-foldable vocab rejected") {
    val nulls = Seq((1, null: String)).toDF("k", "w")
      .select(call_function("unigram_encode", col("w"), fixtureVocab.lit))
      .collect()
    assert(nulls.head.isNullAt(0))
    val err = intercept[Exception] {
      Seq(("x", Seq(("x", 1.0)))).toDF("w", "v")
        .select(call_function("unigram_encode", col("w"), col("v")))
        .collect()
    }
    assert(err.getMessage.contains("foldable"), err.getMessage)
  }

  test("unigram_expected ≡ enumeration posterior masses (1e-9 relative)") {
    val words = Seq("stream", "agg", "customer", "data", "query", "",
      "sostream", "tablerow")
    val got = words.toDF("w")
      .select(col("w"), call_function("unigram_expected", col("w"),
        fixtureVocab.lit).as("pe"))
      .collect()
      .map(r => r.getString(0) ->
        r.getSeq[org.apache.spark.sql.Row](1)
          .map(x => x.getString(0) -> x.getDouble(1)).toMap)
      .toMap
    for (w <- words) {
      val want = refExpected(w, fixture)
      val have = got(w)
      assert(have.keySet == want.keySet, s"'$w' piece sets differ")
      for ((p, e) <- want) {
        val rel = math.abs(have(p) - e) / math.max(1e-300, math.abs(e))
        assert(rel < 1e-9, s"'$w'/$p: ${have(p)} vs $e")
      }
      // sanity: total posterior mass = expected piece count ≥ 1 for
      // segmentable non-empty words
      if (want.nonEmpty)
        assert(have.values.sum > 0.999)
    }
  }

  // tiny corpus where maxPieceLen=3/seedSize=1000 keeps EVERY substring,
  // so the reference seed is trivially identical
  private val corpus = Seq.fill(6)("aba") ++ Seq.fill(4)("bab") ++
    Seq.fill(3)("abab") ++ Seq.fill(2)("ba") ++ Seq.fill(5)("ab")

  private def refSeed(wordFreq: Map[String, Long],
      maxPieceLen: Int): Map[String, Double] = {
    val counts = scala.collection.mutable.Map[String, Long]()
    wordFreq.foreach { case (w, f) =>
      for (i <- 0 until w.length;
           l <- 1 to math.min(maxPieceLen, w.length - i)) {
        val p = w.substring(i, i + l)
        counts(p) = counts.getOrElse(p, 0L) + f
      }
    }
    val t = counts.values.sum.toDouble
    counts.map { case (p, c) => p -> (c.toDouble / t) }.toMap
  }

  private def refEm(wordFreq: Map[String, Long],
      vocab0: Map[String, Double], iters: Int): Map[String, Double] = {
    var v = vocab0
    for (_ <- 1 to iters) {
      val counts = scala.collection.mutable.Map[String, Double]()
      wordFreq.foreach { case (w, f) =>
        refExpected(w, v).foreach { case (p, e) =>
          counts(p) = counts.getOrElse(p, 0.0) + e * f
        }
      }
      val tot = counts.values.sum
      v = counts.map { case (p, c) => p -> c / tot }.toMap
    }
    v
  }

  test("train ≡ reference EM on an all-substrings seed (1e-9 relative)") {
    val wordFreq = corpus.groupBy(identity)
      .map { case (w, ws) => w -> ws.size.toLong }
    val docs = Seq(corpus.mkString(" ")).toDF("text")
      .withColumn("doc_id", lit(1L))
    val got = UnigramLm.train(docs, vocabSize = 1000, maxPieceLen = 3,
      seedSize = 1000, emIters = 3).pieces.toMap
    val want = refEm(wordFreq, refSeed(wordFreq, 3), iters = 3)
    assert(got.keySet == want.keySet,
      s"vocab sets differ: ${got.keySet} vs ${want.keySet}")
    for ((p, pr) <- want) {
      val rel = math.abs(got(p) - pr) / pr
      assert(rel < 1e-9, s"$p: ${got(p)} vs $pr")
    }
  }

  test("train is bit-identical across input partitionings") {
    val docs = corpus.zipWithIndex
      .map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
    val a = UnigramLm.train(docs.repartition(1), vocabSize = 8,
      maxPieceLen = 3, seedSize = 10, emIters = 2).pieces
    val b = UnigramLm.train(docs.repartition(7, col("doc_id")), vocabSize = 8,
      maxPieceLen = 3, seedSize = 10, emIters = 2).pieces
    assert(a == b)
  }

  test("pruning keeps single chars (coverage floor) and the model still covers the corpus") {
    val docs = corpus.zipWithIndex
      .map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
    val v = UnigramLm.train(docs, vocabSize = 3, maxPieceLen = 3,
      seedSize = 100, emIters = 1)
    val pieces = v.pieces.map(_._1).toSet
    assert(Set("a", "b").subsetOf(pieces), s"singles pruned: $pieces")
    val enc = UnigramLm.encodeViaDictionary(docs, v)
    assert(enc.filter(array_contains(col("sp"), "[UNK]")).count() == 0)
    assert(enc.count() == docs.count())
  }

  test("encodeViaDictionary ≡ inline per-word kernel (row identity)") {
    val docs = graft.Tables.documents(spark, sfDir)
      .filter(col("text").isNotNull).limit(200)
    val viaDict = UnigramLm.encodeViaDictionary(docs, fixtureVocab)
      .select(col("doc_id"), concat_ws(" ", col("sp")).as("s"))
    val inline = docs.select(col("doc_id"),
        posexplode(graft.functions.TextFunctions.tokens(col("text")))
          .as(Seq("pos", "tok")))
      .withColumn("sp", call_function("unigram_encode", col("tok"),
        fixtureVocab.lit))
      .groupBy("doc_id")
      .agg(concat_ws(" ", expr(
        "flatten(transform(array_sort(collect_list(struct(pos, sp))), s -> s.sp))"))
        .as("s"))
    assert(viaDict.except(inline).isEmpty && inline.except(viaDict).isEmpty)
  }
}
