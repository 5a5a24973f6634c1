package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Unigram language-model tokenizer TRAINING on Spark [Kudo 2018,
  * "Subword Regularization: Improving Neural Network Translation Models
  * with Multiple Subword Candidates", §3; the SentencePiece unigram
  * model] — the third production tokenizer family beside
  * [[BpeTrainer]] (merge-list) and WordPiece (greedy vocab matching):
  * pieces carry PROBABILITIES, segmentation is the Viterbi argmax over
  * the lattice, and training is EM over a large seed vocabulary with
  * periodic pruning down to the target size.
  *
  * Scale shape (the [[BpeTrainer]] decomposition applied to EM):
  *  - the corpus is touched ONCE — everything folds to the distinct-word
  *    frequency table (Heaps' law keeps it sublinear in corpus size);
  *  - the E-step is ONE job per iteration: the native `unigram_expected`
  *    kernel computes each word's forward–backward expected piece counts
  *    in a single pass (the model rides into the plan as ONE array
  *    literal — the broadcast-model move of q126's classifier, never a
  *    join), and a partial-agg groupBy folds them to vocabulary-sized
  *    totals. No per-merge iteration exists at all: a full EM round is
  *    2 jobs regardless of vocabulary size — cheaper per round than
  *    even `trainBatched`'s pass discipline;
  *  - the vocabulary itself is driver-sized by definition (seedSize
  *    rows, like [[IvfStorage]]'s centroid table), so M-step + pruning
  *    are driver arithmetic.
  *
  * Determinism (the fit is partitioning-independent, spec-pinned): the
  * kernel's per-word expected counts are fixed double chains in
  * position/length order; each word's contribution is scaled by its
  * BIGINT frequency and cast to DECIMAL(38,15) BEFORE the cross-word
  * sum, so aggregation order cannot perturb the totals (the q90/q124
  * exact-sum discipline — `sum(double)` over a shuffle is
  * order-nondeterministic, `sum(decimal)` is exact); ranking/pruning
  * breaks ties by piece string. M-step probabilities are one
  * double-from-decimal conversion and one IEEE division each.
  *
  * Pruning follows the standard practical simplification of Kudo §3.2's
  * likelihood-loss criterion: drop the lowest-expected-count fraction
  * each round (single characters are never dropped — they are the
  * coverage floor that keeps every word segmentable), re-running EM
  * between rounds. [[UnigramLmSpec]] pins the trainer against an
  * independent plain-Scala EM implementation and the encode kernel
  * against an independent Viterbi; q149 oracles the encode end-to-end.
  */
object UnigramLm {

  /** A trained unigram model: (piece → probability), probabilities
    * summing to ~1 over the vocabulary. Ordered by (piece) for
    * determinism of the literal the kernels consume. */
  final case class Vocab(pieces: Seq[(String, Double)]) {
    require(pieces.nonEmpty, "empty unigram vocabulary")
    /** The model as the one foldable literal the native kernels take. */
    def lit: Column = typedlit(pieces)
  }

  private def liveWords(docs: DataFrame): DataFrame =
    docs.filter(col("text").isNotNull)
      .select(explode(TextFunctions.tokens(col("text"))).as("tok"))
      .filter(length(col("tok")) >= 1)
      .groupBy("tok").agg(count(lit(1)).as("freq"))

  /** Seed vocabulary: all substrings of length 1..maxPieceLen of the
    * corpus's distinct words, counted with word-frequency weights; the
    * top `seedSize` multi-char candidates by (count DESC, piece ASC)
    * plus EVERY single character (the coverage floor). Driver-sized
    * output by construction. */
  def seedVocab(docs: DataFrame, maxPieceLen: Int = 6,
      seedSize: Int = 2000): Seq[(String, Long)] = {
    require(maxPieceLen >= 1 && seedSize >= 1,
      s"maxPieceLen=$maxPieceLen seedSize=$seedSize")
    val words = liveWords(docs)
    val subs = words.select(col("freq"), explode(expr(
      s"""flatten(transform(sequence(1, length(tok)),
         |  i -> transform(sequence(1, least($maxPieceLen, length(tok) - i + 1)),
         |    l -> substring(tok, i, l))))""".stripMargin)).as("piece"))
      .groupBy("piece").agg(sum(col("freq")).as("cnt"))
    val singles = subs.filter(length(col("piece")) === 1)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val multis = subs.filter(length(col("piece")) > 1)
      .orderBy(col("cnt").desc, col("piece"))
      .limit(seedSize)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    (singles ++ multis).sortBy(_._1).toSeq
  }

  /** One EM round over the distinct-word table: E-step = the
    * `unigram_expected` kernel + a DECIMAL-exact weighted groupBy
    * (2 Spark jobs); M-step = driver normalization. Returns
    * (piece → expected count as double) for every piece with nonzero
    * posterior mass. */
  private def emCounts(words: DataFrame, vocab: Vocab): Map[String, BigDecimal] =
    words.select(col("freq"),
        explode(call_function("unigram_expected", col("tok"), vocab.lit))
          .as("pe"))
      .select(col("pe.piece").as("piece"),
        (col("pe.e") * col("freq")).cast(DecimalType(38, 15)).as("c"))
      .groupBy("piece").agg(sum(col("c")).as("c"))
      .collect()
      .map(r => r.getString(0) -> BigDecimal(r.getDecimal(1)))
      .toMap

  private def normalize(counts: Seq[(String, BigDecimal)]): Vocab = {
    val total = counts.map(_._2).sum
    require(total > 0, "EM collapsed: zero total expected count")
    val t = total.toDouble
    Vocab(counts.sortBy(_._1)
      .map { case (p, c) => (p, c.toDouble / t) })
  }

  /** Train a unigram model: seed → EM → prune → EM → … until the
    * vocabulary is at most `vocabSize` (single chars always survive).
    * `shrink` is the fraction of prunable pieces dropped per round. */
  def train(docs: DataFrame, vocabSize: Int, maxPieceLen: Int = 6,
      seedSize: Int = 2000, emIters: Int = 2,
      shrink: Double = 0.25): Vocab = {
    require(vocabSize >= 1 && emIters >= 1 && shrink > 0 && shrink < 1,
      s"vocabSize=$vocabSize emIters=$emIters shrink=$shrink")
    val words = liveWords(docs).localCheckpoint(true)
    val seed = seedVocab(docs, maxPieceLen, seedSize)
    val seedTotal = seed.map(_._2).sum.toDouble
    var vocab = Vocab(seed.map { case (p, c) => (p, c.toDouble / seedTotal) })
    var finished = false
    while (!finished) {
      var counts: Map[String, BigDecimal] = Map.empty
      var it = 0
      while (it < emIters) {
        counts = emCounts(words, vocab)
        // pieces with zero posterior mass drop out of the model
        vocab = normalize(counts.toSeq)
        it += 1
      }
      if (vocab.pieces.size <= vocabSize) finished = true
      else {
        val (singles, multis) = vocab.pieces.partition(_._1.length == 1)
        val targetMultis = math.max(vocabSize - singles.size,
          (multis.size * (1 - shrink)).toInt)
        if (targetMultis >= multis.size) {
          // shrink cannot make progress (all survivors are singles)
          vocab = normalize(
            (singles ++ multis.sortBy { case (p, pr) => (-pr, p) }
              .take(math.max(0, vocabSize - singles.size)))
              .map { case (p, pr) => (p, BigDecimal(pr)) })
          finished = true
        } else {
          val kept = singles ++ multis
            .sortBy { case (p, pr) => (-pr, p) }.take(targetMultis)
          vocab = normalize(kept.map { case (p, pr) => (p, BigDecimal(pr)) })
        }
      }
    }
    vocab
  }

  /** Corpus ENCODE — the q148/q100 dictionary-join decomposition:
    * segment each DISTINCT word once through the native `unigram_encode`
    * Viterbi kernel, join back to token positions, reassemble per doc.
    * Output: (doc_id, sp array<string>). Per-word cost is paid per
    * distinct word (Heaps-sublinear), never per occurrence. */
  def encodeViaDictionary(docs: DataFrame, vocab: Vocab): DataFrame = {
    val live = docs.filter(col("text").isNotNull)
    val dict = live
      .select(explode(TextFunctions.tokens(col("text"))).as("tok"))
      .distinct()
      .withColumn("sp", call_function("unigram_encode", col("tok"), vocab.lit))
    live.select(col("doc_id"),
        posexplode(TextFunctions.tokens(col("text"))).as(Seq("pos", "tok")))
      .join(dict, "tok")
      .groupBy("doc_id")
      .agg(expr(
        "flatten(transform(array_sort(collect_list(struct(pos, sp))), s -> s.sp))")
        .as("sp"))
  }
}
