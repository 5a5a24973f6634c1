package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Unigram language-model subword segmentation [Kudo 2018, "Subword
  * Regularization"; the SentencePiece unigram model] — the THIRD
  * production tokenizer family beside the BPE merge-fold
  * ([[BpeMergePair]]) and WordPiece greedy matching ([[WordPieceEncode]]).
  * Each vocabulary piece carries a probability; a word's tokenization is
  * the segmentation maximizing the PRODUCT of piece probabilities,
  * found by Viterbi DP over the segmentation lattice.
  *
  * Determinism contract (the q148/q95 discipline): probabilities arrive
  * as doubles already computed by the caller (one `num/denom` IEEE
  * division per piece — mirrored textually in the q149 oracle); every DP
  * cell is a fixed chain of double multiplies and strict `>` compares in
  * position/length iteration order, so an engine replaying the same
  * recurrence (DuckDB's recursive-CTE mirror) lands on bit-identical
  * scores and the identical argmax path. Ties (equal double scores)
  * break to the SHORTEST final piece — the first candidate found when
  * scanning lengths ascending — which the oracle mirrors as a
  * struct-max over (score, -len).
  *
  * Failure semantics match [[WordPieceEncode]]: a word with no full
  * segmentation (some character absent from the vocabulary) becomes one
  * whole-word `[UNK]`; the empty word is the empty segmentation.
  *
  * Position/length semantics are UTF-16 code units (ASCII/BMP corpora
  * for oracle parity — the BpeTrainer contract).
  */
final class UnigramVocab(index: java.util.HashMap[String, java.lang.Double],
    maxLen: Int) extends Serializable {

  private val unkOut = new GenericArrayData(Array[Any](UnigramImpl.Unk))

  /** Viterbi best segmentation (see class doc for the exact recurrence
    * and tie-break). */
  def encode(word: UTF8String): ArrayData = {
    val s = word.toString
    val n = s.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    // best(i) = score of the best segmentation of s[0..i); back(i) = its
    // final-piece start. Unreachable cells stay at 0.0 (all real scores
    // are products of positive probabilities).
    val best = new Array[Double](n + 1)
    val back = new Array[Int](n + 1)
    best(0) = 1.0
    var i = 1
    while (i <= n) {
      var l = 1
      val lmax = math.min(i, maxLen)
      var bi = 0.0
      var bj = -1
      while (l <= lmax) {
        val j = i - l
        if (best(j) > 0.0) {
          val p = index.get(s.substring(j, i))
          if (p != null) {
            val cand = best(j) * p.doubleValue()
            if (cand > bi) { bi = cand; bj = j }
          }
        }
        l += 1
      }
      best(i) = bi
      back(i) = bj
      i += 1
    }
    if (best(n) == 0.0) return unkOut
    // walk backpointers; pieces come out reversed
    val pieces = new java.util.ArrayList[AnyRef]
    var pos = n
    while (pos > 0) {
      val j = back(pos)
      pieces.add(UTF8String.fromString(s.substring(j, pos)))
      pos = j
    }
    java.util.Collections.reverse(pieces)
    new GenericArrayData(pieces.toArray.asInstanceOf[Array[Any]])
  }

  /** Forward–backward EXPECTED piece counts over the segmentation
    * lattice — the Kudo EM E-step: for each occurrence of piece q at
    * span (j, i), its posterior mass is α(j)·p(q)·β(i)/Z with
    * Z = α(n); the per-word result sums mass per distinct piece in
    * first-occurrence order. Unsegmentable or empty words return the
    * empty array (they contribute nothing to the M-step — the
    * SentencePiece convention). Driver-facing doubles: the trainer
    * ([[graft.operators.UnigramLm]]) converts each per-word
    * contribution to DECIMAL before the cross-word sum so the fit is
    * partitioning-independent. */
  def expected(word: UTF8String): ArrayData = {
    val s = word.toString
    val n = s.length
    val empty = new GenericArrayData(Array.empty[Any])
    if (n == 0) return empty
    val alpha = new Array[Double](n + 1)
    val beta = new Array[Double](n + 1)
    alpha(0) = 1.0
    var i = 1
    while (i <= n) {
      var l = 1
      val lmax = math.min(i, maxLen)
      var acc = 0.0
      while (l <= lmax) {
        val j = i - l
        if (alpha(j) > 0.0) {
          val p = index.get(s.substring(j, i))
          if (p != null) acc += alpha(j) * p.doubleValue()
        }
        l += 1
      }
      alpha(i) = acc
      i += 1
    }
    val z = alpha(n)
    if (z == 0.0) return empty
    beta(n) = 1.0
    var j = n - 1
    while (j >= 0) {
      var l = 1
      val lmax = math.min(n - j, maxLen)
      var acc = 0.0
      while (l <= lmax) {
        val e = j + l
        if (beta(e) > 0.0) {
          val p = index.get(s.substring(j, e))
          if (p != null) acc += p.doubleValue() * beta(e)
        }
        l += 1
      }
      beta(j) = acc
      j -= 1
    }
    // accumulate posterior mass per piece, keyed in first-occurrence order
    val order = new java.util.ArrayList[String]
    val mass = new java.util.HashMap[String, java.lang.Double]
    j = 0
    while (j < n) {
      if (alpha(j) > 0.0) {
        var l = 1
        val lmax = math.min(n - j, maxLen)
        while (l <= lmax) {
          val e = j + l
          val piece = s.substring(j, e)
          val p = index.get(piece)
          if (p != null && beta(e) > 0.0) {
            val m = alpha(j) * p.doubleValue() * beta(e) / z
            val prev = mass.get(piece)
            if (prev == null) { order.add(piece); mass.put(piece, m) }
            else mass.put(piece, prev.doubleValue() + m)
          }
          l += 1
        }
      }
      j += 1
    }
    val rows = new Array[Any](order.size())
    var k = 0
    while (k < order.size()) {
      val piece = order.get(k)
      rows(k) = InternalRow(UTF8String.fromString(piece),
        mass.get(piece).doubleValue())
      k += 1
    }
    new GenericArrayData(rows)
  }
}

object UnigramImpl {

  private[plans] val Unk = UTF8String.fromString("[UNK]")

  val expectedSchema: DataType = ArrayType(StructType(Seq(
    StructField("piece", StringType, nullable = false),
    StructField("e", DoubleType, nullable = false))), containsNull = false)

  def build(arr: ArrayData): UnigramVocab = {
    val index = new java.util.HashMap[String, java.lang.Double]
    var maxLen = 0
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val row = arr.getStruct(i, 2)
        if (!row.isNullAt(0) && !row.isNullAt(1)) {
          val piece = row.getUTF8String(0).toString
          val p = row.getDouble(1)
          if (piece.nonEmpty && p > 0.0) {
            index.put(piece, p)
            maxLen = math.max(maxLen, piece.length)
          }
        }
      }
      i += 1
    }
    new UnigramVocab(index, maxLen)
  }
}

private[plans] trait UnigramExpressionBase extends BinaryExpression {

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(st: StructType, _))
          if st.length == 2 && st(0).dataType == StringType &&
            st(1).dataType == DoubleType && right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (StringType, ArrayType(st: StructType, _))
          if st.length == 2 && st(0).dataType == StringType &&
            st(1).dataType == DoubleType =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires the vocab to be a foldable literal " +
            "(the index is built once per plan)")
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, array<struct<string, double>>), " +
          s"got (${left.dataType.simpleString(40)}, " +
          s"${right.dataType.simpleString(40)})")
    }

  @transient protected lazy val vocab: UnigramVocab = {
    val arr = right.eval(null)
    require(arr != null, s"$prettyName: vocab literal must not be null")
    UnigramImpl.build(arr.asInstanceOf[ArrayData])
  }
}

/** unigram_encode(word string, vocab array<struct<piece string, p double>>
  * LITERAL) → array<string>: the Viterbi segmentation (see
  * [[UnigramVocab.encode]]), `['[UNK]']` when none exists, `[]` for the
  * empty word. Never null for a non-null word, so plain nullSafeCodeGen
  * is sound. */
case class UnigramEncode(left: Expression, right: Expression)
    extends UnigramExpressionBase {

  override def prettyName: String = "unigram_encode"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(w: Any, v: Any): Any =
    vocab.encode(w.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ugVocab", vocab,
      classOf[UnigramVocab].getName)
    nullSafeCodeGen(ctx, ev, (w, _) => s"${ev.value} = $ref.encode($w);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** unigram_expected(word string, vocab array<struct<piece string,
  * p double>> LITERAL) → array<struct<piece string, e double>>: the EM
  * E-step's per-word expected piece counts (see
  * [[UnigramVocab.expected]]); empty for unsegmentable/empty words. */
case class UnigramExpected(left: Expression, right: Expression)
    extends UnigramExpressionBase {

  override def prettyName: String = "unigram_expected"
  override def dataType: DataType = UnigramImpl.expectedSchema

  override def nullSafeEval(w: Any, v: Any): Any =
    vocab.expected(w.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ugVocab", vocab,
      classOf[UnigramVocab].getName)
    nullSafeCodeGen(ctx, ev, (w, _) => s"${ev.value} = $ref.expected($w);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
