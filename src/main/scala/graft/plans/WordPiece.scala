package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Greedy longest-match-first subword segmentation — the WordPiece
  * algorithm [Wu et al. 2016, §4.1; the BERT tokenizer]: from the current
  * position, take the LONGEST vocabulary piece that matches (continuation
  * positions match pieces carrying the `##` prefix); if no piece matches,
  * the ENTIRE word becomes `[UNK]` (the reference implementations' word-
  * level failure semantics, not a per-character fallback). The complement
  * to [[BpeMergePair]]'s merge-fold encoding: WordPiece needs only the
  * vocabulary, not the merge history.
  *
  * The vocabulary is pre-indexed ONCE per expression instance (a hash set
  * plus max initial/continuation piece lengths that bound the backward
  * scan), so per-word cost is O(len · maxPieceLen) hash probes — which is
  * why the vocab argument must be a foldable literal: a per-row vocab
  * would rebuild the index per row.
  *
  * Position/length semantics are UTF-16 code units (Java String), which
  * coincide with DuckDB's code-point semantics on ASCII/BMP text — the
  * same contract as BpeTrainer's tie-break order (ASCII corpora only for
  * oracle parity).
  */
/** The pre-built vocab index referenced from generated code (top-level so
  * the class name is valid Java source inside codegen).
  */
final class WordPieceVocab(initSet: java.util.HashSet[String],
    contSet: java.util.HashSet[String], maxInit: Int,
    maxCont: Int) extends Serializable {

    def encode(word: UTF8String): ArrayData = {
      val s = word.toString
      val n = s.length
      if (n == 0) return new GenericArrayData(Array.empty[Any])
      val out = new java.util.ArrayList[AnyRef]
      var pos = 0
      while (pos < n) {
        val isInit = pos == 0
        val cap = if (isInit) maxInit else maxCont
        var end = math.min(n, pos + cap)
        var piece: String = null
        // initial positions probe ONLY the non-## piece set: a word that
        // literally begins with "##" must not match a continuation piece
        // (the oracle's NOT LIKE '##%' initial lookup — kept in lockstep)
        while (end > pos && piece == null) {
          val cand =
            if (isInit) s.substring(pos, end)
            else "##" + s.substring(pos, end)
          val hit = if (isInit) initSet.contains(cand) else contSet.contains(cand)
          if (hit) piece = cand else end -= 1
        }
        if (piece == null) {
          return new GenericArrayData(Array[Any](WordPieceImpl.Unk))
        }
        out.add(UTF8String.fromString(piece))
        pos = end
      }
      new GenericArrayData(out.toArray.asInstanceOf[Array[Any]])
    }
}

object WordPieceImpl {

  private[plans] val Unk = UTF8String.fromString("[UNK]")

  def build(arr: ArrayData): WordPieceVocab = {
    val initSet = new java.util.HashSet[String]
    val contSet = new java.util.HashSet[String]
    var maxInit = 0
    var maxCont = 0
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val p = arr.getUTF8String(i).toString
        if (p.startsWith("##")) {
          contSet.add(p)
          maxCont = math.max(maxCont, p.length - 2)
        } else {
          initSet.add(p)
          maxInit = math.max(maxInit, p.length)
        }
      }
      i += 1
    }
    new WordPieceVocab(initSet, contSet, maxInit, maxCont)
  }
}

/** wordpiece_encode(word string, vocab array<string> LITERAL)
  * → array<string> of pieces (continuations keep their `##` marker), or
  * `['[UNK]']` when no segmentation exists. Never returns a null array
  * for a non-null word (empty word → empty array), so plain
  * nullSafeCodeGen is sound (the minhash_bands_md5 rule does not apply).
  */
case class WordPieceEncode(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "wordpiece_encode"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(StringType, _)) if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (StringType, ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires the vocab to be a foldable literal " +
            "(the index is built once per plan)")
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, array<string>), got " +
          s"(${left.dataType.simpleString(40)}, " +
          s"${right.dataType.simpleString(40)})")
    }

  @transient private lazy val vocab: WordPieceVocab = {
    val arr = right.eval(null)
    require(arr != null, s"$prettyName: vocab literal must not be null")
    WordPieceImpl.build(arr.asInstanceOf[ArrayData])
  }

  override def nullSafeEval(w: Any, v: Any): Any =
    vocab.encode(w.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wpVocab", vocab,
      classOf[WordPieceVocab].getName)
    nullSafeCodeGen(ctx, ev, (w, _) => s"${ev.value} = $ref.encode($w);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
