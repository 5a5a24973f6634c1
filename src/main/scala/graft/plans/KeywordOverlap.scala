package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Kernel: how many elements of `tokens` (repeats counted) appear in the
  * FOLDABLE word list — the per-row primitive behind language-ID scoring
  * (q44: 5 languages × 7 keywords per document) and stopword ratios (q45).
  *
  * Exists as a native expression because the equivalent
  * `size(filter(toks, t -> t.isin(words…)))` is an interpreted higher-order
  * lambda doing a linear isin scan per token; here the word list becomes
  * ONE hash set built at plan time and each token is a single probe inside
  * whole-stage codegen — the difference between O(|toks|·|words|)
  * interpreted and O(|toks|) compiled on a 100 TB text scan. */
object KeywordOverlapImpl {
  def count(toks: ArrayData, words: java.util.HashSet[UTF8String]): Int = {
    var n = 0
    var i = 0
    val len = toks.numElements()
    while (i < len) {
      if (!toks.isNullAt(i) && words.contains(toks.getUTF8String(i))) n += 1
      i += 1
    }
    n
  }
}

/** keyword_overlap(array<string>, array<string> literal) → int. */
case class KeywordOverlap(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "keyword_overlap"
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckFailure(
          "keyword_overlap requires a foldable (literal) word list")
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"keyword_overlap requires (array<string>, array<string>), got " +
          s"(${l.simpleString(10)}, ${r.simpleString(10)})")
    }

  /** The word list is foldable: evaluated ONCE into a hash set shared by
    * every row (and shipped to codegen as a reference object). A NULL list
    * makes the whole expression null (matching nullSafeCodeGen's codegen
    * null semantics — eval and codegen must agree). */
  @transient private lazy val wordSet: java.util.HashSet[UTF8String] = {
    val arr = right.eval(null).asInstanceOf[ArrayData]
    if (arr == null) null
    else {
      val set = new java.util.HashSet[UTF8String]()
      var i = 0
      while (i < arr.numElements()) {
        if (!arr.isNullAt(i)) set.add(arr.getUTF8String(i).clone())
        i += 1
      }
      set
    }
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val toks = left.eval(input)
    if (toks == null || wordSet == null) null
    else KeywordOverlapImpl.count(toks.asInstanceOf[ArrayData], wordSet)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("wordSet", wordSet,
      "java.util.HashSet<org.apache.spark.unsafe.types.UTF8String>")
    nullSafeCodeGen(ctx, ev, (toks, _) =>
      s"${ev.value} = graft.plans.KeywordOverlapImpl.count($toks, $setRef);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}
