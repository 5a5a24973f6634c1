package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Kernel for one BPE merge application: left-to-right, non-overlapping —
  * the exact greedy order reference BPE implementations use (a run
  * `a a a` under merge (a,a) becomes `aa a`, not `a aa`). */
object BpeMergePairImpl {
  def merge(syms: ArrayData, a: UTF8String, b: UTF8String): ArrayData = {
    val n = syms.numElements()
    val out = new Array[AnyRef](n)
    var w = 0
    var i = 0
    while (i < n) {
      val cur = syms.getUTF8String(i)
      if (i < n - 1 && cur != null && cur.equals(a)) {
        val nxt = syms.getUTF8String(i + 1)
        if (nxt != null && nxt.equals(b)) {
          out(w) = UTF8String.concat(a, b); w += 1; i += 2
        } else { out(w) = cur; w += 1; i += 1 }
      } else { out(w) = cur; w += 1; i += 1 }
    }
    new GenericArrayData(
      if (w == n) out else java.util.Arrays.copyOf(out, w))
  }
}

/** bpe_merge_pair(syms array<string>, a string, b string) → array<string>:
  * replace every non-overlapping adjacent (a, b) with the merged symbol
  * `a+b`, scanning left to right — ONE byte-pair-encoding merge applied to
  * one word's symbol sequence. Native because [[graft.operators.BpeTrainer]]
  * evaluates it once per distinct word per TRAINING ITERATION (and the
  * trained tokenizer's encode path folds the whole merge table over every
  * word) — an interpreted HOF fold there would dominate training time, and
  * (as with [[SortedTokenHashes]]) a lambda would not canonicalize. */
case class BpeMergePair(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def prettyName: String = "bpe_merge_pair"
  override def dataType: DataType = first.dataType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(StringType, _), StringType, StringType) =>
        TypeCheckResult.TypeCheckSuccess
      case (f, s, t) => TypeCheckResult.TypeCheckFailure(
        s"bpe_merge_pair requires (array<string>, string, string), got " +
          s"(${f.simpleString(10)}, ${s.simpleString(10)}, ${t.simpleString(10)})")
    }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val syms = first.eval(input)
    if (syms == null) return null
    val a = second.eval(input)
    if (a == null) return null
    val b = third.eval(input)
    if (b == null) return null
    BpeMergePairImpl.merge(syms.asInstanceOf[ArrayData],
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (syms, a, b) =>
      s"${ev.value} = graft.plans.BpeMergePairImpl.merge($syms, $a, $b);")

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}
