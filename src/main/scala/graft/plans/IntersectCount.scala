package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Kernel: |distinct(a) ∩ distinct(b)| without materializing the
  * intersection — the smaller side becomes a hash set and the other side
  * probes it, removing on hit so duplicates count once. NULL elements are
  * skipped (the similarity-join token sets never carry them).
  */
object IntersectCountImpl {
  def count(a: ArrayData, b: ArrayData): Int = {
    val (small, big) = if (a.numElements() <= b.numElements()) (a, b) else (b, a)
    val set = new java.util.HashSet[UTF8String](small.numElements() * 2)
    var i = 0
    while (i < small.numElements()) {
      if (!small.isNullAt(i)) set.add(small.getUTF8String(i))
      i += 1
    }
    var n = 0
    i = 0
    while (i < big.numElements()) {
      if (!big.isNullAt(i) && set.remove(big.getUTF8String(i))) n += 1
      i += 1
    }
    n
  }
}

/** intersect_count(array<string>, array<string>) → int.
  *
  * Equivalent to `size(array_intersect(a, b))` on null-element-free
  * arrays, minus the intersection-array allocation: `array_intersect`
  * builds (and for `size` immediately discards) the distinct-common array
  * per row — pure garbage in the similarity joins' hottest loop, where
  * [[graft.operators.SimilarityJoin.overlapBlocked]] evaluates it once per
  * candidate PAIR (Σ_block C(n,2) times per corpus), not once per row.
  * Equivalence incl. duplicate elements is pinned in
  * NativeExpressionsSpec.
  */
case class IntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "intersect_count"
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"intersect_count requires (array<string>, array<string>), got " +
          s"(${l.simpleString(10)}, ${r.simpleString(10)})")
    }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val a = left.eval(input)
    if (a == null) return null
    val b = right.eval(input)
    if (b == null) return null
    IntersectCountImpl.count(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.IntersectCountImpl.count($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}
