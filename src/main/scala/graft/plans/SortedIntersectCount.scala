package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Two-pointer merge walk over SORTED DISTINCT long arrays — the pair-side
  * half of the hashed-token intersect scheme (see [[SortedIntersectCount]]).
  */
object SortedIntersectCountImpl {
  def count(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var n = 0
    while (i < na && j < nb) {
      // null slots never occur on the token_hashes path (containsNull =
      // false), but the function is session-registered and raw SQL can
      // feed arrays typed containsNull=true — skip nulls (they match
      // nothing) instead of silently reading them as 0 and counting a
      // phantom shared element; branches are never taken on packed input
      if (a.isNullAt(i)) i += 1
      else if (b.isNullAt(j)) j += 1
      else {
        val x = a.getLong(i)
        val y = b.getLong(j)
        if (x == y) { n += 1; i += 1; j += 1 }
        else if (x < y) i += 1
        else j += 1
      }
    }
    n
  }
}

/** intersect_count_sorted(array<bigint>, array<bigint>) → int.
  *
  * The fast path of the similarity joins' hottest loop: [[IntersectCount]]
  * builds a per-PAIR HashSet of UTF8Strings and hashes ~|a|+|b| strings per
  * candidate pair — at 43M in-block pairs (the 10× q74 corpus) that is the
  * entire compute wave. This variant moves ALL hashing to the per-DOC
  * projection (`array_sort(transform(array_distinct(w), x → xxhash64(x)))`
  * — built-ins, run once per document, not per pair) and reduces the
  * per-pair work to a branch-predictable two-pointer merge over packed
  * longs: no allocation, no string traffic, ~|a|+|b| long compares.
  *
  * Preconditions (the operators in [[graft.operators.SimilarityJoin]]
  * guarantee both): arrays sorted ascending, elements distinct and
  * non-null. Token identity is xxhash64 identity — the same trust the
  * postings-join strategy already places in `xxhash64(tok)` join keys; a
  * cross-token collision (~2⁻⁵² per pair) would count one phantom shared
  * token. Equivalence with [[IntersectCount]] through the hashed
  * projection is pinned in NativeExpressionsSpec.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "intersect_count_sorted"
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"intersect_count_sorted requires (array<bigint>, array<bigint>), " +
          s"got (${l.simpleString(10)}, ${r.simpleString(10)})")
    }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val a = left.eval(input)
    if (a == null) return null
    val b = right.eval(input)
    if (b == null) return null
    SortedIntersectCountImpl.count(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.SortedIntersectCountImpl.count($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}
