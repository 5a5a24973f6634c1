package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** token_hashes(array<string>) → sorted distinct array<bigint> — the
  * per-DOC projection half of the hashed-token intersect scheme (pair half:
  * [[SortedIntersectCount]]). Each element is `xxhash64(elem)` (seed 42,
  * bit-identical to the SQL function); NULL elements are dropped; the
  * result is sorted ascending and deduplicated, exactly what the merge
  * kernel's preconditions require.
  *
  * Why native instead of `array_sort(transform(array_distinct(w),
  * x → xxhash64(x)))`: (1) higher-order functions are interpreted per
  * element (CLAUDE.md), and (2) a lambda's NamedLambdaVariable does not
  * canonicalize across plan copies, so two join sides projecting the same
  * lambda stop `sameResult`-matching and the pinned exchange loses its
  * ReusedExchange — the one-scan-feeds-both-sides property PlanSpec pins
  * for q74 (broke exactly that way when this was first written as a HOF).
  */
object SortedTokenHashesImpl {
  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Long](n)
    var m = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        out(m) = XxHash64Function.hash(arr.getUTF8String(i), StringType, 42L)
        m += 1
      }
      i += 1
    }
    java.util.Arrays.sort(out, 0, m)
    var w = 0
    var r = 0
    while (r < m) {
      if (w == 0 || out(w - 1) != out(r)) { out(w) = out(r); w += 1 }
      r += 1
    }
    // packed UnsafeArrayData, not GenericArrayData: the generic ctor boxes
    // every long (Array[Long] → Seq[Any]), allocating n objects per
    // DOCUMENT in exactly the projection this kernel exists to keep cheap
    UnsafeArrayData.fromPrimitiveArray(
      if (w == out.length) out else java.util.Arrays.copyOf(out, w))
  }
}

case class SortedTokenHashes(child: Expression) extends UnaryExpression {

  override def prettyName: String = "token_hashes"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"token_hashes requires array<string>, got ${other.simpleString(10)}")
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else SortedTokenHashesImpl.compute(v.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.plans.SortedTokenHashesImpl.compute($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
