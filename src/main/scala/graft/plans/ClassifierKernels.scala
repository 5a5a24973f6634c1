package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}

/** The q126 classifier's per-row kernels. Both exist for the same reason
  * as [[SortedTokenHashesImpl]]: the HOF spellings
  * (`array_distinct(transform(feats, f → md5 % B))`,
  * `aggregate(fb, 0L, (a, b) → a + w[b])`) are interpreted per element —
  * the per-feature md5 was q110's measured hot spot — and a lambda's
  * NamedLambdaVariable breaks `sameResult` plan reuse.
  */
object Md5BucketsImpl {
  def compute(arr: ArrayData, buckets: Int): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Int](n)
    var m = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        out(m) = (Md5Prefix32Impl.prefix(arr.getUTF8String(i)) % buckets).toInt
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
    UnsafeArrayData.fromPrimitiveArray(
      if (w == out.length) out else java.util.Arrays.copyOf(out, w))
  }
}

/** md5_buckets(array<string>, B) → sorted distinct array<int> of
  * `md5_prefix32(elem) % B` — the binary-presence feature projection
  * (DuckDB mirror: DISTINCT `('0x'||substr(md5(f),1,8))::BIGINT % B`).
  * NULL elements are dropped. B must be a positive integer literal. */
case class Md5Buckets(child: Expression, buckets: Int) extends UnaryExpression {
  require(buckets > 0, s"md5_buckets: B must be positive, got $buckets")

  override def prettyName: String = "md5_buckets"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"md5_buckets requires array<string>, got ${other.simpleString(10)}")
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else Md5BucketsImpl.compute(v.asInstanceOf[ArrayData], buckets)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.plans.Md5BucketsImpl.compute($a, $buckets);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WeightLookupSumImpl {
  def compute(idx: ArrayData, weights: ArrayData): Long = {
    val n = idx.numElements()
    val b = weights.numElements()
    var s = 0L
    var i = 0
    while (i < n) {
      val j = idx.getInt(i)
      if (j >= 0 && j < b) s += weights.getLong(j)
      i += 1
    }
    s
  }
}

/** weight_lookup_sum(array<int>, array<bigint>) → bigint: Σ w[i] over the
  * index array — model-literal linear scoring (the weight vector rides in
  * the plan as a literal, so inference is a pure map-side projection: no
  * join, no shuffle). Out-of-range indices contribute 0 (the "feature
  * unseen in training" case when the caller sizes w by bucket count). */
case class WeightLookupSum(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "weight_lookup_sum"
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"weight_lookup_sum requires (array<int>, array<bigint>), got " +
          s"(${l.simpleString(10)}, ${r.simpleString(10)})")
    }

  override def nullSafeEval(idx: Any, w: Any): Any =
    WeightLookupSumImpl.compute(
      idx.asInstanceOf[ArrayData], w.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.plans.WeightLookupSumImpl.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
