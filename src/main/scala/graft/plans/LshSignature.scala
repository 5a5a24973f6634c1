package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Kernel: 6-bit random-hyperplane LSH signature over a dense float vector.
  *
  * The semantic reference is the SQL twin
  * [[graft.operators.VectorQueries.lshSigExpr]]: plane j's component i is the
  * hash-derived constant `(pmod(xxhash64('p<j>#<i>'), 1000) / 1000.0) - 0.5`,
  * bit j is `(Σ_i emb[i] * plane_j[i]) > 0`, and the signature packs the six
  * bits little-endian. The twin recomputes that ENTIRE plane matrix per row —
  * 6 × 64 string hashes inside interpreted higher-order lambdas — and, worse,
  * CollapseProject inlines the shared `sig` projection into every consumer
  * (q70's 22-mask probe lambda, q43's Hamming filter), multiplying the
  * per-row cost again. Here the matrix is computed ONCE at class load and the
  * per-row work is six fused dot products inside whole-stage codegen.
  *
  * Results are BIT-IDENTICAL to the twin (same constants, same sequential
  * double accumulation order), including the degenerate shapes the twin's
  * `zip_with(emb, sequence(0, 63), …)` padding produces: a vector shorter
  * than 64 dims or containing a null element yields NULL; dims beyond 64 use
  * the constant plane value the twin derives from `xxhash64(NULL)` = seed 42.
  * Parity is spec-pinned across all of these (LshSignatureSpec).
  */
object LshSignatureImpl {
  val NumPlanes = 6
  val BaseDims = 64

  private def planeVal(j: Int, i: Int): Double = {
    val h = XxHash64Function.hash(UTF8String.fromString(s"p$j#$i"), StringType, 42L)
    (((h % 1000L) + 1000L) % 1000L).toDouble / 1000.0 - 0.5
  }

  /** planes(j)(i) — the twin's per-row-recomputed matrix, built once. */
  val planes: Array[Array[Double]] = Array.tabulate(NumPlanes, BaseDims)(planeVal)

  /** Plane value for dims ≥ 64: the twin's sequence side pads with NULL, and
    * `xxhash64(concat('p<j>#', NULL))` = xxhash64(NULL) = the seed (42). */
  val nullPlane: Double = (42L % 1000L).toDouble / 1000.0 - 0.5

  /** Boxed so the twin's null propagation (short vector / null element) is
    * representable; codegen unboxes. */
  def sig(arr: ArrayData): Integer = {
    val n = arr.numElements()
    if (n < BaseDims) return null
    var i = 0
    while (i < n) { // null element → null, before any plane math (twin: null
      if (arr.isNullAt(i)) return null // product poisons every plane's fold)
      i += 1
    }
    var s = 0
    var j = 0
    while (j < NumPlanes) {
      val plane = planes(j)
      var dot = 0.0
      i = 0
      while (i < n) {
        val p = if (i < BaseDims) plane(i) else nullPlane
        dot += arr.getFloat(i).toDouble * p
        i += 1
      }
      if (dot > 0) s |= 1 << j
      j += 1
    }
    Integer.valueOf(s)
  }
}

/** lsh_sig(array<float>) → int: 6-bit hyperplane bucket signature. */
case class LshSignature(child: Expression) extends UnaryExpression {

  override def prettyName: String = "lsh_sig"
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"lsh_sig requires array<float>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    LshSignatureImpl.sig(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      // freshName: two instances in one generated function must not collide
      val r = ctx.freshName("lshSig")
      s"""
         |java.lang.Integer $r = graft.plans.LshSignatureImpl.sig($c);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.intValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Kernel: the md5-plane twin of [[LshSignatureImpl]] — same 6-bit
  * random-hyperplane structure, but plane j component i is derived from
  * `md5("p<j>#<i>")` (first 15 hex digits as a 60-bit big-endian long, the
  * [[Md5SimHashImpl.parse60]] convention shared with minhash_bands_md5 /
  * simhash_md5_60) instead of xxhash64. That makes the ENTIRE ANN pipeline —
  * signature, bucket assignment, Hamming-ball candidates, exact-cosine
  * re-rank — recomputable in DuckDB SQL, so q43b hash-verifies the
  * production bucketing end to end (xxhash64 has no DuckDB mirror; see the
  * q41b/q42b twins). Plane value: `(h % 1000) / 1000.0 - 0.5`, h the 60-bit
  * md5 prefix. The dot product accumulates sequentially in index order
  * (left fold), bit-identical to the oracle's `list_reduce`.
  *
  * Dims are capped at [[LshSignatureImpl.BaseDims]]: a vector longer than
  * 64 uses only its first 64 components (the oracle's
  * `range(1, least(len, 64) + 1)`); shorter than 64, or any null element,
  * yields NULL — same null contract as [[LshSignatureImpl]].
  */
object Md5LshSignatureImpl {
  import LshSignatureImpl.{BaseDims, NumPlanes}

  private def planeVal(j: Int, i: Int): Double = {
    val d = Md5SimHashImpl.digester.digest(s"p$j#$i".getBytes("UTF-8"))
    val h = Md5SimHashImpl.parse60(d, 0)
    (h % 1000L).toDouble / 1000.0 - 0.5
  }

  /** planes(j)(i), built once at class load. */
  val planes: Array[Array[Double]] = Array.tabulate(NumPlanes, BaseDims)(planeVal)

  def sig(arr: ArrayData): Integer = {
    val n = arr.numElements()
    if (n < BaseDims) return null
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      i += 1
    }
    val m = math.min(n, BaseDims)
    var s = 0
    var j = 0
    while (j < NumPlanes) {
      val plane = planes(j)
      var dot = 0.0
      i = 0
      while (i < m) {
        dot += arr.getFloat(i).toDouble * plane(i)
        i += 1
      }
      if (dot > 0) s |= 1 << j
      j += 1
    }
    Integer.valueOf(s)
  }
}

/** lsh_sig_md5(array<float>) → int: the DuckDB-mirrorable 6-bit hyperplane
  * signature ([[Md5LshSignatureImpl]]). */
case class Md5LshSignature(child: Expression) extends UnaryExpression {

  override def prettyName: String = "lsh_sig_md5"
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"lsh_sig_md5 requires array<float>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    Md5LshSignatureImpl.sig(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      // freshName: two instances in one generated function must not collide
      val r = ctx.freshName("md5LshSig")
      s"""
         |java.lang.Integer $r = graft.plans.Md5LshSignatureImpl.sig($c);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.intValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
