package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Kernel for the rolling document fingerprint (q47):
  * `acc · 31 + h(token) (mod 1e9+7)` where h = the first 4 md5 bytes read
  * big-endian — exactly the first 8 hex digits parsed as an integer, the
  * value the DuckDB oracle computes with `('0x'||substr(md5(t),1,8))::BIGINT`
  * and Spark's built-ins with `conv(substring(md5(t),1,8),16,10)`.
  *
  * Exists as a native expression because the equivalent `aggregate`
  * higher-order lambda is interpreted per element AND routes each token
  * through md5-hex-string → substring → conv(string) — three UTF8String
  * round-trips per token; here it is one digest and integer ops inside
  * whole-stage codegen, the per-row cost that matters on a 100 TB corpus.
  */
object RollingFpImpl {
  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def fp(arr: ArrayData): Long = {
    val md = md5.get()
    var acc = 0L
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      md.reset()
      val d = md.digest(arr.getUTF8String(i).getBytes)
      val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      acc = (acc * 31L + h) % 1000000007L
      i += 1
    }
    acc
  }
}

object Md5Prefix32Impl {
  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 4 md5 bytes big-endian — bit-identical to parsing the first 8
    * md5 hex digits (the q58/q80/q110 hash contract:
    * `conv(substring(md5(s),1,8),16,10)` / `('0x'||substr(md5(s),1,8))::BIGINT`). */
  def prefix(s: org.apache.spark.unsafe.types.UTF8String): Long = {
    val d = md5.get().digest(s.getBytes)
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }
}

/** md5_prefix32(string) → bigint: the engine-mirrorable uniform hash the
  * sampling/bucketing contract is built on, as ONE digest + integer ops
  * inside whole-stage codegen. The built-in formulation
  * `conv(substring(md5(s),1,8),16,10)` routes every value through an md5
  * hex string, a substring, and conv's string base-parser — measured ~3.5 s
  * of the q110 feature pass at sf0.1 vs ~0.4 s for this kernel;
  * equivalence is spec-pinned in NativeExpressionsSpec. */
case class Md5Prefix32(child: Expression) extends UnaryExpression {

  override def prettyName: String = "md5_prefix32"
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"md5_prefix32 requires string, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    Md5Prefix32Impl.prefix(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.Md5Prefix32Impl.prefix($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** rolling_fp(array<string>) → bigint. */
case class RollingFp(child: Expression) extends UnaryExpression {

  override def prettyName: String = "rolling_fp"
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"rolling_fp requires array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    RollingFpImpl.fp(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.RollingFpImpl.fp($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
