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
