package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Shared kernel: 64-bit SimHash over a token array. Semantics are exactly
  * the SQL formulation `bit i set iff Σ_tokens (bit i of xxhash64(token) ?
  * +1 : -1) > 0` (same xxhash64, seed 42), but as one tight loop — one
  * string hash per token, then 64 integer ops — instead of interpreted
  * nested higher-order lambdas.
  */
object SimHashImpl {
  def compute(arr: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = arr.numElements()
    var t = 0
    while (t < n) {
      val h = XxHash64Function.hash(arr.getUTF8String(t), StringType, 42L)
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) votes(i) += 1 else votes(i) -= 1
        i += 1
      }
      t += 1
    }
    var sig = 0L
    var i = 0
    while (i < 64) {
      if (votes(i) > 0) sig |= (1L << i)
      i += 1
    }
    sig
  }
}

/** simhash64(array<string>) → bigint. */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def prettyName: String = "simhash64"
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    SimHashImpl.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.SimHashImpl.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 60-bit SimHash whose per-token hash is the first 15 hex digits of
  * md5(token) — i.e. `h(t) = CAST('0x' || substr(md5(t), 1, 15) AS BIGINT)`,
  * exactly expressible in DuckDB SQL, unlike xxhash64 (DuckDB has no
  * xxhash64, and its overflow-checked integer arithmetic cannot emulate the
  * wrapping 64-bit multiplies). 60 bits (not 64) because 16 hex digits can
  * exceed Long.MaxValue and both engines must parse the value into a SIGNED
  * bigint identically. The cross-engine-mirrorable twin of [[SimHashImpl]]:
  * same vote/threshold semantics, banded as 4×15-bit chunks downstream.
  */
object Md5SimHashImpl {
  private val md = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  /** The thread's MD5 instance — callers hoist this out of hot loops
    * (digest() resets the instance itself, no explicit reset needed). */
  private[plans] def digester: java.security.MessageDigest = md.get()

  /** 60 bits of a digest from byte `off`, big-endian — bit-identical to
    * parsing 15 hex digits starting at hex position 2·off+1 (the SQL
    * mirror's `substr(md5(…), 2·off+1, 15)`). The single definition behind
    * tokenHash AND both of Md5MinHashImpl's per-digest views. */
  private[plans] def parse60(d: Array[Byte], off: Int): Long = {
    var h = 0L
    var i = off
    while (i < off + 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    h >>> 4 // drop the trailing hex digit: 15 hex chars = 60 bits
  }

  /** First 60 bits of md5(token bytes), big-endian — bit-identical to
    * parsing the first 15 hex digits of the md5 hex string. */
  def tokenHash(bytes: Array[Byte]): Long =
    parse60(digester.digest(bytes), 0)

  def compute(arr: ArrayData): Long = {
    val votes = new Array[Int](60)
    val n = arr.numElements()
    var t = 0
    while (t < n) {
      val h = tokenHash(arr.getUTF8String(t).getBytes)
      var i = 0
      while (i < 60) {
        if (((h >>> i) & 1L) == 1L) votes(i) += 1 else votes(i) -= 1
        i += 1
      }
      t += 1
    }
    var sig = 0L
    var i = 0
    while (i < 60) {
      if (votes(i) > 0) sig |= (1L << i)
      i += 1
    }
    sig
  }
}

/** simhash_md5_60(array<string>) → bigint (the DuckDB-mirrorable variant). */
case class Md5SimHash60(child: Expression) extends UnaryExpression {

  override def prettyName: String = "simhash_md5_60"
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash_md5_60 requires array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    Md5SimHashImpl.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.Md5SimHashImpl.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
