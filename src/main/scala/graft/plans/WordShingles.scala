package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Kernel: word n-gram shingles — n consecutive tokens joined by a single
  * space. Native twin of the `transform(sequence(...), i -> concat_ws(...))`
  * formulation (which runs as an interpreted lambda per shingle). */
object WordShinglesImpl {
  private val SPACE = UTF8String.fromString(" ")

  def shingles(arr: ArrayData, n: Int): ArrayData = {
    val total = arr.numElements() - n + 1
    if (total <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](total)
    var i = 0
    while (i < total) {
      val parts = new Array[UTF8String](n)
      var k = 0
      while (k < n) { parts(k) = arr.getUTF8String(i + k); k += 1 }
      out(i) = UTF8String.concatWs(SPACE, parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** word_shingles(array<string>, n) → array<string>. */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {

  override def prettyName: String = "word_shingles"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if n > 0 => TypeCheckResult.TypeCheckSuccess
    case ArrayType(StringType, _) =>
      TypeCheckResult.TypeCheckFailure(s"n must be positive, got $n")
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_shingles requires array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    WordShinglesImpl.shingles(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.WordShinglesImpl.shingles($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
