package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expressions for dense float-vector math (SURVEY §7's one
  * planned custom-Expression item). The higher-order-function formulation
  * (zip_with + aggregate, [[graft.functions.VectorFunctions]]) is the
  * semantic reference; these produce BIT-IDENTICAL results (same sequential
  * double accumulation order) but run inside whole-stage codegen as a tight
  * primitive loop over the unsafe array data — no per-element lambda
  * interpretation, no boxing. On a similarity join this is the difference
  * between an interpreted inner loop and ~memory-bandwidth execution.
  * Arrays of unequal length yield NULL — exactly what the zip_with twin
  * produces (its null padding propagates through the fold).
  */
abstract class VectorBinaryExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<float> arguments, got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }
}

/** cosine_similarity(array<float>, array<float>) → double. */
case class CosineSimilarity(left: Expression, right: Expression)
    extends VectorBinaryExpression {

  override def prettyName: String = "cosine_similarity"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null // zip_with twin: null
    val n = x.numElements()
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int n = $a.numElements();
         |  double dot = 0.0, na = 0.0, nb = 0.0;
         |  for (int i = 0; i < n; i++) {
         |    double xi = (double) $a.getFloat(i);
         |    double yi = (double) $b.getFloat(i);
         |    dot += xi * yi; na += xi * xi; nb += yi * yi;
         |  }
         |  ${ev.value} = dot / (java.lang.Math.sqrt(na) * java.lang.Math.sqrt(nb));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** dot_product(array<float>, array<float>) → double (computed in double). */
case class DotProduct(left: Expression, right: Expression)
    extends VectorBinaryExpression {

  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null // zip_with twin: null
    val n = x.numElements()
    var dot = 0.0
    var i = 0
    while (i < n) {
      dot += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int n = $a.numElements();
         |  double dot = 0.0;
         |  for (int i = 0; i < n; i++) {
         |    dot += (double) $a.getFloat(i) * (double) $b.getFloat(i);
         |  }
         |  ${ev.value} = dot;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
