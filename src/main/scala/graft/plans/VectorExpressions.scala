package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType, FloatType, IntegerType, LongType, StructField, StructType}

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

  // Every emitted local goes through ctx.freshName: two kernel instances can
  // land in ONE generated function (CollapseProject duplicating a shared
  // expression — repo gotcha), and fixed names made Janino fail with
  // "Redefinition of local variable" → silent interpreted fallback (r15 q234).
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val i = ctx.freshName("i")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $xi = (double) $a.getFloat($i);
         |    double $yi = (double) $b.getFloat($i);
         |    $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |  }
         |  ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Kernel for [[NearestCentroid]], shared by eval and codegen (the
  * [[BpeMergePairImpl]] pattern). Semantics mirror the interpreted HOF
  * fold it replaces (IvfStorage.assignCells' `aggregate` — kept as the
  * spec-pinned reference) BIT-EXACTLY, including Spark's NaN ordering —
  * in Spark SQL `NaN > x` is TRUE for every non-NaN x (SQLOrderingUtil
  * semantics: NaN is the largest double), which the HOF's
  * `when(sim > acc.sim, …)` inherits:
  *  - cosine accumulates dot/na/nb in doubles, in element order;
  *  - scan is cent_id-ascending (callers pass an array_sort'ed array) and
  *    replaces only on Spark-strictly-greater similarity — ties keep the
  *    smallest cent_id;
  *  - a NaN cosine (zero vector / zero-norm centroid) BEATS every real
  *    similarity and then sticks (NaN > NaN is false), so the first
  *    NaN-producing centroid wins — the HOF outcome, and the one the
  *    q51-family oracles mirror (ORDER BY sim DESC ranks NaN first in
  *    both engines);
  *  - a length-mismatched centroid contributes null cosine in the HOF
  *    (when(null, …) → otherwise) — here it is skipped, same outcome;
  *  - an empty centroid array yields -1 (the HOF's seed cid). */
object NearestCentroidImpl {
  def nearest(emb: ArrayData, cents: ArrayData): Int = {
    val nc = cents.numElements()
    var best = -2.0
    var bestIsNaN = false
    var bestId = -1
    var c = 0
    while (c < nc && !bestIsNaN) {
      if (!cents.isNullAt(c)) {
        val s = cents.getStruct(c, 2)
        val cent = s.getArray(1)
        if (cent != null && cent.numElements() == emb.numElements()) {
          val n = emb.numElements()
          var dot = 0.0; var na = 0.0; var nb = 0.0
          var i = 0
          while (i < n) {
            val xi = emb.getFloat(i).toDouble
            val yi = cent.getFloat(i).toDouble
            dot += xi * yi; na += xi * xi; nb += yi * yi
            i += 1
          }
          val sim = dot / (math.sqrt(na) * math.sqrt(nb))
          // Spark `sim > best`: NaN beats any non-NaN; once best is NaN
          // nothing beats it (loop exits via bestIsNaN)
          if (sim.isNaN) { bestIsNaN = true; bestId = s.getInt(0) }
          else if (sim > best) { best = sim; bestId = s.getInt(0) }
        }
      }
      c += 1
    }
    bestId
  }
}

/** nearest_centroid(embedding array<float>,
  *                  cents array<struct<cent_id int, centroid array<float>>>)
  * → int: argmax-cosine cell assignment against a (broadcast) centroid
  * array — the IVF build/probe hot loop ([[graft.operators.IvfStorage]]:
  * every corpus row in assignCells, every Lloyd's iteration in
  * kmeansCentroids). Native because the HOF `aggregate` formulation is
  * interpreted per row × per centroid (the CLAUDE.md gotcha), and a
  * lambda would not canonicalize ([[SortedTokenHashes]]'s lesson).
  * Struct fields are positional: (cent_id, centroid). */
case class NearestCentroid(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "nearest_centroid"
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(s: StructType, _))
          if s.length == 2 && s(0).dataType == IntegerType &&
            (s(1).dataType match {
              case ArrayType(FloatType, _) => true
              case _ => false
            }) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<float>, array<struct<int, array<float>>>), got " +
          s"(${left.dataType.simpleString(40)}, ${right.dataType.simpleString(40)})")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    NearestCentroidImpl.nearest(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.NearestCentroidImpl.nearest($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Kernel for [[QuantizedCosine]] — cosine between a query vector and the
  * real-valued dequantization of an int8 code vector, fused into one loop
  * (no intermediate float-array materialization per scanned row). The
  * dequantized coordinate is (mn + code·range/255)/10⁶ — the inverse of
  * IvfStorage.quantize's integer-space affine map. Length mismatch
  * (codes vs params vs query — params drift, wrong codebook) → null,
  * mirroring [[DotProduct]]'s zip_with-twin contract. */
object QuantizedCosineImpl {
  def cosine(codes: ArrayData, params: ArrayData,
      q: ArrayData): java.lang.Double = {
    val n = codes.numElements()
    if (params.numElements() != n || q.numElements() != n) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val s = params.getStruct(i, 3)
      val mn = s.getLong(1)
      val range = s.getLong(2) - mn
      val x = (mn + codes.getInt(i) * range / 255.0) / 1000000.0
      val y = q.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** The packed-lake variant: codes as one byte each ([[Int8Pack]]'s
    * layout, & 0xFF recovers 0..255). Same arithmetic, bit-identical. */
  def cosineBytes(codes: Array[Byte], params: ArrayData,
      q: ArrayData): java.lang.Double = {
    val n = codes.length
    if (params.numElements() != n || q.numElements() != n) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val s = params.getStruct(i, 3)
      val mn = s.getLong(1)
      val range = s.getLong(2) - mn
      val x = (mn + (codes(i) & 0xFF) * range / 255.0) / 1000000.0
      val y = q.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  def pack(codes: ArrayData): Array[Byte] = {
    val n = codes.numElements()
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) { out(i) = codes.getInt(i).toByte; i += 1 }
    out
  }
}

/** Kernel for [[Int8Quantize]] — the write-path affine map, replicating
  * IvfStorage's integer-space arithmetic EXACTLY (Java long division
  * truncates toward zero like Spark's `div`; the only negative numerator,
  * an under-range drifted value, clamps to 0 either way): iv = floor(x·10⁶),
  * code = clamp(((iv−mn)·255)/range), err = |iv − (mn + code·range/255)|.
  * Null element, NaN element, or params-length mismatch → null row (wrong
  * codebook / corrupt vector — fail explicitly, never truncate dimensions
  * or code garbage; the ANSI DataFrame reference THROWS on the NaN cast,
  * so null is this kernel's softened equivalent, documented here). The
  * out-of-range clamp branches BEFORE the ×255 multiply, so a drifted
  * value can never overflow the intermediate into the wrong end of the
  * code range; err under extreme drift saturates rather than wrapping. */
object Int8QuantizeImpl {
  def quantize(emb: ArrayData, params: ArrayData): InternalRow = {
    val n = emb.numElements()
    if (params.numElements() != n) return null
    val codes = new Array[Int](n)
    var maxErr = 0L
    var i = 0
    while (i < n) {
      if (emb.isNullAt(i)) return null
      val x = emb.getFloat(i)
      if (java.lang.Float.isNaN(x)) return null
      val s = params.getStruct(i, 3)
      val mn = s.getLong(1)
      val mx = s.getLong(2)
      val range = mx - mn
      // ±Infinity floors to ±Infinity; .toLong saturates to ±Long extremes,
      // which the clamp below routes to code 255/0 — the drift contract
      val iv = math.floor(x.toDouble * 1000000.0).toLong
      val code =
        if (range == 0L || iv <= mn) 0L
        else if (iv >= mx) 255L
        else ((iv - mn) * 255L) / range // iv−mn < range: no overflow
      val rec = mn + code * range / 255L
      // saturating |iv − rec|: a saturated iv minus an in-range rec can
      // exceed Long — report Long.MaxValue instead of a wrapped negative
      val err =
        try {
          val d = math.subtractExact(iv, rec)
          if (d == Long.MinValue) Long.MaxValue else math.abs(d)
        } catch { case _: ArithmeticException => Long.MaxValue }
      if (err > maxErr) maxErr = err
      codes(i) = code.toInt
      i += 1
    }
    new GenericInternalRow(Array[Any](new GenericArrayData(codes), maxErr))
  }
}

/** int8_quantize(embedding array<float>,
  *               qparams array<struct<pos int, mn bigint, mx bigint>>)
  * → struct<codes: array<int>, max_err: bigint>: one-shot per-vector
  * quantization against the broadcast parameter array. Native because the
  * DataFrame formulation (posexplode → broadcast join on pos → groupBy
  * vec_id) SHUFFLES 64× the corpus rows to reassemble what is a purely
  * per-row map — at 100 TB the quantized-lake write would be dominated by
  * that reassembly exchange. Bit-equal to the explode formulation
  * (spec-pinned, QuantizationSpec). */
case class Int8Quantize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "int8_quantize"
  override def dataType: DataType = StructType(Seq(
    StructField("codes", ArrayType(IntegerType, containsNull = false)),
    StructField("max_err", LongType)))
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(s: StructType, _))
          if s.length == 3 && s(0).dataType == IntegerType &&
            s(1).dataType == LongType && s(2).dataType == LongType =>
        TypeCheckResult.TypeCheckSuccess
      case (f, s) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<float>, array<struct<int,bigint,bigint>>), " +
          s"got (${f.simpleString(40)}, ${s.simpleString(40)})")
    }

  override def nullSafeEval(emb: Any, params: Any): Any =
    Int8QuantizeImpl.quantize(emb.asInstanceOf[ArrayData],
      params.asInstanceOf[ArrayData])

  // freshName for the result local — see CosineSimilarity.doGenCode's note.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (emb, params) => {
      val r = ctx.freshName("quantized")
      s"""
      |InternalRow $r = graft.plans.Int8QuantizeImpl.quantize($emb, $params);
      |if ($r == null) { ${ev.isNull} = true; }
      |else { ${ev.value} = $r; }
      |""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** int8_pack(codes array<int>) → binary: one byte per code (low 8 bits) —
  * the quantized lake's STORAGE layout (1 byte/dimension on disk vs
  * array<int>'s 4+, the whole point of int8 quantization). Write-path
  * companion of [[QuantizedCosine]]'s binary input. */
case class Int8Pack(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def prettyName: String = "int8_pack"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<int>, got ${t.simpleString(40)}")
  }

  override def nullSafeEval(codes: Any): Any =
    QuantizedCosineImpl.pack(codes.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.QuantizedCosineImpl.pack($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** quantized_cosine(codes array<int> | binary,
  *                  qparams array<struct<pos int, mn bigint, mx bigint>>,
  *                  q_emb array<float>) → double: the ANN pre-rank score
  * over the quantized lake (IvfStorage.probeQuantized). Native because
  * this is the probe's per-scanned-row hot loop — the HOF formulation
  * would be interpreted per row × per dimension, and dequantize-then-
  * cosine as two steps materializes a float array per row. The binary
  * form is the stored lake layout ([[Int8Pack]]); both forms are
  * bit-identical (spec-pinned). */
case class QuantizedCosine(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def prettyName: String = "quantized_cosine"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def paramsOk(t: DataType): Boolean = t match {
    case ArrayType(s: StructType, _) =>
      s.length == 3 && s(0).dataType == IntegerType &&
        s(1).dataType == LongType && s(2).dataType == LongType
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(IntegerType, _), p, ArrayType(FloatType, _))
          if paramsOk(p) => TypeCheckResult.TypeCheckSuccess
      case (BinaryType, p, ArrayType(FloatType, _))
          if paramsOk(p) => TypeCheckResult.TypeCheckSuccess
      case (f, s, t) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<int> | binary, " +
          s"array<struct<int,bigint,bigint>>, array<float>), got " +
          s"(${f.simpleString(40)}, ${s.simpleString(40)}, ${t.simpleString(40)})")
    }

  private def packed: Boolean = first.dataType == BinaryType

  override def nullSafeEval(codes: Any, params: Any, q: Any): Any =
    if (packed)
      QuantizedCosineImpl.cosineBytes(codes.asInstanceOf[Array[Byte]],
        params.asInstanceOf[ArrayData], q.asInstanceOf[ArrayData])
    else
      QuantizedCosineImpl.cosine(codes.asInstanceOf[ArrayData],
        params.asInstanceOf[ArrayData], q.asInstanceOf[ArrayData])

  // freshName for the result local — see CosineSimilarity.doGenCode's note.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (packed) "cosineBytes" else "cosine"
    nullSafeCodeGen(ctx, ev, (codes, params, q) => {
      val r = ctx.freshName("qcos")
      s"""
      |java.lang.Double $r =
      |  graft.plans.QuantizedCosineImpl.$fn($codes, $params, $q);
      |if ($r == null) { ${ev.isNull} = true; }
      |else { ${ev.value} = $r.doubleValue(); }
      |""".stripMargin
    })
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** Kernel for [[CenteredIntDot]] — Σ (2aᵢ−255)(2bᵢ−255) over two int8
  * code vectors in exact Long (max |term| < 2¹⁶, so 64 dims sum far
  * inside Long range): the similarity an int8 engine actually computes,
  * and the ranking key q234's code-side argmax orders by. Null on length
  * mismatch or a null element — exactly the zip_with/aggregate twin's
  * null propagation. */
object CenteredIntDotImpl {
  def dot(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var s = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += (2L * a.getInt(i) - 255L) * (2L * b.getInt(i) - 255L)
      i += 1
    }
    java.lang.Long.valueOf(s)
  }
}

/** centered_int_dot(array<int>, array<int>) → bigint. Native because the
  * HOF formulation (zip_with + aggregate) runs interpreted per pair — on
  * a probes × corpus product (q234's audit) that interpreted 64-element
  * fold IS the query's cost. Bit-equal to the HOF twin (spec-pinned). */
case class CenteredIntDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "centered_int_dot"
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (f, s) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<int> arguments, got " +
          s"(${f.simpleString(40)}, ${s.simpleString(40)})")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    CenteredIntDotImpl.dot(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData])

  // freshName for the result local — see CosineSimilarity.doGenCode's note.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("cidot")
      s"""
      |java.lang.Long $r = graft.plans.CenteredIntDotImpl.dot($a, $b);
      |if ($r == null) { ${ev.isNull} = true; }
      |else { ${ev.value} = $r.longValue(); }
      |""".stripMargin
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

  // freshName for every local — see CosineSimilarity.doGenCode's note.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val i = ctx.freshName("i")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $dot += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |  }
         |  ${ev.value} = $dot;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
