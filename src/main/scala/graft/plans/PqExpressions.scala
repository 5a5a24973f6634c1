package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType, FloatType, IntegerType, StructType}

/** Native kernels for product quantization (PQ) — the 100 TB step past
  * int8 scalar quantization ([[Int8Quantize]]): instead of one byte per
  * DIMENSION, the vector splits into m contiguous subvectors and each
  * stores only the id of its nearest per-subspace codebook entry — m bytes
  * per VECTOR (64-dim float → 8 bytes at m=8, a 32× storage cut), searched
  * via asymmetric distance computation (ADC: per-query lookup tables, no
  * per-row decode). The codebook layout, tie-breaks and fold orders mirror
  * the DataFrame reference formulations in [[graft.operators.PqStorage]]
  * bit-exactly (spec-pinned; the encode is DuckDB-oracled end-to-end as
  * q107).
  */
object PqEncodeImpl {

  /** Spark SQL double ordering: NaN equals NaN and exceeds every real —
    * the comparison ORDER BY dist ASC ranks with (SQLOrderingUtil). */
  private def cmp(a: Double, b: Double): Int = {
    val an = java.lang.Double.isNaN(a); val bn = java.lang.Double.isNaN(b)
    if (an && bn) 0 else if (an) 1 else if (bn) -1
    else java.lang.Double.compare(a, b)
  }

  /** Encode one vector against the packed codebook array (sorted by
    * (sub, code) — [[graft.operators.PqStorage.codebookArray]]'s ABI).
    * Per subspace, the chosen code minimizes sequential-fold squared L2
    * (ties to the smallest code: entries scan code-ascending and replace
    * only on strictly-smaller distance). Returns null — never a garbage
    * code — on any malformed input: empty codebook, non-contiguous or
    * unsorted subs, ragged centroid widths, or an embedding whose length
    * is not nSubs·w (wrong codebook for this corpus). */
  def encode(emb: ArrayData, cbs: ArrayData): ArrayData = {
    val ne = cbs.numElements()
    if (ne == 0) return null
    // first pass: width + sub count, validating the sorted-contiguous ABI
    val first = cbs.getStruct(0, 3)
    if (first.getInt(0) != 0) return null
    val w = {
      val c0 = first.getArray(2)
      if (c0 == null) return null
      c0.numElements()
    }
    if (w == 0) return null
    var maxSub = 0
    var i = 0
    var prevSub = 0
    while (i < ne) {
      if (cbs.isNullAt(i)) return null
      val s = cbs.getStruct(i, 3)
      val sub = s.getInt(0)
      if (sub < prevSub || sub > prevSub + 1) return null // sorted, contiguous
      val cent = s.getArray(2)
      if (cent == null || cent.numElements() != w) return null
      prevSub = sub
      if (sub > maxSub) maxSub = sub
      i += 1
    }
    val nSubs = maxSub + 1
    if (emb.numElements() != nSubs * w) return null
    val codes = new Array[Int](nSubs)
    val seen = new Array[Boolean](nSubs)
    val best = new Array[Double](nSubs)
    i = 0
    while (i < ne) {
      val s = cbs.getStruct(i, 3)
      val sub = s.getInt(0)
      val cent = s.getArray(2)
      val off = sub * w
      var d = 0.0
      var j = 0
      while (j < w) {
        val diff = emb.getFloat(off + j).toDouble - cent.getFloat(j).toDouble
        d += diff * diff
        j += 1
      }
      if (!seen(sub) || cmp(d, best(sub)) < 0) {
        seen(sub) = true; best(sub) = d; codes(sub) = s.getInt(1)
      }
      i += 1
    }
    new GenericArrayData(codes)
  }
}

/** pq_encode(embedding array<float>,
  *           cbs array<struct<sub int, code int, centroid array<float>>>)
  * → array<int>: per-subspace nearest-codebook-entry codes. Native because
  * encoding is the PQ lake's write-path per-row hot loop and the DataFrame
  * reference (explode subvectors → join codebook → rank window → reassemble)
  * shuffles m× the corpus twice; this is one broadcast projection. */
case class PqEncode(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "pq_encode"
  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(s: StructType, _))
          if s.length == 3 && s(0).dataType == IntegerType &&
            s(1).dataType == IntegerType &&
            (s(2).dataType match {
              case ArrayType(FloatType, _) => true
              case _ => false
            }) =>
        TypeCheckResult.TypeCheckSuccess
      case (f, s) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<float>, array<struct<int,int,array<float>>>), " +
          s"got (${f.simpleString(40)}, ${s.simpleString(40)})")
    }

  override def nullSafeEval(emb: Any, cbs: Any): Any =
    PqEncodeImpl.encode(emb.asInstanceOf[ArrayData], cbs.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (emb, cbs) => {
      // freshName: two instances in one generated function must not collide
      val r = ctx.freshName("pqCodes")
      s"""
      |ArrayData $r = graft.plans.PqEncodeImpl.encode($emb, $cbs);
      |if ($r == null) { ${ev.isNull} = true; }
      |else { ${ev.value} = $r; }
      |""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Kernel for [[PqAdcScore]] — asymmetric distance: Σ over subspaces of the
  * query's precomputed distance to the stored code, read from the flat
  * (sub-major, code-minor) lookup table. k derives from the table itself
  * (|table| / nSubs), so callers can't desync the stride. Null — never a
  * wrong score — on an empty/ragged table, an out-of-range code (codebook
  * mismatch), or a null table slot. */
object PqAdcScoreImpl {
  def score(codes: ArrayData, table: ArrayData): java.lang.Double = {
    val n = codes.numElements()
    val t = table.numElements()
    if (n == 0 || t == 0 || t % n != 0) return null
    val k = t / n
    var sum = 0.0
    var s = 0
    while (s < n) {
      val code = codes.getInt(s)
      if (code < 0 || code >= k) return null
      val idx = s * k + code
      if (table.isNullAt(idx)) return null
      sum += table.getDouble(idx)
      s += 1
    }
    sum
  }

  /** Packed-lake variant ([[Int8Pack]]'s byte layout, & 0xFF → 0..255). */
  def scoreBytes(codes: Array[Byte], table: ArrayData): java.lang.Double = {
    val n = codes.length
    val t = table.numElements()
    if (n == 0 || t == 0 || t % n != 0) return null
    val k = t / n
    var sum = 0.0
    var s = 0
    while (s < n) {
      val code = codes(s) & 0xFF
      if (code >= k) return null
      val idx = s * k + code
      if (table.isNullAt(idx)) return null
      sum += table.getDouble(idx)
      s += 1
    }
    sum
  }
}

/** pq_adc_score(codes array<int> | binary, table array<double>) → double:
  * the PQ probe's per-scanned-row hot loop — m table lookups and adds per
  * row, no decode, no per-row float materialization. The table is the
  * query-time artifact (m·k doubles, built once per query and broadcast);
  * the binary form reads the packed lake ([[Int8Pack]]) directly. */
case class PqAdcScore(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "pq_adc_score"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (BinaryType, ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (f, s) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<int> | binary, array<double>), got " +
          s"(${f.simpleString(40)}, ${s.simpleString(40)})")
    }

  private def packed: Boolean = left.dataType == BinaryType

  override def nullSafeEval(codes: Any, table: Any): Any =
    if (packed)
      PqAdcScoreImpl.scoreBytes(codes.asInstanceOf[Array[Byte]],
        table.asInstanceOf[ArrayData])
    else
      PqAdcScoreImpl.score(codes.asInstanceOf[ArrayData],
        table.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (packed) "scoreBytes" else "score"
    nullSafeCodeGen(ctx, ev, (codes, table) => {
      // freshName: two instances in one generated function must not collide
      val r = ctx.freshName("adcScore")
      s"""
      |java.lang.Double $r = graft.plans.PqAdcScoreImpl.$fn($codes, $table);
      |if ($r == null) { ${ev.isNull} = true; }
      |else { ${ev.value} = $r.doubleValue(); }
      |""".stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
