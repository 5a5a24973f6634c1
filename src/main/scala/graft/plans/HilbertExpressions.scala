package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Hilbert-curve index kernel: xy → d on the 2^bits × 2^bits grid.
  *
  * The Hilbert curve is the better multi-dimensional lake-clustering key
  * than the Morton/z-order curve ([[graft.operators.LakeLayout.zValue]]):
  * consecutive Hilbert indices are ALWAYS grid neighbours (|Δx|+|Δy| = 1),
  * so a file holding a contiguous Hilbert range is a connected, compact
  * region with no z-curve "seam jumps" — the long diagonal leaps that give
  * z-ordered files inflated min/max bounding boxes and admit them into
  * range scans they contain no rows for. Iceberg and recent Delta adopt
  * Hilbert over z-order for exactly this pruning win; q243 measures it on
  * the driver testdata (files read under a box predicate: linear vs
  * z-order vs Hilbert layout).
  *
  * Algorithm: the classic bit-level rotate/reflect walk (Hamilton 2006,
  * "Compact Hilbert indices", TR CS-2006-07; the xy2d form popularized by
  * Wikipedia's "Hilbert curve" pseudocode): from the top bit down, quadrant
  * q contributes s²·gray(q) to d and the frame rotates/reflects so the
  * child quadrant is traversed in canonical orientation. Pure integer
  * bit algebra — deterministic everywhere, and the DuckDB oracle replays
  * the identical walk as a 16-step recursive CTE (q242).
  */
object HilbertImpl {

  /** Map grid point (x, y) — low `bits` bits used — to its Hilbert index
    * d ∈ [0, 4^bits). Inputs are masked to the grid, so any non-negative
    * grid coordinate from [[graft.operators.LakeLayout.gridCoord]] is safe. */
  def xy2d(bits: Int, x0: Long, y0: Long): Long = {
    val mask = (1L << bits) - 1L
    var x = x0 & mask
    var y = y0 & mask
    var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      // rotate/reflect the frame so the child quadrant is canonical
      if (ry == 0L) {
        if (rx == 1L) {
          x = s - 1L - x
          y = s - 1L - y
        }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** Inverse walk d → (x, y): the spec's round-trip witness. */
  def d2xy(bits: Int, d0: Long): (Long, Long) = {
    var x = 0L
    var y = 0L
    var t = d0
    var s = 1L
    while (s < (1L << bits)) {
      val rx = 1L & (t / 2)
      val ry = 1L & (t ^ rx)
      if (ry == 0L) {
        if (rx == 1L) {
          x = s - 1L - x
          y = s - 1L - y
        }
        val tmp = x; x = y; y = tmp
      }
      x += s * rx
      y += s * ry
      t /= 4
      s <<= 1
    }
    (x, y)
  }
}

/** hilbert_d(gx, gy) → bigint: Hilbert index on the 2^16 grid (order 16,
  * matching [[graft.operators.LakeLayout.gridCoord]]'s default). Null-safe
  * binary expression over two BIGINT grid coordinates; the kernel is one
  * static call so codegen stays a single compiled expression (no generated
  * loop bodies to collide — but locals still go through freshName, per the
  * CLAUDE.md rule).
  */
case class HilbertIndex(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "hilbert_d"
  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable || right.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (f, s) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two bigint arguments, got " +
          s"(${f.simpleString(40)}, ${s.simpleString(40)})")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    HilbertImpl.xy2d(16, a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.plans.HilbertImpl.xy2d(16, $a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
