package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The Hilbert kernel's mathematical contract, pinned without any external
  * reference implementation: the curve properties THEMSELVES are the spec.
  */
class HilbertSpec extends SparkSpec {
  import spark.implicits._

  test("order-4 walk is a bijection and consecutive indices are grid neighbours") {
    val bits = 4
    val n = 1 << bits
    val cells = for (x <- 0L until n; y <- 0L until n)
      yield (x, y, HilbertImpl.xy2d(bits, x, y))
    // bijection onto [0, 4^bits)
    assert(cells.map(_._3).sorted.toSeq == (0L until (n.toLong * n)).toSeq)
    // THE Hilbert property (and the pruning argument vs Morton): every
    // consecutive index pair is an orthogonal grid step of length 1 —
    // a contiguous index range is always a connected region
    val byD = cells.sortBy(_._3)
    byD.sliding(2).foreach { case Seq((x1, y1, _), (x2, y2, _)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1L,
        s"seam jump between ($x1,$y1) and ($x2,$y2)")
    }
    // Morton at the same order: count its seam jumps to document the
    // contrast the q243 audit measures (the z-curve's diagonal leaps)
    def morton(x: Long, y: Long): Long = (0 until bits).map(i =>
      (((x >> i) & 1L) << (2 * i)) + (((y >> i) & 1L) << (2 * i + 1))).sum
    val zJumps = cells.map { case (x, y, _) => (x, y, morton(x, y)) }
      .sortBy(_._3).sliding(2).count {
        case Seq((x1, y1, _), (x2, y2, _)) =>
          math.abs(x1 - x2) + math.abs(y1 - y2) > 1L
      }
    assert(zJumps > 0, "Morton must exhibit seam jumps for the contrast to hold")
  }

  test("d2xy inverts xy2d at order 16 across the q243 grid sample") {
    val pts = Seq((0L, 0L), (65535L, 65535L), (0L, 65535L), (65535L, 0L),
      (12345L, 54321L), (40960L, 49151L), (1L, 2L), (32768L, 32767L))
    pts.foreach { case (x, y) =>
      val d = HilbertImpl.xy2d(16, x, y)
      assert(d >= 0L && d < (1L << 32))
      assert(HilbertImpl.d2xy(16, d) == ((x, y)), s"round-trip at ($x,$y)")
    }
  }

  test("hilbert_d expression ≡ HilbertImpl over a driver grid, null-safe, masked") {
    val df = Seq[(java.lang.Long, java.lang.Long)](
      (3L, 9L), (65535L, 0L), (null, 4L), (7L, null),
      // out-of-grid values mask to the low 16 bits
      (65536L + 3L, 9L))
      .toDF("gx", "gy")
      .withColumn("hv", call_function("hilbert_d", col("gx"), col("gy")))
      .collect()
    assert(df(0).getLong(2) == HilbertImpl.xy2d(16, 3L, 9L))
    assert(df(1).getLong(2) == HilbertImpl.xy2d(16, 65535L, 0L))
    assert(df(2).isNullAt(2) && df(3).isNullAt(2))
    assert(df(4).getLong(2) == HilbertImpl.xy2d(16, 3L, 9L))
  }
}
