package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** The Hilbert layout's data-skipping effect on a REAL written lake —
  * the measurement behind q242/q243's pruning claims, ZOrderSpec's method
  * (parquet scan numOutputRows under row-group min/max pruning) run over
  * all three layouts on the same 256×256 uniform grid (64 files each).
  *
  * Measured (one representative run; bounds below leave slack for
  * repartitionByRange's sampled file boundaries):
  *
  *   box             z      hilbert  linear
  *   (0,0) aligned   3184   1072     8192
  *   (72,8)          5197   4003     8192
  *   (100,100) mid   9221   4966     8192   ← Morton's seam pathology
  *   (112,112)       5134   3973     8192
  *   (40,200)        5996   5315     8192
  *
  * The (100,100) box straddles the 128-midline in BOTH dimensions: the
  * z-curve jumps between all four quadrants there, its files' bounding
  * boxes span the seam, and skipping decays toward — and in some runs
  * past — the single-sort layout (7120–9221 across boundary-sampling
  * variations vs linear's 8192). Hilbert's neighbours-only steps keep
  * file bboxes compact
  * across the same seam — the concrete reason Iceberg/Delta moved to
  * Hilbert for multi-dim clustering.
  */
class HilbertLayoutSpec extends SparkSpec {

  private def scannedRows(df: DataFrame): Long = {
    df.collect()
    df.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case f: FileSourceScanExec =>
        f.metrics("numOutputRows").value }.get
  }

  test("hilbert lake: compact on aligned boxes, survives the midline seam that breaks Morton") {
    val df = spark.range(65536).select(
        (col("id") % 256).as("x"), (col("id") / 256).cast("long").as("y"))
      .select(col("x"), col("y"),
        LakeLayout.gridCoord(col("x"), lit(0L), lit(255L)).as("gx"),
        LakeLayout.gridCoord(col("y"), lit(0L), lit(255L)).as("gy"))
      .select(col("x"), col("y"),
        LakeLayout.zValue(col("gx"), col("gy")).as("zv"),
        call_function("hilbert_d", col("gx"), col("gy")).as("hv"))
    val zDir = tmpDir("hlake-z")
    val hDir = tmpDir("hlake-h")
    val lDir = tmpDir("hlake-l")
    LakeLayout.writeZOrdered(df.drop("hv"), "zv", 64, zDir)
    LakeLayout.writeZOrdered(df.drop("zv"), "hv", 64, hDir)
    df.repartitionByRange(64, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(lDir)

    def box(dir: String, x0: Int, y0: Int): DataFrame =
      spark.read.parquet(dir).filter(
        col("x") >= x0 && col("x") < x0 + 32 &&
          col("y") >= y0 && col("y") < y0 + 32)

    val boxes = Seq((0, 0), (72, 8), (100, 100), (112, 112), (40, 200))
    val m = boxes.map { case (bx, by) =>
      // correctness parity across layouts first (key columns only — each
      // layout's files carry their own clustering column)
      assert(box(hDir, bx, by).select("x", "y").collect().toSet ==
        box(lDir, bx, by).select("x", "y").collect().toSet,
        s"rows differ at ($bx,$by)")
      (bx, by) -> ((scannedRows(box(zDir, bx, by)),
        scannedRows(box(hDir, bx, by)),
        scannedRows(box(lDir, bx, by))))
    }.toMap

    // aligned corner: hilbert reads a small multiple of the 1024 matches
    assert(m((0, 0))._2 <= 4096, s"aligned hilbert scan blew up: ${m((0, 0))}")
    // hilbert undercuts the single-sort layout on EVERY box
    m.foreach { case (b, (_, h, l)) =>
      assert(h < l, s"hilbert $h !< linear $l at $b")
    }
    // the midline seam: Morton decays badly (measured 7120–9221 across
    // boundary-sampling variations, i.e. ~87%–113% of the linear layout's
    // 8192 — repartitionByRange's reservoir shifts file bounds with
    // session history, the ZOrderSpec-documented flake), Hilbert holds
    // around ~5000. Pin only the ordering, which is stable.
    val (zMid, hMid, _) = m((100, 100))
    assert(hMid < zMid,
      s"hilbert $hMid must beat Morton $zMid on the midline box")
    // and in aggregate over all probed boxes hilbert strictly wins
    val (zSum, hSum) = (m.values.map(_._1).sum, m.values.map(_._2).sum)
    assert(hSum < zSum, s"aggregate: hilbert $hSum !< z $zSum")
  }
}
