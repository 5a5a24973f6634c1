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
  * The lakes are written with DETERMINISTIC fixed-width key ranges (the
  * q243 50-file widths — see writeFixedWidth for why 50 and not a power
  * of four) instead of `writeZOrdered`'s repartitionByRange, whose
  * RESERVOIR-SAMPLED boundaries shift with session history and flaked
  * this spec twice (rounds 16 and 17) — the clustering geometry under
  * measurement is identical, the file boundaries just stop wobbling.
  * `writeZOrdered` itself stays covered by ZOrderSpec.
  *
  * Measured (reproducible exactly — arithmetic boundaries):
  *
  *   box             z      hilbert  linear
  *   (0,0) aligned   2622   1311     9216
  *   (72,8)          5243   5243     9216
  *   (100,100) mid   10486  7864     9216   ← Morton's seam pathology
  *   (112,112)       7865   5242     9216
  *   (40,200)        7864   3933     9216
  *
  * The (100,100) box straddles the 128-midline in BOTH dimensions: the
  * z-curve jumps between all four quadrants there, its files' bounding
  * boxes span the seam, and skipping decays PAST the single-sort layout
  * (10486 vs 9216 — now a deterministic fact, not a sampling accident).
  * Hilbert's neighbours-only steps keep file bboxes compact across the
  * same seam — the concrete reason Iceberg/Delta moved to Hilbert for
  * multi-dim clustering.
  */
class HilbertLayoutSpec extends SparkSpec {

  private def scannedRows(df: DataFrame): Long = {
    df.collect()
    df.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case f: FileSourceScanExec =>
        f.metrics("numOutputRows").value }.get
  }

  // 50 fixed-width ranges of the 32-bit curve key (gridCoord is 16 bits
  // per axis, so zv/hv span [0, 2^32); width = 2^32 div 50 + 1 = 85899346,
  // the q243 constant): DELIBERATELY not a power of four — power-of-4
  // widths make every file an exact quadtree tile for BOTH curves and the
  // Morton seam pathology vanishes by construction (measured: 4096 ≡ 4096
  // on the midline box at 2^26 widths). 50 misaligns boundaries from
  // quadrant corners the way real sampled range-writes do, while staying
  // ARITHMETIC — deterministic across sessions, unlike
  // repartitionByRange's reservoir boundaries (the round-16/17 flake).
  // repartition on the bucket id puts each bucket in one task,
  // partitionBy splits the write per bucket.
  private def writeFixedWidth(df: DataFrame, c: String, dir: String): Unit =
    df.withColumn("_b", expr(s"$c div 85899346"))
      .repartition(col("_b"))
      .sortWithinPartitions(c)
      .write.mode("overwrite").partitionBy("_b").parquet(dir)

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
    writeFixedWidth(df.drop("hv"), "zv", zDir)
    writeFixedWidth(df.drop("zv"), "hv", hDir)
    // linear: single-dimension sort, same fixed-width discipline
    // (x div 6 → 43 files of ≤6 x-columns each, ~the same file count)
    df.withColumn("_b", expr("x div 6"))
      .repartition(col("_b"))
      .sortWithinPartitions("x")
      .write.mode("overwrite").partitionBy("_b").parquet(lDir)

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

    info(s"[hilbert-layout] measured (z, hilbert, linear) per box: " +
      m.toSeq.sortBy(_._1).mkString(", "))
    // aligned corner: hilbert reads a small multiple of the 1024 matches
    assert(m((0, 0))._2 <= 4096, s"aligned hilbert scan blew up: ${m((0, 0))}")
    // hilbert undercuts the single-sort layout on EVERY box
    m.foreach { case (b, (_, h, l)) =>
      assert(h < l, s"hilbert $h !< linear $l at $b")
    }
    // the midline seam: Morton decays PAST linear (10486 vs 9216,
    // deterministic with arithmetic file boundaries), Hilbert holds at
    // 7864 — pin the ordering AND that Morton actually pays the seam
    val (zMid, hMid, lMid) = m((100, 100))
    assert(hMid < zMid,
      s"hilbert $hMid must beat Morton $zMid on the midline box")
    assert(zMid > lMid,
      s"the seam pathology should cost Morton ($zMid) more than " +
        s"single-sort ($lMid) on the both-dims midline box")
    // and in aggregate over all probed boxes hilbert strictly wins
    val (zSum, hSum) = (m.values.map(_._1).sum, m.values.map(_._2).sum)
    assert(hSum < zSum, s"aggregate: hilbert $hSum !< z $zSum")
  }
}
