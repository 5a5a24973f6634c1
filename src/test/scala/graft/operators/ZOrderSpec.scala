package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** Pins [[LakeLayout]]: the Morton bit math against a Scala reference, and
  * the layout's data-skipping effect — a 2-d box over a z-ordered lake
  * materializes a multiplicative (fx·fy-ish) row fraction where a
  * single-column sort materializes min(fx, fy), measured via the parquet
  * scan's numOutputRows (row-group min/max pruning on BOTH columns).
  */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("zValue matches a Scala bit-interleave reference") {
    def ref(x: Long, y: Long): Long = (0 until 16).map(i =>
      (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))).sum
    val rows = Seq((3L, 5L), (0L, 0L), (65535L, 0L), (0L, 65535L),
      (65535L, 65535L), (12345L, 54321L), (1L, 32768L))
    val got = rows.toDF("x", "y")
      .select(col("x"), col("y"), LakeLayout.zValue(col("x"), col("y")).as("z"))
      .collect()
    got.foreach { r =>
      assert(r.getAs[Long]("z") == ref(r.getAs[Long]("x"), r.getAs[Long]("y")))
    }
  }

  test("gridCoord maps extremes to cell bounds and constants to zero") {
    val out = Seq((0L, 7L), (255L, 7L), (128L, 7L)).toDF("v", "c")
      .select(
        LakeLayout.gridCoord(col("v"), lit(0L), lit(255L)).as("g"),
        LakeLayout.gridCoord(col("c"), lit(7L), lit(7L)).as("gc"))
      .collect()
    assert(out.map(_.getAs[Long]("g")).toSet == Set(0L, 65535L, 128L * 65535L / 255L))
    assert(out.map(_.getAs[Long]("gc")).forall(_ == 0L))
  }

  private def scannedRows(df: DataFrame): Long = {
    df.collect()
    df.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case f: FileSourceScanExec =>
        f.metrics("numOutputRows").value }.get
  }

  test("2-d box over a z-ordered lake materializes fewer rows than over a single-sort lake") {
    // 256×256 uniform grid, 64 files of 1024 rows each
    val df = spark.range(65536).select(
        (col("id") % 256).as("x"), (col("id") / 256).cast("long").as("y"))
      .select(col("x"), col("y"), LakeLayout.zValue(
        LakeLayout.gridCoord(col("x"), lit(0L), lit(255L)),
        LakeLayout.gridCoord(col("y"), lit(0L), lit(255L))).as("zv"))
    val zDir = tmpDir("lake-z"); val linDir = tmpDir("lake-lin")
    LakeLayout.writeZOrdered(df, "zv", 64, zDir)
    df.repartitionByRange(64, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(linDir)

    def box(dir: String, x0: Int, y0: Int): DataFrame =
      spark.read.parquet(dir).filter(
        col("x") >= x0 && col("x") < x0 + 32 && col("y") >= y0 && col("y") < y0 + 32)

    // aligned corner box: the box IS a z-prefix block, so only the files
    // whose (sample-chosen) ranges overlap that prefix are read — a small
    // multiple of the 1024 matching rows, where the x-sorted layout reads
    // the box's whole x-slice (1/8 of the lake) regardless of y
    val zAligned = scannedRows(box(zDir, 0, 0))
    val linAligned = scannedRows(box(linDir, 0, 0))
    assert(box(zDir, 0, 0).count() == 1024L)
    // bound = a small multiple of the 1024 matching rows, NOT a fraction
    // of linear: repartitionByRange samples its bounds with an rdd.id-
    // seeded reservoir, so file boundaries shift a little with session
    // history (the full suite measured 4120 where isolation measured
    // ~3.6k — a `< linear/2` bound flaked at 4096 on exactly that)
    assert(zAligned <= 6 * 1024,
      s"aligned box: z=$zAligned should be a small multiple of the 1024 matching rows")
    assert(zAligned < linAligned,
      s"aligned box: z=$zAligned should undercut linear=$linAligned")
    assert(linAligned >= 65536L / 8,
      s"x-sorted layout must read at least the x-slice: $linAligned")

    // unaligned box inside one sub-quadrant: a handful of compact tiles vs
    // the full x-slice. (A box straddling the top-level split in BOTH dims
    // — e.g. (100,100) over the 128-midline — is Morton's documented worst
    // case: the curve jumps between all four quadrants and skipping decays
    // to the single-sort layout's; real z-order lakes accept the boundary
    // pathology because boxes are small relative to the keyspace.)
    val zOff = scannedRows(box(zDir, 72, 8))
    val linOff = scannedRows(box(linDir, 72, 8))
    assert(box(zDir, 72, 8).collect().toSet == box(linDir, 72, 8).collect().toSet)
    assert(zOff < linOff, s"z=$zOff should undercut linear=$linOff")
  }
}
