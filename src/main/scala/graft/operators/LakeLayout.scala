package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional lake clustering: Morton (z-order) layout.
  *
  * A 100 TB fact lake is usually range-filtered on MORE than one column
  * (user × time, key × value band). Sorting files by a single column makes
  * parquet min/max stats selective in that column only — every file spans
  * the full range of the others, so a 2-d box predicate still materializes
  * every row group the first dimension admits. Interleaving the bits of
  * both grid-normalized coordinates into one z-value and range-writing ON
  * the z-value gives every file a footprint compact in BOTH dimensions:
  * row-group min/max prune multiplicatively (~fx·fy of the data read
  * instead of min(fx, fy)), the Delta/Iceberg `ZORDER BY` recipe built
  * from plain Spark primitives. ZOrderSpec measures the effect (scan
  * numOutputRows, z vs single-column layout) and pins the bit math
  * against a Scala reference.
  *
  * Determinism: the z-value is pure integer bit algebra (unrolled shifts
  * and masks — codegen-friendly built-ins, no interpreted HOF, no UDF);
  * grid coordinates are exact BIGINT affine math with `div` (the q101
  * integer-space convention: doubles enter via floor(x·10⁶)), so DuckDB
  * mirrors every step bit-for-bit (q112).
  */
object LakeLayout {

  /** Interleave the low `bits` bits of two non-negative grid coordinates:
    * x occupies even output bits, y odd — the Morton code. Unrolled at
    * plan-build time into 2·bits shift/mask terms joined by `+` (disjoint
    * bits, so + ≡ |): stays inside whole-stage codegen. */
  def zValue(gx: Column, gy: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31]: $bits")
    val terms = (0 until bits).flatMap { i =>
      Seq(shiftleft(shiftright(gx, i).bitwiseAND(lit(1L)), 2 * i),
        shiftleft(shiftright(gy, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
    terms.reduce(_ + _)
  }

  /** Affine map of a BIGINT value onto the [0, 2^bits) grid:
    * `((v − vmin) · (2^bits − 1)) div max(vmax − vmin, 1)` — exact integer
    * math (ANSI-safe below |v−vmin| ≈ 1.4·10¹⁴ at bits=16), constant
    * range → cell 0. */
  def gridCoord(v: Column, vmin: Column, vmax: Column, bits: Int = 16): Column = {
    val span = greatest(vmax - vmin, lit(1L))
    call_function("div", (v - vmin) * lit((1L << bits) - 1), span)
  }

  /** Range-write `df` into `nFiles` files ordered by `zCol` — each file a
    * contiguous z-range, i.e. a region compact in every interleaved
    * dimension. One range-exchange (sampled boundaries), sorted within
    * partitions so row groups inside a file stay compact too.
    * `extraOptions` threads parquet writer options (e.g.
    * [[bloomOptions]]) into the rewrite. */
  def writeZOrdered(df: DataFrame, zCol: String, nFiles: Int, dir: String,
      extraOptions: Map[String, String] = Map.empty): Unit =
    df.repartitionByRange(nFiles, col(zCol))
      .sortWithinPartitions(zCol)
      .write.mode("overwrite").options(extraOptions).parquet(dir)

  /** Parquet writer options that add a BLOOM FILTER on `column` to every
    * written file — the point-lookup complement to sort/curve layouts:
    * row-group min/max stats only skip on clustered columns; an equality
    * probe on a HIGH-CARDINALITY column the lake is NOT sorted by reads
    * every row group (each spans the column's full range). A bloom filter
    * answers "definitely absent" per row group, so the probe materializes
    * only the group(s) that can contain the value — at 100 TB the
    * difference between a full-table scan and a handful of row groups.
    *
    * `expectedNdv` sizes the filter (per ROW GROUP, not per file —
    * parquet derives the bit size from it at the default 1% FPP; a few
    * hundred KB per row group at 10⁶ NDV). Read-side needs NOTHING: the
    * parquet-mr reader consults bloom filters during row-group filtering
    * whenever an equality predicate is pushed down (Spark's scan does
    * both by default). Dictionary-encoded chunks already prune exactly —
    * blooms matter precisely when cardinality overflows the dictionary
    * page (the 100 TB case), so BloomLakeSpec measures with dictionary
    * encoding disabled on the probe column, the honest at-scale regime.
    *
    * Measured (BloomLakeSpec, 2M rows / 16 files, point lookup on the
    * unsorted column): 2M rows materialized without blooms vs one file's
    * worth with — adopt for id-lookup lakes; reject for columns that are
    * already the sort key (min/max wins there for free). */
  def bloomOptions(column: String, expectedNdv: Long): Map[String, String] = {
    require(expectedNdv > 0, s"expectedNdv must be positive: $expectedNdv")
    Map(
      s"parquet.bloom.filter.enabled#$column" -> "true",
      s"parquet.bloom.filter.expected.ndv#$column" -> expectedNdv.toString)
  }
}
