package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed EXACT order statistics by value-domain bisection — the
  * bounded-memory answer to "exact median per group at any group size".
  *
  * Spark's exact `percentile` buffers every group's values inside one
  * aggregation buffer (memory ∝ largest group — fine until it isn't), and
  * mergeable histograms (q128) trade exactness away. Bisection pays with
  * PASSES instead: each round is one grouped conditional-count scan (map-side
  * partials, a dimension-sized result collected to the driver), and the
  * per-group search interval halves until lo = hi — ⌈log₂(range)⌉ rounds,
  * ~24 for a cents domain, independent of row count. All groups bisect
  * SIMULTANEOUSLY inside the same scan; converged groups leave the probe.
  *
  * The invariant per group: the k-th smallest value lies in [lo, hi]
  * (inclusive). A round counts n≤ = |{v ≤ mid}|; n≤ ≥ k keeps [lo, mid],
  * else [mid+1, hi]. Integer arithmetic throughout — mid = lo + (hi−lo)/2
  * never overflows and the loop terminates because the interval strictly
  * shrinks. The result is THE k-th order statistic (no interpolation).
  */
object ExactSelect {

  /** Exact k-th smallest `valueCol` (LONG) per `grpCol` group, with
    * per-group rank k = (n+1) div 2 — the lower median. Returns one row
    * per group: (grp, n, k, median). Runs ⌈log₂(max−min)⌉ grouped-count
    * jobs; the driver state is one (lo, hi, k) triple per group. */
  def medianByGroup(df: DataFrame, grpCol: String,
      valueCol: String): DataFrame = {
    val spark = df.sparkSession
    val base = df.select(col(grpCol).as("grp"), col(valueCol).as("v"))
      .filter(col("v").isNotNull)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val bounds = base.groupBy("grp")
        .agg(count(lit(1)).as("n"), min("v").as("lo"), max("v").as("hi"))
        .collect()
        .map(r => (r.get(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
        .toMap
      // rank of the lower median, fixed per group for the whole search
      val k = bounds.map { case (g, (n, _, _)) => g -> ((n + 1) / 2) }
      var live = bounds.map { case (g, (_, lo, hi)) => g -> ((lo, hi)) }
      while (live.exists { case (_, (lo, hi)) => lo < hi }) {
        val open = live.filter { case (_, (lo, hi)) => lo < hi }
        val mids = open.map { case (g, (lo, hi)) => g -> (lo + (hi - lo) / 2) }
        // one scan probes every open group's mid: mid arrives as a literal
        // CASE table (dimension-sized), counts collapse map-side
        val midCol = mids.foldLeft(lit(null).cast("long")) {
          case (acc, (g, m)) =>
            when(col("grp") === lit(g), lit(m)).otherwise(acc)
        }
        val counts = base
          .filter(col("grp").isInCollection(open.keys.toSeq))
          .groupBy("grp")
          .agg(sum(when(col("v") <= midCol, 1L).otherwise(0L)).as("nle"))
          .collect()
          .map(r => (r.get(0), r.getLong(1))).toMap
        live = live.map {
          case (g, (lo, hi)) if lo < hi =>
            val mid = mids(g)
            if (counts(g) >= k(g)) g -> ((lo, mid)) else g -> ((mid + 1L, hi))
          case done => done
        }
      }
      import scala.jdk.CollectionConverters._
      val rows = live.toSeq.map { case (g, (lo, _)) =>
        org.apache.spark.sql.Row(g, bounds(g)._1, k(g), lo)
      }
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("grp",
          df.schema(grpCol).dataType),
        org.apache.spark.sql.types.StructField("n",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("median",
          org.apache.spark.sql.types.LongType)))
      spark.createDataFrame(rows.asJava, schema)
    } finally base.unpersist()
  }
}
