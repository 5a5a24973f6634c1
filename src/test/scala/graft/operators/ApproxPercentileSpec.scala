package graft.operators

import graft.{SparkEntry, SparkSpec}

/** Pins q87's approx_percentile estimates against q52's exact percentiles
  * (the q49 HLL verification pattern: a sketch has no cross-engine oracle,
  * so the gate is an error bound vs the exact answer on the same data).
  * At accuracy 10000 over a ~6k-row-per-group fixture the rank error is
  * sub-row, so the estimate must land within the local value spread —
  * pinned here as 1% relative, far looser than observed, tight enough to
  * catch a broken sketch or a misread column. */
class ApproxPercentileSpec extends SparkSpec {

  test("approx percentiles track the exact percentiles within 1% relative error") {
    val exact = SparkEntry.queries("q52_agg_percentile")(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getDouble(3)))).toMap
    val approx = SparkEntry.queries("q87_agg_approx_percentile")(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(approx.keySet == exact.keySet)
    def close(a: Double, e: Double): Boolean = math.abs(a - e) <= 0.01 * math.abs(e)
    approx.foreach { case (flag, (m, p90, p25)) =>
      val (em, e90, e25) = exact(flag)
      assert(close(m, em), s"$flag median: $m vs exact $em")
      assert(close(p90, e90), s"$flag p90: $p90 vs exact $e90")
      assert(close(p25, e25), s"$flag p25: $p25 vs exact $e25")
    }
  }

  test("a repeat run also lands within the bound (no bit-equality claim — partial-sketch merge order is not guaranteed stable)") {
    val exact = SparkEntry.queries("q52_agg_percentile")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val again = SparkEntry.queries("q87_agg_approx_percentile")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    again.foreach { case (flag, m) =>
      assert(math.abs(m - exact(flag)) <= 0.01 * math.abs(exact(flag)),
        s"$flag repeat-run median $m vs exact ${exact(flag)}")
    }
  }
}

/** Merge-equivalence of the percentile sketch across partitionings — the
  * property that makes it safe as a 100 TB partial aggregate. Two regimes,
  * both pinned:
  *
  *  - At q87's accuracy (10000) each per-group summary stays uncompressed
  *    on fixture-sized groups, so partial merges are lossless and the
  *    estimates are bit-IDENTICAL whether the input arrives as 1, 8, or 32
  *    partitions.
  *  - Below that (accuracy 100, compression active) the merge is genuinely
  *    lossy and merge ORDER shows in the last digits — measured, not
  *    assumed: 1/8/32-partition runs differ. What survives any
  *    partitioning is the Greenwald-Khanna rank guarantee; pinned as the
  *    estimate's exact rank landing within 3ε of the target quantile.
  */
class SketchMergeEquivalenceSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  test("q87-accuracy estimates are identical across 1/8/32-partition inputs") {
    val li = graft.Tables.lineitem(spark, sfDir)
    val runs = Seq(1, 8, 32).map { n =>
      li.repartition(n)
        .groupBy("l_returnflag")
        .agg(expr("approx_percentile(l_extendedprice, 0.5, 10000)").as("m"),
          expr("approx_percentile(l_extendedprice, 0.9, 10000)").as("p90"),
          expr("approx_percentile(l_quantity, 0.25, 10000)").as("p25"))
        .orderBy("l_returnflag").collect()
        .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
        .toSeq
    }
    assert(runs(0) == runs(1) && runs(1) == runs(2),
      s"partitioning changed the q87 sketch output: $runs")
  }

  test("low-accuracy merged sketches keep the rank guarantee under any partitioning") {
    val eps = 1.0 / 100 // accuracy 100
    val li = graft.Tables.lineitem(spark, sfDir)
    val exact = li.select("l_returnflag", "l_extendedprice").collect()
      .groupBy(_.getString(0))
      .map { case (k, rows) => k -> rows.map(_.getDouble(1)).sorted }
    Seq(1, 8, 32).foreach { n =>
      val est = li.repartition(n)
        .groupBy("l_returnflag")
        .agg(expr("approx_percentile(l_extendedprice, 0.5, 100)").as("m"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      est.foreach { case (flag, m) =>
        val vals = exact(flag)
        val rank = vals.count(_ <= m).toDouble / vals.length
        assert(math.abs(rank - 0.5) <= 3 * eps,
          s"parts=$n $flag: estimate $m sits at rank $rank, beyond 3eps of the median")
      }
    }
  }
}
