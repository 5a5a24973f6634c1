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
