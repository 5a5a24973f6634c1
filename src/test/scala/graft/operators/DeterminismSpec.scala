package graft.operators

import graft.{SparkEntry, SparkSpec}

/** The determinism contract (package.scala docs), EXECUTED: every double-
  * emitting query family must produce bit-identical rows regardless of
  * parallelism — exact decimal/integer aggregation makes merge order
  * irrelevant, and the single pinned IEEE step at the end is a pure
  * function of those exact values. A query that summed raw doubles would
  * flip low bits when the shuffle width (and thus partial-merge order)
  * changes; this spec is the tripwire that would catch such a regression
  * before the cross-engine oracle does.
  */
class DeterminismSpec extends SparkSpec {

  // one representative per double-emitting family: moments, broadcast
  // z-score, KMV estimate, histogram interpolation, value-histogram
  // percentiles, salted aggregation, vector cosine top-k, HLL, the
  // driver-solved Bradley–Terry fit, winsorized stats
  private val targets = Seq(
    "q90_agg_moments", "q117_anomaly_zscore", "q127_distinct_kmv_rollup",
    "q128_percentile_rollup", "q173_quantile_value_histogram",
    "q64_agg_salted_skew", "q38_sim_cosine_topk",
    "q248_distinct_hll_md5", "q245_bt_strength", "q158_agg_winsorized",
    // round 17: retraction-maintained rollup (exact-decimal ± algebra
    // surfaced as ONE double cast — the family where an order-dependent
    // sum would be catastrophic because retractions subtract)
    "q258_ivm_agg_retract",
    // round 18: the join-granularity retraction view (same ± algebra one
    // join deeper — signed deltas meeting a fact side) and the
    // non-abelian min/max readout over surviving histogram counts
    "q264_ivm_join_retract", "q268_ivm_minmax_retract")

  test("double-emitting queries are bit-identical across shuffle widths") {
    val conf = spark.conf
    val saved = conf.get("spark.sql.shuffle.partitions")
    def runAll(): Map[String, Seq[Seq[Any]]] =
      targets.map { q =>
        q -> SparkEntry.queries(q)(spark, sfDir)
          .collect().map(_.toSeq).toSeq
      }.toMap
    try {
      conf.set("spark.sql.shuffle.partitions", "32")
      val wide = runAll()
      conf.set("spark.sql.shuffle.partitions", "5")
      val narrow = runAll()
      targets.foreach { q =>
        assert(wide(q).nonEmpty, s"$q returned no rows")
        assert(wide(q) == narrow(q),
          s"$q differs across shuffle widths — an order-dependent " +
            "double aggregation crept in")
      }
    } finally conf.set("spark.sql.shuffle.partitions", saved)
  }
}
