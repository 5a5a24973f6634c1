package graft.operators

import graft.{SparkEntry, SparkSpec}
import graft.functions.ExactSelect
import org.apache.spark.sql.functions._

/** Round-20 semantic pins: the WIDE-DOMAIN percentile-IVM rung (q281 —
  * coarse maintained buckets + the 256-ary in-bucket refinement) proven
  * BOTH-PATHS on a synthetic clustered 2⁵⁰-wide domain (refine-drill ≡
  * sorted truth; maintained bucket state MEASURED at a small fraction of
  * per-value state), plus edge pins for
  * [[graft.functions.ExactSelect.valuesAtRanks]] — the caller-seeded
  * refinement walk the drill rides. */
class R20QuerySemanticsSpec extends SparkSpec {
  import spark.implicits._

  test("q281 declared result ≡ direct row_number drill over the surviving set (both paths, declared fixture)") {
    // path A: the declared maintained-bucket + refinement query
    val declared = SparkEntry.queries("q281_ivm_wide_percentile")(
        spark, sfDir)
      .as[(String, Long, Long, Long)].collect().sortBy(_._1).toSeq
    // path B: the one-level q276-shape drill — exact order statistics
    // via a full rank pass over the SAME surviving set (affordable here,
    // unaffordable at a 2⁴⁰-wide bucket's population — which is the
    // point of path A)
    val vExpr = (col("l_orderkey") % 4194304L) * 1099511627776L +
      (col("l_partkey") % 1048576L) * 1048576L +
      (col("l_suppkey") % 1048576L)
    val surviving = graft.Tables.lineitem(spark, sfDir)
      .filter(col("l_orderkey") % 4 === 0 || col("l_suppkey") % 10 =!= 3)
      .select(col("l_returnflag").as("flag"), vExpr.as("v"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("flag").orderBy("v")
    val direct = surviving
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("flag")))
      .groupBy("flag")
      .agg(max(col("n")).as("n_rows"),
        max(when(col("rn") === expr("(n + 1) div 2"), col("v")))
          .as("p50_v"),
        max(when(col("rn") === expr("(9 * n + 9) div 10"), col("v")))
          .as("p90_v"))
      .as[(String, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(declared == direct,
      s"refine-drill ≠ row_number drill:\n refine $declared\n direct $direct")
  }

  test("synthetic clustered 2^50-wide domain: coarse-bucket state ≪ per-value state, locate + refinement stays exact") {
    // 24k rows in 3 groups, values CLUSTERED around 50 wide-apart
    // centers (the realistic wide-domain shape: ids/timestamps cluster;
    // a uniform-sparse domain has bucket count ≈ row count and nothing
    // helps) — per-value state is ~rows-sized, coarse 2^40 buckets are
    // ~centers-sized
    val n = 24000L
    val rows = spark.range(n).select(
      (col("id") % 3).cast("string").as("g"),
      ((col("id") % 50L) * 35184372088832L +
        (col("id") * 997L) % 10000000L).as("v"))
      .persist()
    try {
      val distinctValues = rows.select("g", "v").distinct.count()
      val bucketState = rows
        .groupBy(col("g"), shiftright(col("v"), 40).as("b"))
        .agg(count(lit(1)).as("cnt"))
        .persist()
      try {
      val bucketRows = bucketState.count()
      info(s"[wide-ivm] per-value state $distinctValues rows, " +
        s"coarse-bucket state $bucketRows rows")
      assert(bucketRows * 20 < distinctValues,
        s"bucket state $bucketRows not ≪ per-value $distinctValues")
      // locate each group's p50/p90 bucket + residual rank from the
      // MAINTAINED counts (driver-sized: groups × buckets ≤ 150 rows)
      val hist = bucketState.collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .groupBy(_._1)
      val bw = 1099511627776L
      val probes = hist.toSeq.flatMap { case (g, bs) =>
        val sorted = bs.sortBy(_._2)
        val total = sorted.map(_._3).sum
        Seq(0 -> ((total + 1) / 2), 1 -> ((9 * total + 9) / 10)).map {
          case (pid, rank) =>
            var rem = rank
            val it = sorted.iterator
            var chosen: (String, Long, Long) = null
            while (chosen == null && it.hasNext) {
              val e = it.next()
              if (e._3 >= rem) chosen = e else rem -= e._3
            }
            (g: Any, pid, chosen._2 * bw, chosen._2 * bw + (bw - 1L), rem)
        }
      }
      val resolved = ExactSelect.valuesAtRanks(rows, "g", "v", probes)
      // truth: driver-side sorted order statistics (n is small HERE)
      val byG = rows.as[(String, Long)].collect().groupBy(_._1)
        .map { case (g, vs) => g -> vs.map(_._2).sorted }
      byG.foreach { case (g, vs) =>
        val nn = vs.length.toLong
        assert(resolved((g, 0)) == vs(((nn + 1) / 2 - 1).toInt),
          s"group $g p50")
        assert(resolved((g, 1)) == vs(((9 * nn + 9) / 10 - 1).toInt),
          s"group $g p90")
      }
      } finally bucketState.unpersist()
    } finally rows.unpersist()
  }

  test("valuesAtRanks edges: duplicates, boundary ranks, interval-restricted probes, multi-group one walk") {
    // duplicates straddling bucket boundaries; explicit intervals that
    // EXCLUDE part of the group's values (the drill's normal case)
    val df = Seq(
      ("a", 5L), ("a", 5L), ("a", 5L), ("a", 7L), ("a", 1000000L),
      ("a", 1000000L), ("b", -20L), ("b", -20L), ("b", 0L), ("b", 3L)
    ).toDF("g", "v")
    val got = ExactSelect.valuesAtRanks(df, "g", "v", Seq(
      ("a", 0, 0L, 100L, 1L),          // k=1 in [0,100] -> 5
      ("a", 1, 0L, 100L, 4L),          // k=4 in [0,100] -> 7 (dups before)
      ("a", 2, 101L, 2000000L, 2L),    // k=2 in upper interval -> 1000000
      ("b", 0, -100L, 100L, 2L),       // negative lo: k=2 -> -20 (dup)
      ("b", 1, -100L, 100L, 4L)))      // k=n -> 3
    assert(got == Map(("a", 0) -> 5L, ("a", 1) -> 7L,
      ("a", 2) -> 1000000L, ("b", 0) -> -20L, ("b", 1) -> 3L), s"$got")
    // a rank past the interval's population fails loudly, not silently
    intercept[IllegalArgumentException] {
      ExactSelect.valuesAtRanks(df, "g", "v", Seq(("a", 0, 0L, 10L, 5L)))
    }
  }
}
