package graft.operators

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-19 semantic pins: q276 (bucketed wide-domain percentile IVM)
  * against the flat-histogram q273 — both on the declared fixture and on
  * a synthetic ~100k-distinct-value domain where the bucketed state is
  * MEASURED at a small fraction of the flat histogram's rows — and the
  * q264 probe-pruning claim turned into a metric pin on a custkey-sorted
  * lake (VERDICT r18 item 7). */
class R19QuerySemanticsSpec extends SparkSpec {
  import spark.implicits._

  test("q276 bucketed drill-down ≡ q273 flat histogram on the declared fixture") {
    val flat = SparkEntry.queries("q273_ivm_percentile_retract")(
        spark, sfDir)
      .as[(String, Long, Long, Long)].collect().sorted.toSeq
    val bucketed = SparkEntry.queries("q276_ivm_bucket_percentile")(
        spark, sfDir)
      .as[(String, Long, Long, Long)].collect().sorted.toSeq
    assert(bucketed == flat,
      s"bucketed ≠ flat:\n bucket $bucketed\n flat   $flat")
  }

  test("wide domain: bucketed state is buckets-sized, not distinct-values-sized, and the readout stays exact") {
    // ~100k distinct values across 2 segments, values spread over ~10M
    // cents — the regime where a flat (seg, value, count) histogram is
    // value-domain-sized and the 2^13-wide bucket state is not
    val base = spark.range(100000).select(
      concat(lit("S"), (col("id") % 2).cast("string")).as("seg"),
      (col("id") * 97L).as("v"))
    // the ± wave: ids ≡ 3 (mod 10) retract; ids ≡ 7 (mod 10) move their
    // value up by a constant (retract old, add new)
    val retire = spark.range(100000).filter(col("id") % 10 === 3)
      .select(concat(lit("S"), (col("id") % 2).cast("string")).as("seg"),
        (col("id") * 97L).as("v"), lit(-1L).as("dn"))
    val moveOut = spark.range(100000).filter(col("id") % 10 === 7)
      .select(concat(lit("S"), (col("id") % 2).cast("string")).as("seg"),
        (col("id") * 97L).as("v"), lit(-1L).as("dn"))
    val moveIn = spark.range(100000).filter(col("id") % 10 === 7)
      .select(concat(lit("S"), (col("id") % 2).cast("string")).as("seg"),
        (col("id") * 97L + 1000013L).as("v"), lit(1L).as("dn"))
    val deltas = retire.unionByName(moveOut).unionByName(moveIn)

    // FLAT path: maintained (seg, value, count) ± then nearest-rank
    val flatState = base.groupBy("seg", "v").agg(count(lit(1)).as("n"))
    val flatRows = flatState.count()
    val flatSurv = flatState.select(col("seg"), col("v"),
        col("n").as("dn"))
      .unionByName(deltas)
      .groupBy("seg", "v").agg(sum(col("dn")).as("n"))
      .filter(col("n") > 0)
    val cum = Window.partitionBy("seg").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.partitionBy("seg")
    val flatOut = flatSurv
      .withColumn("cum", sum(col("n")).over(cum))
      .withColumn("nr", sum(col("n")).over(tot))
      .groupBy("seg")
      .agg(max(col("nr")).as("n_rows"),
        min(when(col("cum") >= expr("(nr + 1) div 2"), col("v")))
          .as("p50"),
        min(when(col("cum") >= expr("(9 * nr + 9) div 10"), col("v")))
          .as("p90"))
      .as[(String, Long, Long, Long)].collect().sorted.toSeq

    // BUCKETED path: maintained (seg, v >> 13, count) ± then locate +
    // drill into the CURRENT rows of just the target buckets
    val bState = base.groupBy(col("seg"),
        shiftright(col("v"), 13).as("bucket"))
      .agg(count(lit(1)).as("n"))
    val bRows = bState.count()
    val bSurv = bState.select(col("seg"), col("bucket"),
        col("n").as("dn"))
      .unionByName(deltas.select(col("seg"),
        shiftright(col("v"), 13).as("bucket"), col("dn")))
      .groupBy("seg", "bucket").agg(sum(col("dn")).as("n"))
      .filter(col("n") > 0)
    val bcum = Window.partitionBy("seg").orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val located = bSurv
      .withColumn("cum", sum(col("n")).over(bcum))
      .withColumn("nr", sum(col("n")).over(tot))
    def target(which: String, rank: org.apache.spark.sql.Column) =
      located.withColumn("r", rank)
        .filter(col("cum") >= col("r") &&
          col("cum") - col("n") < col("r"))
        .select(col("seg"), col("bucket"),
          (col("r") - (col("cum") - col("n"))).as("resid"),
          lit(which).as("which"), col("nr"))
    val targets = target("p50", expr("(nr + 1) div 2"))
      .unionByName(target("p90", expr("(9 * nr + 9) div 10")))
    // current rows after the wave (what the lake holds): base minus
    // retractions plus additions
    val current = base
      .join(spark.range(100000)
        .filter(col("id") % 10 === 3 || col("id") % 10 === 7)
        .select(concat(lit("S"), (col("id") % 2).cast("string"))
          .as("seg"), (col("id") * 97L).as("v")),
        Seq("seg", "v"), "left_anti")
      .unionByName(moveIn.select("seg", "v"))
      .withColumn("bucket", shiftright(col("v"), 13))
    val bOut = current
      .join(broadcast(targets), Seq("seg", "bucket"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("seg", "bucket", "which").orderBy("v")))
      .filter(col("rn") === col("resid"))
      .groupBy("seg")
      .agg(max(col("nr")).as("n_rows"),
        min(when(col("which") === "p50", col("v"))).as("p50"),
        min(when(col("which") === "p90", col("v"))).as("p90"))
      .as[(String, Long, Long, Long)].collect().sorted.toSeq

    assert(bOut == flatOut,
      s"bucketed ≠ flat on the wide domain:\n bucket $bOut\n flat   $flatOut")
    // the state-size claim, MEASURED: bucket rows ≪ flat histogram rows
    info(s"flat state rows = $flatRows, bucketed state rows = $bRows " +
      f"(${flatRows.toDouble / bRows}%.1f x smaller)")
    assert(bRows * 20 < flatRows,
      s"bucketed state $bRows not ≪ flat $flatRows — the wide-domain claim fails")
  }

  test("q276 drill-down on a value-clustered lake: the literal bucket-range disjunction prunes row groups (metric pin)") {
    val dir = tmpDir("drillprune")
    val n = 200000L
    // a value-range-sorted lake storing the cents column (the maintained
    // corpus the drill-down reads at scale), 16 files
    spark.range(n).select(
        concat(lit("S"), (col("id") % 4).cast("string")).as("seg"),
        (col("id") * 53L % 10000000L).as("bal_cents"))
      .repartitionByRange(16, col("bal_cents"))
      .sortWithinPartitions("bal_cents")
      .write.mode("overwrite").parquet(dir)
    val lake = spark.read.parquet(dir)
    // two target buckets (the p50/p90 shape): literal value ranges,
    // exactly the q276 drill predicate form
    val buckets = Seq(5000000L >> 13, 9000000L >> 13)
    val pred = buckets
      .map(b => col("bal_cents").between(b * 8192L, b * 8192L + 8191L))
      .reduce(_ || _)
    val drill = lake.filter(pred)
    drill.collect()
    val scanned = drill.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case f: FileSourceScanExec =>
        f.metrics("numOutputRows").value }.get
    // the two buckets live in 2 of the 16 range-sorted files (~12.5k
    // rows each, file sizes vary with range partitioning) — assert a
    // 4-file bound so the pin is about PRUNING, not file-boundary luck
    info(s"drill scan read $scanned of $n lake rows for ${buckets.size} target buckets")
    assert(scanned < n / 4,
      s"drill scanned $scanned of $n — the range disjunction is not pruning the value-sorted lake")
    // and the pruned read is exactly the bucket membership
    val expect = (0L until n).map(i => i * 53L % 10000000L)
      .count(c => buckets.contains(c >> 13)).toLong
    assert(drill.count() == expect)
  }

  test("q264 probe on a custkey-sorted lake: pushed cohort bounds prune the fact scan (metric pin)") {
    val dir = tmpDir("ivmprobe")
    val nC = 20000L
    val nO = 200000L
    // a custkey-range-sorted orders lake, 16 files (the ScaleBench ivm
    // layout); random cents so dictionary/RLE can't hide scan volume
    spark.range(nO).select(
        pmod(xxhash64(col("id")), lit(nC)).as("c_custkey"),
        (pmod(xxhash64(col("id"), lit(7L)), lit(90000L)) + 100L)
          .as("cents"))
      .repartitionByRange(16, col("c_custkey"))
      .sortWithinPartitions("c_custkey")
      .write.mode("overwrite").parquet(dir)
    val lake = spark.read.parquet(dir)
    // the touched cohort: top 1% of the keyspace, bounds PUSHED into the
    // scan (the q264 scaladoc's layout lever)
    val lo = nC - nC / 100
    val dC = spark.range(nC).filter(col("id") >= lo)
      .select(col("id").as("c_custkey"), lit("SEGX").as("seg"),
        lit(1L).as("sgn"))
    // the scan-side measurement (the BloomLakeSpec method — a bare
    // filtered scan so the metric leaf is reachable; the probe's join
    // adds AQE stages around the SAME scan + predicate)
    val scanDf = lake.filter(col("c_custkey") >= lo)
    scanDf.collect()
    val scanned = scanDf.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case f: FileSourceScanExec =>
        f.metrics("numOutputRows").value }.get
    info(s"probe scan read $scanned of $nO lake rows")
    assert(scanned < nO / 8,
      s"probe scanned $scanned of $nO — cohort bounds are not pruning the sorted lake")
    // correctness of the pruned probe: equals the unpruned join
    val probe = lake.filter(col("c_custkey") >= lo)
      .join(dC, Seq("c_custkey"))
      .groupBy("seg")
      .agg(sum(col("sgn") * col("cents")).as("ds"))
    val full = lake.join(dC, Seq("c_custkey"))
      .groupBy("seg").agg(sum(col("sgn") * col("cents")).as("ds"))
      .as[(String, Long)].collect().toMap
    val pruned = probe.as[(String, Long)].collect().toMap
    assert(pruned == full, "pruned probe ≠ full join")
  }
}
