package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Partition pruning: writes partitioned by a predicate column are the
  * cheapest data-skipping lever at scale — a filtered read must touch only
  * the matching directories (visible as PartitionFilters + pruned file
  * count in the scan). */
class PartitionPruningSpec extends SparkSpec {

  test("filtered read over a partitioned layout prunes to matching partitions") {
    val out = tmpDir("part-out")
    Tables.events(spark, sfDir)
      .write.mode("overwrite").partitionBy("event_type").parquet(out)
    val all = spark.read.parquet(out)
    val one = all.filter(col("event_type") === "click")
    val n = one.count()
    assert(n > 0 && n < all.count())
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(event_type"), plan)
    // only the click directory's files are selected
    def filesRead(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      df.queryExecution.executedPlan.collectLeaves()
        .collectFirst { case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.metrics("numFiles").value }.get
    }
    val scanned = filesRead(one)
    val total = filesRead(spark.read.parquet(out))
    assert(scanned < total, s"scanned=$scanned total=$total")
  }
}
