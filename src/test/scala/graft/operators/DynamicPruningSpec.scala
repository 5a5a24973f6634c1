package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Dynamic partition pruning on a partitioned fact ⋈ filtered dim join —
  * the scan feature a 100 TB month-partitioned fact table lives or dies
  * by: the dim-side filter's key set is broadcast into the fact scan's
  * PartitionFilters at RUNTIME, so only matching partitions are read,
  * without the user hand-writing the partition predicate. Static pruning
  * (a literal predicate reaching PartitionFilters) is pinned by
  * IvfStorageSpec; THIS pins the dynamic, join-driven form.
  */
class DynamicPruningSpec extends SparkSpec {

  test("a selective dim filter prunes the partitioned fact scan at runtime (DPP)") {
    val dir = TempDirs.scoped("graft-dpp")
    Tables.lineitem(spark, sfDir)
      .withColumn("ship_mon", date_format(col("l_shipdate"), "yyyy-MM"))
      .write.mode("overwrite").partitionBy("ship_mon").parquet(dir)
    val fact = spark.read.parquet(dir)
    val months = fact.select("ship_mon").distinct()
      .orderBy("ship_mon").collect().map(_.getString(0))
    assert(months.length > 10, "fixture must span many partitions")
    val picked = months.take(2)
    // dim: one row per month with an attribute to filter on — the filter
    // admits exactly two months, so a pruned scan reads 2/nParts of them
    val dim = fact.select(col("ship_mon")).distinct()
      .withColumn("campaign",
        when(col("ship_mon").isin(picked: _*), "launch")
          .otherwise("none"))
    val q = fact.join(dim.filter(col("campaign") === "launch"), "ship_mon")
      .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("qty"))
    val n = q.collect()(0).getLong(0)
    assert(n > 0)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"fact scan must carry a dynamic pruning subquery:\n${plan.take(4000)}")
    // and the result matches the hand-pruned predicate
    val direct = fact
      .filter(col("ship_mon").isin(picked: _*))
      .agg(count(lit(1)), dsum(col("l_quantity"))).collect()(0)
    assert(n == direct.getLong(0))
  }
}
