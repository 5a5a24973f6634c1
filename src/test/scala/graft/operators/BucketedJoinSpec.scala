package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Bucketing = write-time co-location: both fact tables bucketed on the join
  * key join WITHOUT a shuffle — at 100 TB this converts the nightly
  * fact⋈fact join from the dominant exchange into a local zip of buckets.
  */
class BucketedJoinSpec extends SparkSpec {

  test("bucketed fact⋈fact join plans with no Exchange on either side") {
    // disable broadcast so the join actually exercises the co-located path
    // (at real scale neither side fits in memory anyway)
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
    Tables.lineitem(spark, sfDir)
      .write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("lineitem_bkt")
    Tables.orders(spark, sfDir)
      .write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("orders_bkt")

    val joined = spark.table("lineitem_bkt")
      .join(spark.table("orders_bkt"), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"))
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString

    // the bucketed scans feed the sort-merge join with NO exchange between
    // them and the join: everything below the join node is exchange-free
    // (the final single-column aggregation above it may still shuffle)
    val finalPlan = plan.split("== Initial Plan ==")(0) // AQE echoes both
    assert(finalPlan.contains("SortMergeJoin"), plan)
    val belowJoin = finalPlan.substring(finalPlan.indexOf("SortMergeJoin"))
    assert(!belowJoin.contains("Exchange hashpartitioning"), plan)
    assert(belowJoin.contains("Bucketed: true"))

    // same result as the unbucketed join
    val reference = Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
    assert(joined.except(reference).isEmpty && reference.except(joined).isEmpty)

    spark.sql("DROP TABLE lineitem_bkt")
    spark.sql("DROP TABLE orders_bkt")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
  }
}
