package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class SkewToolsSpec extends SparkSpec {

  test("salted aggregation equals direct aggregation (incl. a hot key)") {
    // build a skewed table: one key owns ~90% of rows
    val base = Tables.lineitem(spark, sfDir)
      .withColumn("k", when(col("l_orderkey") % 10 < 9, lit("HOT"))
        .otherwise(col("l_returnflag")))
    val direct = base.groupBy("k")
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("total"))
    val salted = SkewTools.saltedCountSum(
      base.withColumnRenamed("l_quantity", "v"), Seq("k"), "v", buckets = 8)
    assert(direct.count() == salted.count())
    assert(direct.except(salted).isEmpty && salted.except(direct).isEmpty)
  }

  test("phase-1 spreads the hot key over multiple salt buckets") {
    val base = Tables.lineitem(spark, sfDir).withColumn("k", lit("ALL_ONE_KEY"))
    val salted = base.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(8)))
    // the single hot key must occupy >1 salt bucket, i.e. >1 reducer group
    assert(salted.select("__salt").distinct().count() > 1)
  }
}
