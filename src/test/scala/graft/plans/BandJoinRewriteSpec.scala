package graft.plans

import graft.{SparkSpec, Tables}
import graft.operators.epochUs
import org.apache.spark.sql.functions._

/** The band-join optimizer rule: a NAIVE theta-join over a time band must
  * plan as a bucketed equi-join (no BNLJ / cartesian) and produce exactly
  * the naive join's results. */
class BandJoinRewriteSpec extends SparkSpec {

  private def events = Tables.events(spark, sfDir)
    .select(col("event_id"), col("user_id"), epochUs(col("ts")).as("us"))

  test("naive band self-join plans as an equi-join, results unchanged") {
    val width = 300000000L // 5 min in µs
    val a = events.select(col("event_id").as("a_id"), col("user_id"), col("us").as("a_us"))
    val b = events.select(col("event_id").as("b_id"), col("user_id").as("b_user"), col("us").as("b_us"))
    // naive formulation: equi on user + pure band on time
    val naive = a.join(b,
      col("user_id") === col("b_user") &&
        col("b_us") > col("a_us") && col("b_us") <= col("a_us") + width)
      .select("a_id", "b_id")
    naive.collect()
    val plan = naive.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"))
    assert(plan.contains("__graft_band_bucket") || plan.contains("HashJoin") ||
      plan.contains("SortMergeJoin"), plan.linesIterator.take(8).mkString("\n"))
    // results identical to the hand-bucketed q11 pairs
    val q11 = graft.SparkEntry.queries("q11_join_range")(spark, sfDir)
      .select("a_id", "b_id")
    assert(naive.except(q11).isEmpty && q11.except(naive).isEmpty)
  }

  test("pure band join with NO equi keys avoids BNLJ too") {
    val width = 60000000L // 1 min
    val small = events.limit(200)
    val a = small.select(col("event_id").as("a_id"), col("us").as("a_us"))
    val b = small.select(col("event_id").as("b_id"), col("us").as("b_us"))
    val naive = a.join(b,
      col("b_us") > col("a_us") && col("b_us") <= col("a_us") + width)
    val n = naive.count()
    val plan = naive.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      plan.linesIterator.take(8).mkString("\n"))
    // cross-check count against a collected reference
    val us = small.select("us").collect().map(_.getLong(0))
    val expected = (for { x <- us; y <- us if y > x && y <= x + width } yield 1).length
    assert(n == expected)
  }

  test("non-band joins are left untouched") {
    val df = Tables.orders(spark, sfDir)
      .join(Tables.customer(spark, sfDir), col("o_custkey") === col("c_custkey"))
    df.collect()
    assert(!df.queryExecution.optimizedPlan.toString.contains("__graft_band_bucket"))
  }
}
