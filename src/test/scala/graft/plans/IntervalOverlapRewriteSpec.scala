package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
import org.apache.spark.sql.functions._

/** IntervalOverlapRewrite: a naive SQL overlap join, with the conf set,
  * must plan as a banded equi-join (no nested-loop factor over the band)
  * and return exactly the naive results. */
class IntervalOverlapRewriteSpec extends SparkSpec with AdaptiveSparkPlanHelper {
  import spark.implicits._

  private def withWidth[T](w: Long)(body: => T): T = {
    spark.conf.set(IntervalOverlapRewrite.WidthConf, w.toString)
    try body
    finally spark.conf.unset(IntervalOverlapRewrite.WidthConf)
  }

  private def intervals(rows: (Long, Long, Long, Long)*): DataFrame =
    rows.toDF("k", "id", "s", "e")

  private def overlapJoin(iv: DataFrame): DataFrame = {
    val a = iv.select(col("k"), col("id").as("a_id"),
      col("s").as("a_s"), col("e").as("a_e"))
    val b = iv.select(col("k").as("kb"), col("id").as("b_id"),
      col("s").as("b_s"), col("e").as("b_e"))
    a.join(b, col("k") === col("kb") && col("a_id") < col("b_id") &&
        col("a_s") <= col("b_e") && col("b_s") <= col("a_e"))
      .select(col("k"), col("a_id"), col("b_id"))
  }

  private val fixture = intervals(
    (1L, 1L, 0L, 10L), (1L, 2L, 5L, 20L), (1L, 3L, 30L, 40L),
    (1L, 4L, 38L, 39L), (2L, 5L, 0L, 100L), (2L, 6L, 99L, 110L),
    (2L, 7L, 200L, 210L),
    // degenerate s > e row: naive drops it unless another interval spans
    // the inverted range; the rewrite must agree either way
    (1L, 8L, 9L, 3L))

  private def pairs(df: DataFrame): Set[(Long, Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("rewrite preserves the naive result set exactly (several widths)") {
    val expected = pairs(overlapJoin(fixture))
    assert(expected.nonEmpty)
    Seq(1L, 7L, 16L, 1000L).foreach { w =>
      val got = withWidth(w)(pairs(overlapJoin(fixture)))
      assert(got == expected, s"width $w diverged")
    }
  }

  test("with the conf set the plan explodes bands and drops the BNLJ") {
    def planOf(df: DataFrame): SparkPlan = {
      df.collect() // finalize AQE
      df.queryExecution.executedPlan
    }
    val naive = planOf(overlapJoin(fixture))
    // the naive plan keeps a nested-loop factor: equi on k only, the
    // overlap predicate rides the join condition — fine, but per-key
    // quadratic. (BHJ on k is what local sizes pick; the point is the
    // REWRITTEN plan gains the band equi-key.)
    val rewritten = withWidth(16L)(planOf(overlapJoin(fixture)))
    val gens = collect(rewritten) {
      case g: org.apache.spark.sql.execution.GenerateExec => g }
    assert(gens.size == 2, "both sides must explode to bands")
    assert(collect(rewritten) {
      case b: BroadcastNestedLoopJoinExec => b }.isEmpty,
      "banded join must not plan as a nested loop")
  }

  test("rule is a no-op when disabled or on already-banded joins") {
    // disabled: conf unset → plans carry no Generate
    val plain = overlapJoin(fixture)
    plain.collect()
    assert(collect(plain.queryExecution.executedPlan) {
      case g: org.apache.spark.sql.execution.GenerateExec => g }.isEmpty)
    // idempotence: the rewritten plan's own band conjuncts reference the
    // helper column, so a second optimizer pass must not re-explode
    withWidth(16L) {
      val df = overlapJoin(fixture)
      df.collect()
      val gens = collect(df.queryExecution.executedPlan) {
        case g: org.apache.spark.sql.execution.GenerateExec => g }
      assert(gens.size == 2, "fixpoint must stabilize at one banding")
    }
  }

  test("fan-out guard: a span wider than maxFanout raises, not multiplies") {
    // two "intervals" a million bands apart — the non-interval-join shape
    // the structural pattern can mistake (qty <= cap AND floor <= budget)
    val wide = intervals((1L, 1L, 0L, 50000000L), (1L, 2L, 10L, 20L))
    val err = intercept[Exception] {
      withWidth(16L)(overlapJoin(wide).collect())
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(err).exists(_.contains("IntervalOverlapRewrite")),
      s"expected the guard's message, got: ${messages(err)}")
    // raising the cap makes the same query complete (and agree with naive)
    spark.conf.set(IntervalOverlapRewrite.MaxFanoutConf, "5000000")
    try {
      val got = withWidth(16L)(pairs(overlapJoin(wide)))
      assert(got == pairs(overlapJoin(wide)))
    } finally spark.conf.unset(IntervalOverlapRewrite.MaxFanoutConf)
  }

  test("null starts/ends: no bands, no naive matches — identical results") {
    val iv = spark.createDataFrame(
      java.util.Arrays.asList(
        org.apache.spark.sql.Row(1L, 1L, null, 10L),
        org.apache.spark.sql.Row(1L, 2L, 5L, 20L),
        org.apache.spark.sql.Row(1L, 3L, 6L, 21L)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("s",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("e",
          org.apache.spark.sql.types.LongType))))
    val expected = pairs(overlapJoin(iv))
    val got = withWidth(8L)(pairs(overlapJoin(iv)))
    assert(got == expected)
    assert(expected == Set((1L, 2L, 3L)))
  }
}
