package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling utilities for hot keys at scale. AQE's skew-join splitting
  * covers joins; these cover aggregation and explicit salting, for cases
  * where one key holds an outsized share of a 100 TB table and a single
  * reducer would otherwise own it.
  */
object SkewTools {

  /** The shared salt. Determinism contract: the salt only needs to SPREAD
    * rows, not be stable — saltedAgg's (partial, final) pairs are
    * re-aggregable and saltedJoin's dimension carries every salt value, so
    * any salt assignment yields the same final result. A task retry may
    * re-salt its rows differently (monotonically_increasing_id is
    * deterministic only per input-split order), which is safe because each
    * salted output row is itself recomputed from the same retried split. */
  private def saltCol(buckets: Int): Column =
    pmod(spark_partition_id() + monotonically_increasing_id(), lit(buckets))

  /** Two-phase (salted) aggregation: groupBy(keys :+ salt) partial-aggregate,
    * then groupBy(keys) final-aggregate. Every aggregate must be expressed as
    * (partial, final) column pairs that compose correctly — the helper takes
    * re-aggregable pairs like (sum, sum), (count→sum), (min, min), (max, max).
    * Results are identical to a direct groupBy (tested): the hot key's rows
    * are spread over `buckets` reducers in phase 1 and combined in a tiny
    * phase 2.
    *
    * When to reach for this (measured, SkewJoinSpec): for decomposable
    * aggregates Spark's map-side partial aggregation ALREADY collapses a hot
    * key to ~1 row per map task, so this helper ties — not beats — a direct
    * groupBy there. Its value is the shapes partial aggregation cannot
    * collapse: per-key state that grows with the values (collect_list/
    * collect_set buffers), or engines/paths without map-side combine. For
    * hot-key JOINS, where the win is real and large, use [[saltedJoin]].
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], buckets: Int,
                partials: Seq[(Column, String)],
                finals: Seq[(String, Column)]): DataFrame = {
    require(buckets > 0)
    val salted = df.withColumn("__salt", saltCol(buckets))
    val phase1 = salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(partials.head._1.as(partials.head._2),
        partials.tail.map { case (c, n) => c.as(n) }: _*)
    phase1
      .groupBy(keys.map(col): _*)
      .agg(finals.head._2.as(finals.head._1),
        finals.tail.map { case (n, c) => c.as(n) }: _*)
  }

  /** Salted equi-join for a hot-keyed fact side against a small-but-not-
    * broadcastable dimension, for paths where AQE's skew-join splitting is
    * unavailable (it only rewrites sort-merge/shuffled-hash joins it can
    * re-plan; a pinned non-AQE plan, or an exchange reused by other
    * consumers, gets no help). The fact side is salted into `buckets`
    * sub-keys; the dimension is replicated once per bucket; the join runs on
    * keys :+ salt, so a key that owns most of the table spreads over
    * `buckets` reducers instead of sorting in one.
    *
    * Multiplicity: each fact row carries exactly one salt and the dimension
    * carries every salt exactly once, so fact-side join multiplicity is
    * unchanged — `inner`, `left` and `left_semi`/`left_anti` are safe.
    * Right/full-outer are rejected: an unmatched dimension row would
    * surface `buckets` times. */
  def saltedJoin(facts: DataFrame, dim: DataFrame, keys: Seq[String],
                 buckets: Int, joinType: String = "inner"): DataFrame = {
    require(buckets > 0)
    require(Set("inner", "left", "leftouter", "leftsemi", "leftanti")
      .contains(joinType.toLowerCase.replace("_", "")),
      s"saltedJoin preserves fact-side multiplicity only; '$joinType' would " +
        "replicate unmatched dimension rows")
    val salted = facts.withColumn("__salt", saltCol(buckets))
    val replicated = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated, keys :+ "__salt", joinType).drop("__salt")
  }

  /** Convenience: salted exact count + decimal-sum per key group. */
  def saltedCountSum(df: DataFrame, keys: Seq[String], valueCol: String,
                     buckets: Int = 16): DataFrame =
    saltedAgg(df, keys, buckets,
      partials = Seq(
        (count(lit(1)), "__n"),
        (sum(col(valueCol).cast("decimal(18,2)")), "__s")),
      finals = Seq(
        ("n", sum(col("__n"))),
        ("total", sum(col("__s")).cast("double"))))
}
