package graft.streaming

import graft.{SparkEntry, SparkSpec, Tables}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streaming MATCH_RECOGNIZE ≡ batch q246: the per-key running state form
  * must converge to the batch window aggregate over the same events when
  * micro-batches arrive in event-time order (the replay contract).
  */
class StreamingMatchSpec extends SparkSpec {
  import spark.implicits._

  test("stateful V N* P matcher ≡ batch q246 over time-split micro-batches") {
    implicit val sc = spark.sqlContext
    // the real event fixture, split into three event-time waves
    val ev = Tables.events(spark, sfDir)
      .withColumn("us", graft.operators.epochUs(col("ts")))
      .select(col("user_id"), col("us"), col("event_id"), col("event_type"))
      .as[(Long, Long, Long, String)]
      .collect().sortBy(r => (r._2, r._3))
    val waves = {
      val n = ev.length
      Seq(ev.slice(0, n / 3), ev.slice(n / 3, 2 * n / 3),
        ev.slice(2 * n / 3, n))
    }
    val mem = MemoryStream[(Long, Long, Long, String)]
    val q = SequenceMatch.matches(
        mem.toDF().toDF("user_id", "us", "event_id", "event_type"))
      .writeStream.format("memory").queryName("seq_match")
      .outputMode(OutputMode.Update()).start()
    waves.foreach { w => mem.addData(w.toSeq: _*); q.processAllAvailable() }
    q.stop()
    // Update mode re-emits a user's row each batch it appears in — the
    // LAST emission per user is the final state (memory sink appends)
    val streamed = spark.table("seq_match")
      .withColumn("rn", monotonically_increasing_id())
      .groupBy("user_id")
      .agg(max(struct(col("rn"), col("n_purchases"),
        col("n_clean_conversions"), col("first_match_pos"))).as("s"))
      .select(col("user_id"), col("s.n_purchases"),
        col("s.n_clean_conversions"), col("s.first_match_pos"))
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap

    val batch = SparkEntry.queries("q246_seq_match_recognize")(spark, sfDir)
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap

    assert(streamed.keySet == batch.keySet)
    batch.keySet.foreach { u =>
      assert(streamed(u) == batch(u), s"user $u: stream ≠ batch")
    }
    // the fixture must exercise the interesting paths
    assert(batch.values.exists(_._3 > 0), "no clean conversions in fixture")
    assert(batch.values.exists(r => r._2 > r._3),
      "no error-blocked purchases in fixture")
  }

  test("stateful quantified V C+ P matcher ≡ batch q260 over time-split micro-batches") {
    implicit val sc = spark.sqlContext
    val ev = Tables.events(spark, sfDir)
      .withColumn("us", graft.operators.epochUs(col("ts")))
      .select(col("user_id"), col("us"), col("event_id"), col("event_type"))
      .as[(Long, Long, Long, String)]
      .collect().sortBy(r => (r._2, r._3))
    // FOUR waves with uneven cuts, so some click runs split across
    // micro-batch boundaries — the quantifier's state must carry the
    // open run (phase + runLen) across batches
    val waves = {
      val n = ev.length
      Seq(ev.slice(0, n / 5), ev.slice(n / 5, n / 2),
        ev.slice(n / 2, n / 2 + 7), ev.slice(n / 2 + 7, n))
    }
    val mem = MemoryStream[(Long, Long, Long, String)]
    val q = SequenceMatch.quantified(
        mem.toDF().toDF("user_id", "us", "event_id", "event_type"))
      .writeStream.format("memory").queryName("seq_quant")
      .outputMode(OutputMode.Update()).start()
    waves.foreach { w => mem.addData(w.toSeq: _*); q.processAllAvailable() }
    q.stop()
    val streamed = spark.table("seq_quant")
      .withColumn("rn", monotonically_increasing_id())
      .groupBy("user_id")
      .agg(max(struct(col("rn"), col("n_matches"),
        col("n_clicks_consumed"), col("first_match_start"),
        col("max_run_len"))).as("s"))
      .select(col("user_id"), col("s.n_matches"), col("s.n_clicks_consumed"),
        col("s.first_match_start"), col("s.max_run_len"))
      .as[(Long, Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap

    val batch = SparkEntry.queries("q260_seq_match_quantified")(spark, sfDir)
      .as[(Long, Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap

    // the stream only emits users it has SEEN; every seen user must agree
    // with the batch row, and every batch user with activity is seen
    assert(streamed.keySet == batch.keySet)
    batch.keySet.foreach { u =>
      assert(streamed(u) == batch(u), s"user $u: stream ≠ batch")
    }
    // the quantifier must actually consume variable-length runs
    assert(batch.values.exists(_._5 >= 2), "no multi-click run in fixture")
    assert(batch.values.exists(r => r._2 == 0), "no matchless user")
  }

  test("stateful V-shape matcher (predicate symbols) ≡ batch q261 across micro-batches") {
    implicit val sc = spark.sqlContext
    val ev = Tables.events(spark, sfDir)
      .withColumn("us", graft.operators.epochUs(col("ts")))
      .select(col("user_id"), col("us"), col("event_id"),
        (col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2))
          * 100).cast("long").as("cents"))
      .as[(Long, Long, Long, Long)]
      .collect().sortBy(r => (r._2, r._3))
    // uneven cuts so down runs and V apexes split across batches — the
    // automaton's peak/trough/runLen must carry over
    val waves = {
      val n = ev.length
      Seq(ev.slice(0, n / 7), ev.slice(n / 7, n / 3),
        ev.slice(n / 3, n / 3 + 5), ev.slice(n / 3 + 5, n))
    }
    val mem = MemoryStream[(Long, Long, Long, Long)]
    val q = SequenceMatch.vshapes(
        mem.toDF().toDF("user_id", "us", "event_id", "cents"))
      .writeStream.format("memory").queryName("seq_vshape")
      .outputMode(OutputMode.Update()).start()
    waves.foreach { w => mem.addData(w.toSeq: _*); q.processAllAvailable() }
    q.stop()
    val streamed = spark.table("seq_vshape")
      .withColumn("rn", monotonically_increasing_id())
      .groupBy("user_id")
      .agg(max(struct(col("rn"), col("n_vshapes"), col("total_drop_cents"),
        col("max_drop_cents"), col("max_down_len"))).as("s"))
      .select(col("user_id"), col("s.n_vshapes"), col("s.total_drop_cents"),
        col("s.max_drop_cents"), col("s.max_down_len"))
      .as[(Long, Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap

    val batch = SparkEntry.queries("q261_seq_match_vshape")(spark, sfDir)
      .as[(Long, Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap

    assert(streamed.keySet == batch.keySet)
    batch.keySet.foreach { u =>
      assert(streamed(u) == batch(u), s"user $u: stream ≠ batch")
    }
    // predicate symbols must actually quantify: some multi-step down run
    assert(batch.values.exists(_._5 >= 2), "no multi-step down run in fixture")
    assert(batch.values.exists(_._2 >= 2), "no repeat V-shaper in fixture")
  }
}
