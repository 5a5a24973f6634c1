package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** SURVEY §2B streaming capabilities beyond the reference (M4): event-time
  * watermarks (late-data drop), tumbling window agg ≡ batch equivalent,
  * streaming dedup, and custom state via mapGroupsWithState +
  * transformWithState.
  */
class RunningTotalProcessor
    extends StatefulProcessor[String, (String, Int), (String, Long)] {
  @transient private var total: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    total = getHandle.getValueState[Long]("total", Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(key: String, rows: Iterator[(String, Int)],
                               timers: TimerValues): Iterator[(String, Long)] = {
    val next = (if (total.exists()) total.get() else 0L) + rows.map(_._2).sum
    total.update(next)
    Iterator.single((key, next))
  }
}

class StreamingOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("watermark drops late data (T1)") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val counts = mem.toDF().toDF("ts", "k")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes"), col("k"))
      .count()
    val q = counts.writeStream.format("memory").queryName("wm_counts")
      .outputMode(OutputMode.Append()).start()
    // batch 1: events up to 12:00 → watermark advances to 11:50
    mem.addData((ts("2024-01-01 11:00:00"), "a"), (ts("2024-01-01 12:00:00"), "a"))
    q.processAllAvailable()
    // batch 2: an event at 11:05 is far behind the watermark → dropped;
    // one at 11:58 is within the watermark → kept
    mem.addData((ts("2024-01-01 11:05:00"), "late"), (ts("2024-01-01 11:58:00"), "ok"))
    // advance watermark far so all open windows close and emit
    mem.addData((ts("2024-01-01 13:00:00"), "a"))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("wm_counts").select("k").as[String].collect().toSet
    assert(rows.contains("ok"))
    assert(!rows.contains("late"))
  }

  test("streaming tumbling window agg matches the batch equivalent (Q29 shape)") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val data = Seq(
      (ts("2024-01-01 10:05:00"), "click", 1.0),
      (ts("2024-01-01 10:55:00"), "click", 2.0),
      (ts("2024-01-01 11:05:00"), "view", 3.0),
      (ts("2024-01-01 10:15:00"), "view", 4.0))
    val agg = mem.toDF().toDF("ts", "event_type", "value")
      .withWatermark("ts", "1 minute")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("total"))
    val q = agg.writeStream.format("memory").queryName("tumbling")
      .outputMode(OutputMode.Complete()).start()
    mem.addData(data: _*)
    q.processAllAvailable()
    q.stop()
    val streaming = spark.table("tumbling")
      .select(col("window.start").as("hr"), col("event_type"), col("n"), col("total"))
    val batch = data.toDF("ts", "event_type", "value")
      .groupBy(date_trunc("hour", col("ts")).as("hr"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("total"))
    assert(streaming.except(batch).isEmpty && batch.except(streaming).isEmpty)
  }

  test("streaming dedup by key within watermark (Q32 twin)") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long)]
    val dedup = mem.toDF().toDF("ts", "event_id")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")
    val q = dedup.writeStream.format("memory").queryName("dedup")
      .outputMode(OutputMode.Append()).start()
    mem.addData((ts("2024-01-01 10:00:00"), 1L), (ts("2024-01-01 10:00:30"), 1L),
      (ts("2024-01-01 10:01:00"), 2L))
    q.processAllAvailable()
    q.stop()
    assert(spark.table("dedup").count() == 2)
  }

  test("transformWithState running counter (arbitrary state v2 API)") {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sc = spark.sqlContext
      val mem = MemoryStream[(String, Int)]
      val counted = mem.toDS()
        .groupByKey(_._1)
        .transformWithState(new RunningTotalProcessor(),
          TimeMode.None(), OutputMode.Update())
      val q = counted.toDF("k", "total").writeStream.format("memory")
        .queryName("tws").outputMode(OutputMode.Update()).start()
      mem.addData(("a", 2), ("b", 10), ("a", 3))
      q.processAllAvailable()
      mem.addData(("a", 5))
      q.processAllAvailable()
      q.stop()
      val last = spark.table("tws").groupBy("k").agg(max("total").as("t"))
        .as[(String, Long)].collect().toMap
      assert(last == Map("a" -> 10L, "b" -> 10L))
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("session_window groups events by 30-min inactivity gap (Q31 twin)") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long)]
    val sessions = mem.toDF().toDF("ts", "user_id")
      .withWatermark("ts", "1 minute")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .count()
    val q = sessions.writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Complete()).start()
    // user 1: two events 10 min apart (one session), then one 40 min later
    mem.addData((ts("2024-01-01 10:00:00"), 1L), (ts("2024-01-01 10:10:00"), 1L),
      (ts("2024-01-01 10:50:00"), 1L), (ts("2024-01-01 09:00:00"), 2L))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sessions")
      .select("user_id", "count").as[(Long, Long)].collect().toSeq.sorted
    assert(got == Seq((1L, 1L), (1L, 2L), (2L, 1L)))
  }

  test("stream-stream inner join with watermarked time bound") {
    implicit val sc = spark.sqlContext
    val clicks = MemoryStream[(Timestamp, Long)]
    val buys = MemoryStream[(Timestamp, Long)]
    val c = clicks.toDF().toDF("c_ts", "c_user").withWatermark("c_ts", "10 minutes")
    val b = buys.toDF().toDF("b_ts", "b_user").withWatermark("b_ts", "10 minutes")
    // purchase attributed to a click by the same user within 30 minutes
    val joined = c.join(b,
      expr("""c_user = b_user AND b_ts >= c_ts AND b_ts <= c_ts + interval 30 minutes"""))
    val q = joined.writeStream.format("memory").queryName("ssj")
      .outputMode(OutputMode.Append()).start()
    clicks.addData((ts("2024-01-01 10:00:00"), 1L), (ts("2024-01-01 10:00:00"), 2L))
    buys.addData((ts("2024-01-01 10:20:00"), 1L),  // within window → joins
      (ts("2024-01-01 11:30:00"), 2L))             // outside 30 min → no join
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("ssj").select("c_user").as[Long].collect().toSeq
    assert(rows == Seq(1L))
  }

  test("stream-static join enriches a stream against a batch dimension") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Long]
    val dim = Seq((0L, "zero"), (1L, "one")).toDF("k", "name")
    val joined = mem.toDF().toDF("k").join(dim, "k")
    val q = joined.writeStream.format("memory").queryName("ssj2")
      .outputMode(OutputMode.Append()).start()
    mem.addData(0L, 1L, 5L)
    q.processAllAvailable()
    q.stop()
    assert(spark.table("ssj2").count() == 2) // 5 has no dim row
  }

  test("stateful running counter via mapGroupsWithState (custom state)") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(String, Int)]
    val counter = mem.toDS()
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (key: String, values: Iterator[(String, Int)], state: GroupState[Long]) =>
          val next = state.getOption.getOrElse(0L) + values.map(_._2).sum
          state.update(next)
          (key, next)
      }
    val q = counter.toDF("k", "running").writeStream.format("memory")
      .queryName("counter").outputMode(OutputMode.Update()).start()
    mem.addData(("a", 1), ("a", 2), ("b", 5))
    q.processAllAvailable()
    mem.addData(("a", 4))
    q.processAllAvailable()
    q.stop()
    val last = spark.table("counter").groupBy("k").agg(max("running").as("r"))
      .as[(String, Long)].collect().toMap
    assert(last == Map("a" -> 7L, "b" -> 5L))
  }

  test("streaming anomaly gate: q117's batch stats flag a live stream identically") {
    // the q117 doc's streaming twin: population moments are computed ONCE
    // over the historical batch (exact-decimal sums), broadcast as the
    // static side, and each arriving event is gated by the same squared-3σ
    // rule — the stream-static enrichment shape every monitoring deploy
    // uses. The flags must match what batch q117 would say for the same
    // rows.
    implicit val sc = spark.sqlContext
    import graft.operators.dsum
    val hist = (1 to 99).map(i => ("A", 10.0)) ++ Seq(("A", 1000.0)) ++
      (1 to 10).map(_ => ("B", 1000.0))
    val mu = col("sx") / col("n")
    val stats = hist.toDF("event_type", "value")
      .groupBy("event_type").agg(
        count(lit(1)).as("n"), dsum(col("value"), 2).as("sx"),
        dsum(col("value") * col("value"), 4).as("sxx"))
      .select(col("event_type"), mu.as("mu"),
        greatest(col("sxx") / col("n") - mu * mu, lit(0.0)).as("varp"))
    val mem = MemoryStream[(String, Double)]
    val flagged = mem.toDF().toDF("event_type", "value")
      .join(broadcast(stats), "event_type")
      .filter((col("value") - col("mu")) * (col("value") - col("mu")) >
        lit(9.0) * col("varp"))
    val q = flagged.writeStream.format("memory").queryName("anomaly")
      .outputMode(OutputMode.Append()).start()
    mem.addData(("A", 10.0), ("A", 900.0), ("B", 1000.0), ("B", 999.0))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("anomaly")
      .select("event_type", "value").as[(String, Double)].collect().toSet
    // A@900 is ≫3σ under A's stats; B@999 is a hair off a zero-variance
    // group's mean and flags too (varp 0 → any deviation exceeds 0);
    // B@1000 sits exactly on the mean and must NOT flag
    assert(got == Set(("A", 900.0), ("B", 999.0)))
  }
}
