package graft.streaming

import graft.SparkSpec
import graft.operators.IntervalJoin
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** IntervalJoin.pointInIntervals on a STREAMING point side: the stateless
  * band-enrich must emit exactly the batch pairs, with the interval table
  * static (the attribution shape of q159). */
class StreamingAttributionSpec extends SparkSpec {
  import spark.implicits._

  private val windows = Seq(
    // (user, purchase_id, w_start, w_end)
    (1L, 100L, 10L, 20L), (1L, 101L, 18L, 30L), (2L, 102L, 0L, 5L))
    .toDF("user_id", "purchase_id", "w_start", "w_end")

  private val clicks = Seq(
    // (user, click_id, t): 1 hits both overlapping windows, 2 hits one,
    // 3 hits none (wrong user), 4 hits none (outside)
    (1L, 1L, 19L), (1L, 2L, 12L), (3L, 3L, 19L), (2L, 4L, 50L))

  private def enrich(pts: org.apache.spark.sql.DataFrame) =
    IntervalJoin.pointInIntervals(pts, windows,
        key = "user_id", pointId = "click_id", t = "t",
        intervalId = "purchase_id", start = "w_start", end = "w_end",
        maxLen = 12L)
      .select("point_id", "interval_id")

  test("stream enrich emits exactly the batch pairs, statelessly") {
    implicit val sc = spark.sqlContext
    val expected = enrich(clicks.toDF("user_id", "click_id", "t"))
      .as[(Long, Long)].collect().toSet
    assert(expected == Set((1L, 100L), (1L, 101L), (2L, 100L)))
    val mem = MemoryStream[(Long, Long, Long)]
    val q = enrich(mem.toDS().toDF("user_id", "click_id", "t"))
      .writeStream.format("memory").queryName("attrib")
      .outputMode("append").start()
    try {
      mem.addData(clicks.take(2): _*)
      q.processAllAvailable()
      mem.addData(clicks.drop(2): _*)
      q.processAllAvailable()
      val got = spark.table("attrib").as[(Long, Long)].collect().toSet
      assert(got == expected)
    } finally q.stop()
  }
}
