package graft.streaming

import graft.SparkSpec
import graft.operators.StreamEquivQueries
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The q224 integer 3σ gate on a STREAMING event side — the monitoring
  * deployment shape: per-type moments FROZEN from a batch refit, streamed
  * events judged row-by-row via a stateless stream-static broadcast join.
  * Flags must equal the batch run exactly (the verdict is pure integer
  * algebra, so there is nothing to drift). */
class StreamingOutlierSpec extends SparkSpec {
  import spark.implicits._

  // ten 0s + one far point per type: "b"'s 700 is > 3σ, "a"'s spread is not
  private val events: Seq[(Long, String, Long)] =
    (1L to 10L).map(i => (i, "a", (i % 3) * 10L)) ++
      ((101L to 110L).map(i => (i, "b", 0L)) :+ ((111L, "b", 700L)))

  test("streamed flags ≡ batch flags under frozen stats") {
    implicit val sc = spark.sqlContext
    val batch = events.toDF("event_id", "event_type", "cents")
    val stats = StreamEquivQueries.outlierStats(batch)
    val expected = StreamEquivQueries.flagOutliers(batch, stats)
      .as[(String, Long, Long, Boolean)].collect().toSet
    assert(expected.exists(_._4), "fixture must contain a flagged row")
    assert(expected.exists(!_._4), "fixture must contain unflagged rows")

    val mem = MemoryStream[(Long, String, Long)]
    val q = StreamEquivQueries.flagOutliers(
        mem.toDS().toDF("event_id", "event_type", "cents"), stats)
      .writeStream.format("memory").queryName("outlier_gate")
      .outputMode("append").start()
    try {
      mem.addData(events.take(5): _*)
      q.processAllAvailable()
      mem.addData(events.drop(5): _*)
      q.processAllAvailable()
      val got = spark.table("outlier_gate")
        .as[(String, Long, Long, Boolean)].collect().toSet
      assert(got == expected)
      // stateless: no state store operators in the executed stream
      assert(!q.lastProgress.json.contains("stateOperators\":[{"))
    } finally q.stop()
  }
}
