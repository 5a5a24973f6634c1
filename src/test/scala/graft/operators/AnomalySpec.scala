package graft.operators

import graft.{SparkEntry, SparkSpec}

/** Pins q117's 3σ-squared anomaly rule: only genuine >3σ deviations flag,
  * statistics are per-group, and a zero-variance group flags nothing (the
  * strict inequality makes the degenerate case silent, not total). */
class AnomalySpec extends SparkSpec {
  import spark.implicits._

  test("q117: one heavy outlier flags, constant groups stay silent") {
    val dir = tmpDir("anomaly")
    val t = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    val rows =
      (1L to 99L).map(i => (i, t, i % 7, "A", 10.0, "{}")) ++
      Seq((100L, t, 1L, "A", 1000.0, "{}")) ++           // ≫ 3σ within A
      (101L to 110L).map(i => (i, t, i % 7, "B", 1000.0, "{}")) // constant: σ = 0
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val flagged = SparkEntry.queries("q117_anomaly_zscore")(spark, dir)
      .collect().map(_.getAs[Long]("event_id")).toSet
    // B's 1000.0 rows are normal WITHIN B — only A's outlier may flag
    assert(flagged == Set(100L), s"flagged=$flagged")
  }
}
