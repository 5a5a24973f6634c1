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

  test("q137: MAD flags the outlier a masked z-score misses; constant groups silent") {
    val dir = tmpDir("anomaly-mad")
    val t = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    // A: four zeros + 1000 — mean 200, σ = 400 ⇒ z-score z = 2 does NOT
    // flag (the outlier masks itself by inflating σ: breakdown point 0);
    // median 0, MAD 0 ⇒ dev 1000 > 3·0 DOES flag. B: constant → silent.
    val rows =
      (1L to 4L).map(i => (i, t, i, "A", 0.0, "{}")) ++
      Seq((5L, t, 5L, "A", 1000.0, "{}")) ++
      (6L to 9L).map(i => (i, t, i, "B", 7.0, "{}"))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val z = SparkEntry.queries("q117_anomaly_zscore")(spark, dir)
      .collect().map(_.getAs[Long]("event_id")).toSet
    assert(z.isEmpty, s"z-score should be masked here, flagged $z")
    val out = SparkEntry.queries("q137_anomaly_mad")(spark, dir)
      .collect().map(r => r.getAs[String]("event_type") ->
        ((r.getAs[Long]("n"), r.getAs[Double]("med"), r.getAs[Double]("mad"),
          r.getAs[Long]("n_outliers")))).toMap
    assert(out("A") == ((5L, 0.0, 0.0, 1L)), s"A=${out("A")}")
    assert(out("B") == ((4L, 7.0, 0.0, 0L)), "constant group must be silent")
  }
}
