package graft.operators

import graft.{SparkEntry, SparkSpec}

/** Pins the event-analytics semantics: funnel stage ORDER (q121) and
  * cohort membership stability (q122). */
class EventAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def writeEvents(dir: String,
      rows: Seq[(Long, String, Long, String)]): Unit =
    rows.map { case (id, tsStr, uid, tpe) =>
      (id, java.sql.Timestamp.valueOf(tsStr), uid, tpe, 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

  test("q121: stages only count when strictly ordered; partial funnels keep NULLs") {
    val dir = tmpDir("funnel")
    writeEvents(dir, Seq(
      // user 1: full ordered funnel
      (1L, "2024-01-01 10:00:00", 1L, "view"),
      (2L, "2024-01-01 10:05:00", 1L, "click"),
      (3L, "2024-01-01 10:10:00", 1L, "purchase"),
      // user 2: purchase BEFORE the click — must not count as converted
      (4L, "2024-01-02 09:00:00", 2L, "view"),
      (5L, "2024-01-02 09:10:00", 2L, "purchase"),
      (6L, "2024-01-02 09:20:00", 2L, "click"),
      // user 3: click before any view — no funnel at all past stage 1
      (7L, "2024-01-03 08:00:00", 3L, "click"),
      (8L, "2024-01-03 08:30:00", 3L, "view"),
      // user 4: never viewed — absent entirely
      (9L, "2024-01-04 07:00:00", 4L, "purchase")))
    val rows = SparkEntry.queries("q121_funnel_stages")(spark, dir)
      .collect().map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Boolean]("reached_click"), r.getAs[Boolean]("reached_purchase"))))
      .toMap
    assert(rows(1L) == ((true, true)))
    assert(rows(2L) == ((true, false)), "pre-click purchase must not convert")
    assert(rows(3L) == ((false, false)), "pre-view click must not count")
    assert(!rows.contains(4L), "view-less users have no funnel row")
  }

  test("q122: cohort = first-activity week, retention row per active week") {
    val dir = tmpDir("cohort")
    writeEvents(dir, Seq(
      // cohort week of 2024-01-01 (Mon): users 1, 2
      (1L, "2024-01-02 10:00:00", 1L, "view"),
      (2L, "2024-01-03 10:00:00", 2L, "view"),
      // week +1: only user 1 returns
      (3L, "2024-01-09 10:00:00", 1L, "click"),
      // cohort week of 2024-01-08: user 3 (first seen there)
      (4L, "2024-01-10 10:00:00", 3L, "view")))
    val rows = SparkEntry.queries("q122_cohort_retention")(spark, dir)
      .collect().map(r => (r.getAs[java.sql.Timestamp]("cohort_w").toString.take(10),
        r.getAs[Long]("week_offset"), r.getAs[Long]("active_n"),
        r.getAs[Long]("cohort_n"), r.getAs[Double]("retention"))).toSet
    assert(rows == Set(
      ("2024-01-01", 0L, 2L, 2L, 1.0),
      ("2024-01-01", 1L, 1L, 2L, 0.5),
      ("2024-01-08", 0L, 1L, 1L, 1.0)))
  }
}
