package graft.operators

import graft.Tables
import org.apache.spark.sql.functions._

/** Oracle-checkable slices of the reference's own ETL semantics (SURVEY §2A),
  * expressed over the driver testdata. The full TripEvent pipeline (codec
  * quirks, partitioned sink, streaming) lives in `graft.etl` /
  * `graft.streaming` and is ScalaTest-verified; these queries hash-check the
  * *derivable* parts against DuckDB.
  */
object EtlQueries extends QueryGroup {

  /** Q40: the reference's zero-padded bucket path
    * (`pickup_location=%03d/year=%04d/month=%02d`,
    * reference TripEventBucketAssigner.java:34-41), derived from event
    * payload exactly as the bucket assigner does. */
  private val q40: Q = (s, d) =>
    Tables.events(s, d)
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
      .select(
      col("event_id"),
      format_string("pickup_location=%03d/year=%04d/month=%02d",
        col("user_id"), year(col("ts")), month(col("ts"))).as("bucket_path"))
    .orderBy("event_id")

  /** Q40b: the serialize-side projection quirks (reference
    * TripEventSchema.java:96-138): timestamps → epoch millis, long id → JSON
    * string, payload subset. */
  private val q40b: Q = (s, d) =>
    Tables.events(s, d).select(
      col("event_id"),
      unix_millis(col("ts").cast("timestamp")).as("ts_millis"),
      col("event_id").cast("string").as("id_str"),
      col("event_type"))
    .orderBy("event_id")

  val queries: Seq[(String, Q)] = Seq(
    "q40_etl_bucket_path" -> q40,
    "q40b_etl_serialize" -> q40b,
  )

  val oracles: Map[String, String] = Map(
    "q40_etl_bucket_path" ->
      """SELECT event_id,
        |  printf('pickup_location=%03d/year=%04d/month=%02d',
        |         user_id, year(ts), month(ts)) AS bucket_path
        |FROM events
        |WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |ORDER BY event_id""".stripMargin,

    "q40b_etl_serialize" ->
      """SELECT event_id, epoch_ms(ts) AS ts_millis,
        |  CAST(event_id AS VARCHAR) AS id_str, event_type
        |FROM events ORDER BY event_id""".stripMargin,
  )
}
