package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's JSON codec asymmetries (SURVEY §1.3) as declarative
  * column transforms. This is the core parity spec:
  *
  *  1. input timestamps are ISO-8601 *text*; output writes epoch-millis
  *     *numbers* (TripEventSchema.java:58-59 vs :102-104);
  *  2. output projects 18 of 20 fields — payment_type and padding dropped
  *     (toJson, TripEventSchema.java:96-138);
  *  3. `trip_id` is parsed as long but serialized as a JSON *string*
  *     (:74 vs :132,153-162); `type`/`store_and_fwd_flag` quoted, numerics
  *     unquoted;
  *  4. malformed input → dropped, never fails the stream (:78-82, :86-88);
  *  5. missing `trip_id` → 0, missing `padding` → ""; any other missing
  *     field drops the event (:53,74,76).
  */
object TripEventCodec {

  /** from_json of the wire format (quirk 1: ISO-8601 text timestamps). */
  private def decoded(jsonCol: Column): Column =
    from_json(jsonCol, TripEvent.inputSchema,
      Map("mode" -> "PERMISSIVE", "timestampFormat" ->
        "yyyy-MM-dd'T'HH:mm:ss[.SSS]XXX"))

  /** All fields present that the reference requires (quirk 5 drop side). */
  private def complete(e: Column): Column =
    TripEvent.requiredFields
      .map(f => e.getField(f).isNotNull)
      .reduce(_ && _) && e.isNotNull

  /** Flatten + apply the trip_id/padding defaults (quirk 5 default side). */
  private def flattened: Seq[Column] =
    TripEvent.inputSchema.fieldNames.toSeq.map {
      case "trip_id" => coalesce(col("e.trip_id"), lit(0L)).as("trip_id")
      case "padding" => coalesce(col("e.padding"), lit("")).as("padding")
      case f         => col(s"e.$f").as(f)
    }

  /** Parse a column of raw JSON bytes/text into TripEvent rows, applying
    * quirks 1/4/5. Input: any DataFrame with `jsonCol`; output: one column
    * per TripEvent field, malformed/incomplete rows dropped.
    */
  def parse(df: DataFrame, jsonCol: Column): DataFrame =
    df.select(decoded(jsonCol).as("e"))
      .filter(complete(col("e"))) // quirk 4: drop, never fail
      .select(flattened: _*)

  /** Strict variant: malformed or incomplete records FAIL the job instead
    * of being dropped (for pipelines that must not lose data silently —
    * the reference never fails, quirk 4, so [[parse]] is the parity path).
    */
  def parseStrict(df: DataFrame, jsonCol: Column): DataFrame =
    df.select(jsonCol.as("_raw"), decoded(jsonCol).as("e"))
      .select(
        when(complete(col("e")), col("e"))
          .otherwise(raise_error(concat(lit("malformed TripEvent: "), col("_raw"))))
          .as("e"))
      .select(flattened: _*)

  /** The serialized-output column set (quirks 1–3) — reusable for both the
    * JSON row sink (via to_json) and the Parquet sink's 18-field projection.
    */
  def outputColumns: Seq[Column] = TripEvent.outputFields.map {
    case f @ ("pickup_datetime" | "dropoff_datetime") =>
      unix_millis(col(f).cast("timestamp")).as(f) // quirk 1: epoch millis number
    case "trip_id" => col("trip_id").cast("string").as("trip_id") // quirk 3
    case f => col(f)
  }

  /** Serialize TripEvent rows to one JSON line per event (quirks 1–3). */
  def serialize(df: DataFrame): DataFrame =
    df.select(to_json(struct(outputColumns: _*)).as("value"))
}
