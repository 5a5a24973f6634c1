package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Field-by-field verification of the §1.3 codec quirks against the
  * representative fixture (FIXTURES.md §A). */
class TripEventCodecSpec extends SparkSpec {
  import spark.implicits._

  private val validLine =
    """{"vendor_id": 2, "pickup_datetime": "2018-11-23T11:32:24.000Z",
      | "dropoff_datetime": "2018-11-23T11:55:13.000Z", "passenger_count": 1,
      | "trip_distance": 4.02, "ratecode_id": 1, "store_and_fwd_flag": "N",
      | "pickup_location_id": 68, "dropoff_location_id": 236, "payment_type": 1,
      | "fare_amount": 17.5, "extra": 0.0, "mta_tax": 0.5, "tip_amount": 3.66,
      | "tolls_amount": 0.0, "improvement_surcharge": 0.3, "total_amount": 21.96,
      | "trip_id": 9234567, "type": "trip"}""".stripMargin.replaceAll("\n", "")

  private def parse(lines: String*) =
    TripEventCodec.parse(lines.toDF("value"), col("value"))

  test("valid event parses with ISO-8601 text timestamps (quirk 1 input)") {
    val row = parse(validLine).collect().head
    assert(row.getAs[Int]("vendor_id") == 2)
    assert(row.getAs[java.sql.Timestamp]("pickup_datetime").getTime == 1542972744000L)
    assert(row.getAs[java.sql.Timestamp]("dropoff_datetime").getTime == 1542974113000L)
    assert(row.getAs[Long]("trip_id") == 9234567L)
    assert(row.getAs[String]("padding") == "") // default applied (quirk 5)
  }

  test("malformed JSON is dropped, not failed (quirk 4)") {
    assert(parse("not json at all", "{\"broken\":", validLine).count() == 1)
  }

  test("ANY absent field drops the event — including trip_id; absent padding defaults (quirk 5)") {
    // reference: every getter except padding's is a bare node.get(f) that
    // NPEs on a missing key (TripEventSchema.java:56-76) — asLong(0) only
    // defaults a PRESENT value
    val noVendor = validLine.replace("\"vendor_id\": 2,", "")
    val noTripId = validLine.replace("\"trip_id\": 9234567,", "")
    assert(parse(noVendor, noTripId).count() == 0)
  }

  test("present-but-null/mistyped values coerce like Jackson instead of dropping (quirk 6)") {
    val nullTripId = validLine.replace("\"trip_id\": 9234567", "\"trip_id\": null")
    val strFare = validLine.replace("\"fare_amount\": 17.5", "\"fare_amount\": \"17.5\"")
    val nullCount = validLine.replace("\"passenger_count\": 1", "\"passenger_count\": null")
    val junkDist = validLine.replace("\"trip_distance\": 4.02", "\"trip_distance\": \"abc\"")
    val rows = parse(nullTripId, strFare, nullCount, junkDist)
      .orderBy("trip_distance").collect()
    assert(rows.length == 4)
    assert(rows.exists(_.getAs[Long]("trip_id") == 0L))        // null → asLong(0)
    assert(rows.exists(_.getAs[Double]("fare_amount") == 17.5)) // "17.5" → asDouble
    assert(rows.exists(_.getAs[Int]("passenger_count") == 0))  // null → asInt
    assert(rows.exists(_.getAs[Double]("trip_distance") == 0.0)) // junk → 0.0
  }

  test("JSON booleans in numeric fields coerce to 1/0 like Jackson's BooleanNode (quirk 6)") {
    val boolCount = validLine.replace("\"passenger_count\": 1", "\"passenger_count\": true")
    val boolFare = validLine.replace("\"fare_amount\": 17.5", "\"fare_amount\": false")
    val boolTrip = validLine.replace("\"trip_id\": 9234567", "\"trip_id\": true")
    val rows = parse(boolCount, boolFare, boolTrip).collect()
    assert(rows.length == 3)
    assert(rows.exists(_.getAs[Int]("passenger_count") == 1))  // true → asInt = 1
    assert(rows.exists(_.getAs[Double]("fare_amount") == 0.0)) // false → asDouble = 0.0
    assert(rows.exists(_.getAs[Long]("trip_id") == 1L))        // true → asLong = 1
  }

  test("lenient ISO timestamps: offset-less and long-fraction inputs parse (quirk 7)") {
    val noOffset = validLine.replace("2018-11-23T11:32:24.000Z", "2018-11-23T11:32:24")
    val microFrac = validLine.replace("2018-11-23T11:32:24.000Z", "2018-11-23T11:32:24.123456Z")
    val rows = parse(noOffset, microFrac).collect()
    assert(rows.length == 2)
    // ...but only the ISO family: Joda throws on a space-separated form
    // (Spark's bare cast would accept it — the shape guard restores parity)
    val spaceTs = validLine.replace("2018-11-23T11:32:24.000Z", "2018-11-23 11:32:24")
    assert(parse(spaceTs).count() == 0)
  }

  test("serialization: 18 fields, epoch-millis numbers, trip_id as string (quirks 1-3)") {
    val json = TripEventCodec.serialize(parse(validLine)).as[String].collect().head
    // parse back generically to check JSON-level shape
    val fields = spark.read.json(Seq(json).toDS()).schema.fieldNames.toSet
    assert(fields.size == 18)
    assert(!fields.contains("payment_type") && !fields.contains("padding")) // quirk 2
    assert(json.contains("\"pickup_datetime\":1542972744000"))  // quirk 1: number
    assert(json.contains("\"trip_id\":\"9234567\""))            // quirk 3: string
    assert(json.contains("\"type\":\"trip\""))
    assert(json.contains("\"total_amount\":21.96"))             // numeric unquoted
  }

  test("parseStrict fails on malformed input instead of dropping (non-parity strict mode)") {
    import spark.implicits._
    val good = TripEventCodec.parseStrict(Seq(validLine).toDF("value"), col("value"))
    assert(good.count() == 1)
    val bad = TripEventCodec.parseStrict(Seq(validLine, "not json").toDF("value"), col("value"))
    val e = intercept[Exception](bad.count())
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("malformed TripEvent")), e.getMessage)
  }

  test("round-trip: output of serialize re-parses as epoch (asymmetry is intentional)") {
    // The output format (epoch numbers) is NOT the input format (ISO text) —
    // feeding output back through parse must DROP rows (timestamps
    // unparseable as text) rather than silently succeed.
    val out = TripEventCodec.serialize(parse(validLine))
    assert(TripEventCodec.parse(out, col("value")).count() == 0)
  }
}
