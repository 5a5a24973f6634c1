package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BucketPathSpec extends SparkSpec {
  import spark.implicits._

  test("bucket path is zero-padded %03d/%04d/%02d (TripEventBucketAssigner.java:35-40)") {
    val df = Seq((7, "2018-01-23 10:00:00"), (142, "0999-11-05 00:00:00"))
      .toDF("pickup_location_id", "ts")
      .withColumn("pickup_datetime", col("ts").cast("timestamp"))
    val got = BucketPaths.bucketId(df).select("bucket_id")
      .as[String].collect().toSet
    assert(got == Set(
      "pickup_location=007/year=2018/month=01",
      "pickup_location=142/year=0999/month=11"))
  }
}

class EtlConfigSpec extends SparkSpec {

  test("application properties win over CLI args (ParameterToolUtils.java:36-50)") {
    val c = EtlConfig.fromArgsAndProperties(
      Seq("--InputKinesisStream", "from-cli", "--OutputBucket", "b"),
      Map("InputKinesisStream" -> "from-props"))
    assert(c.get("InputKinesisStream").contains("from-props"))
    assert(c.get("OutputBucket").contains("b"))
  }

  test("exactly one source required (StreamingEtl.java:87-103)") {
    val both = EtlConfig(Map("InputKinesisStream" -> "a", "InputKafkaTopic" -> "b",
      "OutputBucket" -> "x"))
    val neither = EtlConfig(Map("OutputBucket" -> "x"))
    assertThrows[IllegalArgumentException](both.validated)
    assertThrows[IllegalArgumentException](neither.validated)
    assert(EtlConfig(Map("InputKinesisStream" -> "a", "OutputBucket" -> "x"))
      .validated.sourceKind == "kinesis")
  }

  test("at least one sink required (StreamingEtl.java:147-149)") {
    assertThrows[IllegalArgumentException](
      EtlConfig(Map("InputKafkaTopic" -> "t")).validated)
    assert(EtlConfig(Map("InputKafkaTopic" -> "t", "OutputDiscard" -> "true"))
      .validated.sinks == Seq("noop"))
  }
}

class EtlPipelineSpec extends SparkSpec {
  import spark.implicits._

  private def mkInput(dir: String): Unit = {
    val lines = (0 until 50).map { i =>
      val loc = i % 7 * 37 + 1 // 1..223 → 1-3 digit location ids
      val month = i % 3 + 1
      s"""{"vendor_id": 1, "pickup_datetime": "2018-0$month-0${i % 9 + 1}T1
         |0:00:00.000Z", "dropoff_datetime": "2018-0$month-0${i % 9 + 1}T11:00:00.000Z",
         | "passenger_count": 1, "trip_distance": 1.5, "ratecode_id": 1,
         | "store_and_fwd_flag": "N", "pickup_location_id": $loc,
         | "dropoff_location_id": 5, "payment_type": 1, "fare_amount": 10.0,
         | "extra": 0.0, "mta_tax": 0.5, "tip_amount": 1.0, "tolls_amount": 0.0,
         | "improvement_surcharge": 0.3, "total_amount": 11.8,
         | "trip_id": ${1000 + i}, "type": "trip"}""".stripMargin
        .replaceAll("\n", "")
    } :+ "garbage line"
    lines.toDF("value").coalesce(1).write.mode("overwrite").text(dir)
  }

  test("batch ETL end-to-end: parse → project → partitioned parquet (M1 slice)") {
    val in = tmpDir("etl-in"); val out = tmpDir("etl-out")
    mkInput(in)
    EtlPipeline.run(spark, in, out, parquet = true)
    // partition dirs are zero-padded strings
    val dirs = new java.io.File(out).listFiles().map(_.getName)
      .filter(_.startsWith("pickup_location=")).toSeq
    assert(dirs.nonEmpty && dirs.forall(_.matches("pickup_location=\\d{3}")))
    val back = spark.read.parquet(out)
    assert(back.count() == 50) // garbage dropped
    // output projection: 18 payload fields + 3 partition columns
    assert(back.columns.length == 21)
    assert(!back.columns.contains("payment_type"))
    assert(back.schema("trip_id").dataType.typeName == "string")
    assert(back.schema("pickup_datetime").dataType.typeName == "long")
    assert(back.schema("year").dataType.typeName == "string") // no re-inference
  }

  test("JSON-lines sink writes one quirked JSON object per event (A10)") {
    val in = tmpDir("etl-in2"); val out = tmpDir("etl-out2")
    mkInput(in)
    EtlPipeline.run(spark, in, out, parquet = false)
    val lines = spark.read.option("recursiveFileLookup", "true").text(out).as[String].collect()
    assert(lines.length == 50)
    assert(lines.forall(l => l.startsWith("{") && l.contains("\"trip_id\":\"")))
  }
}

/** Config-parity assertions against the reference entry point
  * (StreamingEtl.java): initial-position key + default, Kafka consumer
  * property pass-through. */
class EtlMainSpec extends SparkSpec {
  import graft.EtlMain
  import graft.streaming.QueueSource

  private def kinesisCfg(extra: (String, String)*): EtlConfig =
    EtlConfig(Map("InputKinesisStream" -> "s", "OutputDiscard" -> "true") ++ extra)

  test("reference key InputStreamInitalPosition (sic) is honored (StreamingEtl.java:158)") {
    val (src, _) = EtlMain.wire(kinesisCfg("InputStreamInitalPosition" -> "TRIM_HORIZON"))
    assert(src.asInstanceOf[QueueSource].startingPosition == "TRIM_HORIZON")
  }

  test("initial position defaults to LATEST (Flink DEFAULT_STREAM_INITIAL_POSITION)") {
    val (src, _) = EtlMain.wire(kinesisCfg())
    assert(src.asInstanceOf[QueueSource].startingPosition == "LATEST")
  }

  test("bounded runs (RunAvailableNow) default to TRIM_HORIZON — a LATEST backfill would be empty") {
    val (drain, _) = EtlMain.wire(kinesisCfg("RunAvailableNow" -> "true"))
    assert(drain.asInstanceOf[QueueSource].startingPosition == "TRIM_HORIZON")
    val (explicit, _) = EtlMain.wire(kinesisCfg(
      "RunAvailableNow" -> "true", "InputStreamInitalPosition" -> "LATEST"))
    assert(explicit.asInstanceOf[QueueSource].startingPosition == "LATEST")
  }

  test("graft alias InputStartingPosition still works; reference key wins on conflict") {
    val (alias, _) = EtlMain.wire(kinesisCfg("InputStartingPosition" -> "TRIM_HORIZON"))
    assert(alias.asInstanceOf[QueueSource].startingPosition == "TRIM_HORIZON")
    val (both, _) = EtlMain.wire(kinesisCfg(
      "InputStreamInitalPosition" -> "LATEST", "InputStartingPosition" -> "TRIM_HORIZON"))
    assert(both.asInstanceOf[QueueSource].startingPosition == "LATEST")
  }

  test("Kafka consumer parity properties (StreamingEtl.java:182-185)") {
    val c = EtlConfig(Map("InputKafkaTopic" -> "t", "OutputDiscard" -> "true"))
    assert(c.kafkaConsumerProperties == Map(
      "group.id" -> "kaja-streaming-etl-consumer",
      "isolation.level" -> "read_committed"))
    val o = EtlConfig(Map("InputKafkaTopic" -> "t", "OutputDiscard" -> "true",
      "KafkaConsumerGroupId" -> "g2", "KafkaIsolationLevel" -> "read_uncommitted"))
    assert(o.kafkaConsumerProperties("group.id") == "g2")
    assert(o.kafkaConsumerProperties("isolation.level") == "read_uncommitted")
  }
}
