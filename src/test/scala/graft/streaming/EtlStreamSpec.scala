package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.streaming.Trigger

/** Streaming parity (SURVEY §7 M3): read-once fan-out, per-record dynamic ES
  * routing, fixed Kinesis partition key, and kill-restart idempotence.
  */
class EtlStreamSpec extends SparkSpec {
  import spark.implicits._

  private def line(i: Int, typ: String = "trip"): String =
    s"""{"vendor_id": 1, "pickup_datetime": "2018-11-0${i % 9 + 1}T10:00:00.000Z",
       | "dropoff_datetime": "2018-11-0${i % 9 + 1}T11:00:00.000Z",
       | "passenger_count": 1, "trip_distance": 1.5, "ratecode_id": 1,
       | "store_and_fwd_flag": "N", "pickup_location_id": ${i % 50 + 1},
       | "dropoff_location_id": 5, "payment_type": 1, "fare_amount": 10.0,
       | "extra": 0.0, "mta_tax": 0.5, "tip_amount": 1.0, "tolls_amount": 0.0,
       | "improvement_surcharge": 0.3, "total_amount": 11.8,
       | "trip_id": ${1000 + i}, "type": "$typ"}""".stripMargin
      .replaceAll("\n", "")

  private def writeBatchFile(dir: String, name: String, lines: Seq[String]): Unit = {
    val p = java.nio.file.Paths.get(dir, name)
    java.nio.file.Files.write(p, lines.mkString("\n").getBytes)
  }

  test("read-once fan-out: one source feeds parquet + ES + kinesis + noop (A16)") {
    val in = tmpDir("stream-in"); val out = tmpDir("stream-out")
    val ckpt = tmpDir("stream-ckpt")
    writeBatchFile(in, "b0.json", (0 until 20).map(i => line(i, if (i % 2 == 0) "trip" else "other")) :+ "garbage")
    val es = new ElasticsearchStubSink
    val kinesis = new KinesisStubSink
    val kafka = new KafkaStubSink("trips")
    val noop = new NoopSink
    val fileSink = new FileSink(out, parquet = true)
    val q = EtlStream.start(spark, new JsonFileSource(in),
      Seq(fileSink, es, kinesis, kafka, noop),
      ckpt, Trigger.AvailableNow())
    q.awaitTermination(120000)
    assert(noop.rowsSeen == 20)
    // Kafka stub: every record produced to the configured topic (A14)
    assert(kafka.records.size() == 20)
    kafka.records.forEach { case (t, _) => assert(t == "trips") }
    assert(es.count == 20)
    // dynamic routing: index comes from the payload `type`
    assert(es.store.keySet().stream().map(_._1).distinct().count() == 2)
    // fixed partition key "0" (StreamingEtl.java:191-205)
    assert(kinesis.records.size() == 20)
    kinesis.records.forEach { case (k, _) => assert(k == "0") }
    // A8 + A7: job_start=<epoch> run prefix over the reference's flat
    // zero-padded partition layout, batch-scoped deterministic file names
    assert(fileSink.prefix.matches(s"$out/job_start=\\d+"))
    assert(spark.read.parquet(fileSink.prefix).count() == 20)
    val aFile = java.nio.file.Files.walk(java.nio.file.Paths.get(fileSink.prefix))
      .filter(p => p.getFileName.toString.startsWith("batch-0-"))
      .findFirst().get().toString
    assert(aFile.matches(
      ".*/pickup_location=\\d{3}/year=\\d{4}/month=\\d{2}/batch-0-\\d{5}\\..*"), aFile)
  }

  test("ES bulk buffer: small max-actions still delivers everything; rejections retry (ref :268-280)") {
    val in = tmpDir("es-in"); val ckpt = tmpDir("es-ckpt")
    // maxActions=3 forces many mid-partition flushes; 2 injected rejections
    // exercise the RetryRejectedExecutionFailureHandler analogue
    val es = new ElasticsearchStubSink(bulkFlushMaxActions = 3)
    es.injectRejections(2)
    writeBatchFile(in, "b0.json", (0 until 17).map(line(_)))
    val q = EtlStream.start(spark, new JsonFileSource(in), Seq(es), ckpt,
      Trigger.AvailableNow())
    q.awaitTermination(120000)
    assert(es.count == 17)
  }

  test("A18: region resolves per-facet with the eu-west-1 default") {
    val cfg = graft.etl.EtlConfig(Map("ElasticsearchRegion" -> "us-east-2"))
    if (!sys.env.contains("AWS_REGION") && !sys.env.contains("AWS_DEFAULT_REGION")) {
      assert(cfg.defaultRegion == "eu-west-1")
      assert(cfg.inputStreamRegion == "eu-west-1")
    }
    assert(cfg.elasticsearchRegion == "us-east-2")
  }

  test("ProcessingTime trigger (the reference's 60s cadence, scaled down)") {
    val in = tmpDir("pt-in"); val ckpt = tmpDir("pt-ckpt")
    val es = new ElasticsearchStubSink
    writeBatchFile(in, "b0.json", (0 until 8).map(line(_)))
    val q = EtlStream.start(spark, new JsonFileSource(in), Seq(es), ckpt,
      org.apache.spark.sql.streaming.Trigger.ProcessingTime("1 second"))
    try {
      q.processAllAvailable()
      assert(es.count == 8)
      writeBatchFile(in, "b1.json", (8 until 14).map(line(_)))
      q.processAllAvailable()
      assert(es.count == 14) // continuous micro-batches pick up new files
    } finally q.stop()
  }

  test("MetricsListener reports per-batch input rows (the dashboard analogue)") {
    val in = tmpDir("m-in"); val out = tmpDir("m-out"); val ckpt = tmpDir("m-ckpt")
    writeBatchFile(in, "b0.json", (0 until 12).map(line(_)))
    val metrics = new MetricsListener
    spark.streams.addListener(metrics)
    try {
      val q = EtlStream.start(spark, new JsonFileSource(in),
        Seq(new FileSink(out, parquet = true)), ckpt, Trigger.AvailableNow())
      q.awaitTermination(120000)
      // listener events are delivered asynchronously — poll briefly
      val deadline = System.currentTimeMillis() + 15000
      while (metrics.totalInputRows < 12 && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      assert(metrics.totalInputRows == 12)
      val b = metrics.snapshot.filter(_.inputRows > 0)
      assert(b.nonEmpty && b.head.durationMs > 0)
    } finally spark.streams.removeListener(metrics)
  }

  test("kill-restart: checkpoint + idempotent sinks → no duplicates (A19)") {
    val in = tmpDir("rs-in"); val out = tmpDir("rs-out"); val ckpt = tmpDir("rs-ckpt")
    val es = new ElasticsearchStubSink
    val jobStart = System.currentTimeMillis() // restart resumes the run prefix
    writeBatchFile(in, "b0.json", (0 until 10).map(line(_)))
    val q1 = EtlStream.start(spark, new JsonFileSource(in),
      Seq(new FileSink(out, parquet = true, jobStart), es), ckpt,
      Trigger.AvailableNow())
    q1.awaitTermination(120000)
    assert(es.count == 10)

    // "crash": stop, deliver more input, restart from the same checkpoint
    writeBatchFile(in, "b1.json", (10 until 25).map(line(_)))
    val q2 = EtlStream.start(spark, new JsonFileSource(in),
      Seq(new FileSink(out, parquet = true, jobStart), es), ckpt,
      Trigger.AvailableNow())
    q2.awaitTermination(120000)

    assert(es.count == 25) // upsert by (index, id): no dups after restart
    val total = spark.read.parquet(s"$out/job_start=$jobStart").count()
    assert(total == 25) // batch-scoped file names are replay-safe
  }
}
