package graft

import graft.etl.EtlConfig
import graft.streaming.{FileSink, KafkaStubSink, NoopSink, QueueSource}

class EtlMainSpec extends SparkSpec {

  test("wire() builds the configured topology (reference main wiring)") {
    val cfg = EtlConfig(Map(
      "InputKinesisStream" -> "q1",
      "OutputBucket" -> "/tmp/x", "ParquetConversion" -> "true",
      "OutputKafkaTopic" -> "t", "OutputDiscard" -> "true")).validated
    val (source, sinks) = EtlMain.wire(cfg)
    assert(source.isInstanceOf[QueueSource])
    assert(sinks.map(_.name) == Seq("s3-parquet", "kafka", "noop"))
    assert(sinks.collect { case f: FileSink => f.name }.head == "s3-parquet")
    assert(sinks.exists(_.isInstanceOf[KafkaStubSink]))
    assert(sinks.exists(_.isInstanceOf[NoopSink]))
  }

  test("invalid configs are rejected before any topology is built") {
    assertThrows[IllegalArgumentException](
      EtlMain.wire(EtlConfig(Map("OutputBucket" -> "/tmp/x")).validated))
    assertThrows[IllegalArgumentException](
      EtlMain.wire(EtlConfig(Map(
        "InputKinesisStream" -> "a", "InputKafkaTopic" -> "b",
        "OutputBucket" -> "/tmp/x")).validated))
  }
}
