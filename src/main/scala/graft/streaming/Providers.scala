package graft.streaming

import java.util.concurrent.ConcurrentHashMap

import graft.etl.{BucketPaths, TripEventCodec}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Connector seams. The environment ships no Kinesis/Kafka/ES jars (verified
  * against /opt/spark/jars), so external connectors are pure interfaces with
  * local/in-memory implementations; a real connector (e.g. a DataSource V2
  * MicroBatchStream polling Kinesis) plugs in behind [[SourceProvider]]
  * without touching the pipeline.
  */
trait SourceProvider {
  /** A streaming DataFrame with a single string column `value` holding raw
    * JSON lines (the wire format — reference TripEventSchema.java:49-83). */
  def read(spark: SparkSession): DataFrame
}

/** File-drop stand-in for the Kinesis/Kafka source: each file is a batch of
  * JSON lines. `maxFilesPerTrigger` is the backpressure knob (the analogue of
  * the reference's per-shard GetRecords pacing, StreamingEtl.java:167). */
final class JsonFileSource(dir: String, maxFilesPerTrigger: Int = 10)
    extends SourceProvider {
  def read(spark: SparkSession): DataFrame =
    spark.readStream
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .text(dir)
}

/** Kinesis-shaped source: the graft sharded-queue DataSource V2 stream
  * (graft.sources.ShardedQueueSource) — shards, per-shard sequence-number
  * offsets, TRIM_HORIZON/LATEST starting positions. The `value` column
  * carries the JSON wire format, matching the reference's Kinesis consumer
  * wiring (StreamingEtl.java:155-175). */
final class QueueSource(queue: String, startingPosition: String = "TRIM_HORIZON")
    extends SourceProvider {
  def read(spark: SparkSession): DataFrame =
    spark.readStream
      .format("graft.sources.ShardedQueueSource")
      .option("queue", queue)
      .option("starting_position", startingPosition)
      .load()
      .select(col("value"))
}

/** Sinks receive each micro-batch DataFrame of parsed TripEvents (20 cols).
  * Implementations must be idempotent per (batchId) — batches can replay
  * after failure; idempotence is what upgrades at-least-once to effective
  * exactly-once (the reference's own strategy for ES: deterministic doc ids,
  * StreamingEtl.java:250-259).
  */
trait SinkProvider {
  def name: String
  def write(events: DataFrame, batchId: Long): Unit
}

/** Partitioned file sink (parquet or JSON-lines), reproducing A7/A9/A10:
  * derived zero-padded partition columns + 18-field output projection.
  * Exactly-once: each batch writes to a `batch=<id>` subdirectory with
  * overwrite — a replayed batch overwrites its own output instead of
  * appending duplicates.
  */
final class FileSink(outDir: String, parquet: Boolean) extends SinkProvider {
  val name: String = if (parquet) "s3-parquet" else "s3-json"

  def write(events: DataFrame, batchId: Long): Unit = {
    val bucketed = BucketPaths.withBucketColumns(events)
    if (parquet)
      bucketed
        .select((TripEventCodec.outputColumns ++
          BucketPaths.partitionColumns.map(col)): _*)
        .write.mode("overwrite")
        .partitionBy(BucketPaths.partitionColumns: _*)
        .parquet(s"$outDir/batch=$batchId")
    else
      bucketed
        .select(to_json(struct(TripEventCodec.outputColumns: _*)).as("value"),
          col("pickup_location"), col("year"), col("month"))
        .write.mode("overwrite")
        .partitionBy(BucketPaths.partitionColumns: _*)
        .text(s"$outDir/batch=$batchId")
  }
}

/** In-memory Elasticsearch stub with the reference's dynamic routing:
  * index = `type`, id = `trip_id`, document = the 18-field JSON
  * (StreamingEtl.java:250-259). Upsert by (index, id) → idempotent →
  * replayed batches are harmless (the exactly-once claim, README.md:18-19).
  *
  * The `collect()` below exists ONLY because the stub's store is an
  * in-driver map: a real implementation keeps the same (index, id, doc)
  * contract but ships rows executor-side via
  * `events.foreachPartition(rows => bulkClient.upsert(rows))` — one bulk
  * client per partition, no driver round-trip (that is the shape this
  * seam's contract expects at scale).
  */
final class ElasticsearchStubSink extends SinkProvider {
  val name = "elasticsearch"
  /** (index, docId) -> document JSON; a stand-in for the bulk REST client. */
  val store = new ConcurrentHashMap[(String, String), String]()

  def write(events: DataFrame, batchId: Long): Unit =
    events
      .select(col("type").as("index"), col("trip_id").cast("string").as("id"),
        to_json(struct(TripEventCodec.outputColumns: _*)).as("doc"))
      .collect()
      .foreach(r => store.put((r.getString(0), r.getString(1)), r.getString(2)))

  def count: Int = store.size()
}

/** Kinesis stub: the reference publishes every record with the FIXED
  * partition key "0" (StreamingEtl.java:191-205) — global ordering through a
  * single shard. The stub preserves that contract; as with the ES stub, the
  * collect() is the in-JVM store's artifact — a real producer writes
  * per-partition (foreachPartition + KPL-style client). */
final class KinesisStubSink extends SinkProvider {
  val name = "kinesis"
  val records = new java.util.concurrent.ConcurrentLinkedQueue[(String, String)]()

  def write(events: DataFrame, batchId: Long): Unit =
    TripEventCodec.serialize(events).collect()
      .foreach(r => records.add(("0", r.getString(0)))) // fixed partition key
}

/** Kafka stub (at-least-once, matching the reference's actual default
  * producer semantic — StreamingEtl.java:207-212). */
final class KafkaStubSink(topic: String) extends SinkProvider {
  val name = "kafka"
  val records = new java.util.concurrent.ConcurrentLinkedQueue[(String, String)]()

  def write(events: DataFrame, batchId: Long): Unit =
    TripEventCodec.serialize(events).collect()
      .foreach(r => records.add((topic, r.getString(0))))
}

/** Discarding sink (A15) — forces full computation, writes nothing. */
final class NoopSink extends SinkProvider {
  val name = "noop"
  @volatile var rowsSeen = 0L
  def write(events: DataFrame, batchId: Long): Unit =
    rowsSeen += events.count()
}
