package graft.streaming

import graft.etl.TripEventCodec
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** The reference's whole topology on Structured Streaming (SURVEY §3.1):
  * source → parse/validate → fan-out to N sinks, with the read-once fan-out
  * semantics of StreamingEtl.java:106-149 — ONE streaming query, each
  * micro-batch persisted and written to every configured sink (N independent
  * writeStream queries would re-read the source N times).
  *
  * Exactly-once: offsets tracked in the checkpoint; sinks are idempotent per
  * batch (see [[SinkProvider]]), so batch replay after a crash converges to
  * the same output — the same per-checkpoint commit discipline as the
  * reference's 60 s checkpointing (streaming-etl.ts:146-151), per micro-batch.
  */
object EtlStream {

  def start(spark: SparkSession,
            source: SourceProvider,
            sinks: Seq[SinkProvider],
            checkpointDir: String,
            trigger: Trigger = Trigger.ProcessingTime("60 seconds"))
      : StreamingQuery = {
    require(sinks.nonEmpty, "at least one sink required")
    val raw = source.read(spark)
    val parsed = TripEventCodec.parse(raw, col("value"))
    parsed.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        if (sinks.sizeIs > 1) batch.persist()
        try sinks.foreach(_.write(batch.toDF(), batchId))
        finally if (sinks.sizeIs > 1) { batch.unpersist(); () }
      }
      .start()
  }
}
