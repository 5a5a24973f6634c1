package graft.streaming

import graft.operators.CdcMerge
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming CDC ingest for a [[CdcMerge]] merge-on-read table — the
  * `foreachBatch` stage that turns a live change feed (Debezium topic,
  * binlog tail) into delta partitions, the VectorStream pattern applied
  * to table maintenance. Ingest stays O(micro-batch): no base rewrite,
  * no resolution work on the hot path; readers call
  * [[CdcMerge.readView]] and periodic [[CdcMerge.compact]] folds the
  * accumulated deltas (the Hudi MOR split of write-optimized ingest vs
  * read-optimized storage).
  *
  * '''Exactly-once:''' each micro-batch lands as `delta/batch=<batchId>`
  * via [[CdcMerge.appendDelta]], whose whole-directory overwrite is the
  * idempotence unit — a replayed batch re-derives the same rows (batch
  * content is checkpoint-determined) and overwrites exactly its own
  * partition, so kill-restart converges to the same table
  * (CdcStreamSpec pins it). Per-batch row/delete counts surface through
  * `observe("cdc_ingest")` for lag/volume dashboards.
  *
  * Caller contract: rows carry the [[CdcMerge.apply]] shape (full row
  * image + seq + op) with `seq` monotone across the feed — true of CDC
  * log offsets by construction.
  */
object CdcStream {

  def start(changes: DataFrame, dir: String, checkpointDir: String,
      opCol: String = "op",
      trigger: Trigger = Trigger.ProcessingTime("10 seconds"))
      : StreamingQuery = {
    val observed = changes.observe("cdc_ingest",
      count(lit(1)).as("rows"),
      count(when(col(opCol) === "D", 1)).as("deletes"))
    observed.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        CdcMerge.appendDelta(batch, dir, batchId)
      }
      .start()
  }
}
