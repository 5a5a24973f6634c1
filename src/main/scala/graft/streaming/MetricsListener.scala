package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener.{QueryIdleEvent, QueryProgressEvent, QueryStartedEvent, QueryTerminatedEvent}

/** Operational metrics for streaming queries — the engine-side analogue of
  * the reference's CloudWatch dashboards (records in/out per minute and
  * consumer lag, streaming-etl.ts:249-321): per-batch input row counts,
  * processing rates, and batch durations, collected via the standard
  * StreamingQueryListener hook and queryable in-process.
  *
  * Usage: `val m = new MetricsListener; spark.streams.addListener(m)`; after
  * (or during) a run read `m.snapshot`. The `lagBatches` signal — batches
  * whose input arrived faster than it was processed — is the micro-batch
  * analogue of `millisBehindLatest` ≈ 0 as the health SLO.
  */
object MetricsListener {
  final case class BatchMetrics(queryName: String, batchId: Long,
                                inputRows: Long, inputRowsPerSec: Double,
                                processedRowsPerSec: Double, durationMs: Long)
}

final class MetricsListener extends StreamingQueryListener {
  import MetricsListener.BatchMetrics

  private val maxRetained = 10000 // bounded: long-running streams must not leak
  private val batchesBuf = mutable.ArrayBuffer.empty[BatchMetrics]

  override def onQueryStarted(event: QueryStartedEvent): Unit = ()
  override def onQueryTerminated(event: QueryTerminatedEvent): Unit = ()
  override def onQueryIdle(event: QueryIdleEvent): Unit = ()

  override def onQueryProgress(event: QueryProgressEvent): Unit = synchronized {
    val p = event.progress
    // triggerExecution is the batch's total wall-clock; the other entries
    // are its sub-phases (summing the map would double-count)
    val dur = Option(p.durationMs.get("triggerExecution"))
      .map(_.longValue()).getOrElse(0L)
    batchesBuf += BatchMetrics(
      Option(p.name).getOrElse(p.id.toString), p.batchId,
      p.numInputRows, p.inputRowsPerSecond, p.processedRowsPerSecond, dur)
    if (batchesBuf.length > maxRetained)
      batchesBuf.remove(0, batchesBuf.length - maxRetained)
  }

  def snapshot: Seq[BatchMetrics] = synchronized(batchesBuf.toVector)

  def totalInputRows: Long = snapshot.map(_.inputRows).sum

  /** Batches where input outpaced processing — sustained non-empty means the
    * stream is falling behind (the reference's millisBehindLatest > 0). */
  def lagBatches: Seq[BatchMetrics] = snapshot.filter(b =>
    !b.inputRowsPerSec.isNaN && !b.processedRowsPerSec.isNaN &&
      b.inputRowsPerSec > b.processedRowsPerSec)
}
