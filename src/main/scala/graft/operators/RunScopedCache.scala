package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.execution.columnar.InMemoryRelation
import org.apache.spark.sql.util.QueryExecutionListener

/** Run-scoped lifetime for a persisted intermediate: the cache is released by
  * the first completed action that actually READ it, so a query can persist a
  * shared projection (one corpus scan feeding several branches) without the
  * caller having to remember an unpersist — and a long-lived session issuing
  * the query repeatedly does not accumulate pinned storage.
  */
object RunScopedCache {

  /** Releases `cached` once the first action that actually read THAT cache
    * completes (success or failure), then unregisters itself. Ownership is
    * checked by `sameResult` against the cache entry's logical plan, so an
    * interleaved action over some OTHER cached DataFrame — or a concurrent
    * invocation with its own projection — cannot drop this one before the
    * owning query has run.
    *
    * Contract: the release fires on Dataset ACTIONS (collect/count/write…).
    * Consuming the query through RDD-level materialization (`df.rdd`,
    * `localCheckpoint`) bypasses QueryExecutionListener, leaving the cache
    * pinned until the session drops it. */
  def releaseAfterRun(s: SparkSession, cached: DataFrame): Unit = {
    val owned = cached.queryExecution.analyzed
    val listener = new QueryExecutionListener {
      private val done = new java.util.concurrent.atomic.AtomicBoolean(false)
      private def release(qe: QueryExecution): Unit = {
        val readCache = qe.withCachedData.exists {
          case r: InMemoryRelation => r.cacheBuilder.logicalPlan.sameResult(owned)
          case _ => false
        }
        if (readCache && done.compareAndSet(false, true)) {
          cached.unpersist()
          s.listenerManager.unregister(this)
        }
      }
      override def onSuccess(funcName: String, qe: QueryExecution,
          durationNs: Long): Unit = release(qe)
      override def onFailure(funcName: String, qe: QueryExecution,
          exception: Exception): Unit = release(qe)
    }
    s.listenerManager.register(listener)
  }
}
