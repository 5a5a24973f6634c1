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

  // Live listeners per session, so a re-registration for an EQUIVALENT
  // plan can supersede a stale one (see releaseAfterRun). Sessions are
  // few and long-lived (one per test JVM / one per job), so a plain
  // concurrent map does not leak meaningfully.
  private val live = new java.util.concurrent.ConcurrentHashMap[
    SparkSession,
    java.util.concurrent.ConcurrentLinkedQueue[
      (org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
        QueryExecutionListener)]]()

  /** Releases `cached` once the first action that actually read THAT cache
    * completes (success or failure), then unregisters itself. Ownership is
    * checked by `sameResult` against the cache entry's logical plan, so an
    * interleaved action over some OTHER cached DataFrame — or a concurrent
    * invocation with its own projection — cannot drop this one before the
    * owning query has run.
    *
    * Registration SUPERSEDES any still-live listener owning an equivalent
    * plan: Spark's cache registry is PLAN-keyed, so a listener left behind
    * by a query that was constructed but never run (a schema-only
    * consumer) — or whose entry was dropped by clearCache — would fire on
    * the NEW query's first action over the shared entry and unpersist it
    * mid-composition (an adaptive operator's sizing job is such an action:
    * the QueriesSmokeSpec→PlanSpec q37 interaction, round 16). The newest
    * registration takes over the release duty; the superseded listener is
    * unregistered, never fired.
    *
    * Contract: the release fires on Dataset ACTIONS (collect/count/write…).
    * Consuming the query through RDD-level materialization (`df.rdd`,
    * `localCheckpoint`) bypasses QueryExecutionListener, leaving the cache
    * pinned until the session drops it. */
  /** Unregister any live listener owning a plan equivalent to `cached`'s,
    * WITHOUT firing it. Call right after persisting a projection whose
    * composition runs actions (an adaptive sizing job) BEFORE its own
    * [[releaseAfterRun]] registration — otherwise a stale equivalent
    * listener fires on that sizing action and unpersists the fresh entry. */
  def supersede(s: SparkSession, cached: DataFrame): Unit = {
    val owned = cached.queryExecution.analyzed
    val q = live.computeIfAbsent(s,
      _ => new java.util.concurrent.ConcurrentLinkedQueue)
    q.removeIf { case (p, l) =>
      val stale = p.sameResult(owned)
      if (stale) s.listenerManager.unregister(l)
      stale
    }
  }

  /** Drop (and unregister) live entries whose cache-manager entry is gone —
    * a clearCache (or an explicit unpersist that bypassed the listener)
    * orphans the listener AND its strong reference to a full analyzed
    * plan; without this sweep, abandoned compositions retain those plans
    * until an equivalent plan happens to supersede them. Runs on every
    * registration, so the queue stays bounded by the LIVE cache entries. */
  private def pruneOrphans(s: SparkSession): Unit = {
    val q = live.get(s)
    if (q != null) q.removeIf { case (p, l) =>
      val gone = s.sharedState.cacheManager.lookupCachedData(
        s.asInstanceOf[org.apache.spark.sql.classic.SparkSession], p).isEmpty
      if (gone) s.listenerManager.unregister(l)
      gone
    }
  }

  def releaseAfterRun(s: SparkSession, cached: DataFrame): Unit = {
    val owned = cached.queryExecution.analyzed
    pruneOrphans(s)
    supersede(s, cached)
    val q = live.computeIfAbsent(s,
      _ => new java.util.concurrent.ConcurrentLinkedQueue)
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
          val q0 = live.get(s)
          if (q0 != null) q0.removeIf { case (_, l) => l eq this }
        }
      }
      override def onSuccess(funcName: String, qe: QueryExecution,
          durationNs: Long): Unit = release(qe)
      override def onFailure(funcName: String, qe: QueryExecution,
          exception: Exception): Unit = release(qe)
    }
    s.listenerManager.register(listener)
    q.add((owned, listener))
  }
}
