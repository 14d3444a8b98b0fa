package graft.core

import java.util.concurrent.atomic.AtomicBoolean

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Scoped lifecycle for query-internal cached state.
  *
  * Several queries persist small intermediates that feed multiple
  * branches of their own plan (LSH signatures, per-doc shingle arrays,
  * connected-components label checkpoints). Left alone, those cached
  * blocks outlive the query: a library caller running many queries
  * through `Graft.queries` accumulates orphaned storage memory.
  *
  * `scoped` wraps a query builder so that every intermediate registered
  * inside it (via `cache` / `release`) is freed automatically after the
  * FIRST completed action that consumes the query's result — a one-shot
  * [[QueryExecutionListener]] matched on plan containment
  * (`qe.analyzed` contains a subtree `sameResult` to the query's plan).
  * Re-running the same DataFrame afterwards is still correct — Spark
  * recomputes from lineage — it just no longer reuses the cache.
  *
  * A result that is built but never materialized keeps its cache until
  * the session's cache is cleared; `Bench`/`Verify` additionally call
  * `spark.catalog.clearCache()` between queries as a belt-and-braces.
  */
object CacheScope {

  private val pending = new ThreadLocal[ArrayBuffer[() => Unit]]

  /** Persist `df` (MEMORY_AND_DISK) and register its release with the
    * enclosing scope. Outside any scope this is persist-only — the
    * caller owns the lifetime, exactly as a bare `.persist()`. */
  def cache(df: DataFrame): DataFrame = {
    df.persist()
    release(() => { df.unpersist(false); () })
    df
  }

  /** `cache` + materialize NOW (one cheap count over the persisted
    * plan) so every cache block exists before the caller's plan fans
    * out. A lazily-persisted intermediate that feeds k parallel plan
    * branches is a scheduling RACE: AQE submits the independent leaf
    * stages together, each computes the expensive scan redundantly
    * (first-writer wins the block), and the query runs ~k/P slower —
    * observed as whole-suite bimodality (x24 at 1.3s or 4.1s on
    * identical code; the event log shows five concurrent 32-task
    * stages each paying the signature scan). Eager materialization
    * costs one extra job submission on a small cached table and makes
    * the fan-out deterministic. Use for any intermediate consumed by
    * more than one branch of the SAME query plan. */
  def cacheEager(df: DataFrame): DataFrame = {
    val cached = cache(df)
    cached.count()
    cached
  }

  /** Register an arbitrary release action (e.g. an RDD unpersist) with
    * the enclosing scope; no-op when no scope is active. */
  def release(f: () => Unit): Unit = {
    val buf = pending.get
    if (buf != null) buf += f
  }

  /** Run `build`, collecting every `cache`/`release` registration made
    * on this thread, and arm the cleanup on the returned result. If the
    * build itself throws, everything already registered is released
    * before rethrowing — a half-built query must not leave orphaned
    * cached blocks behind (Bench's failure path, a missing table, ...). */
  def scoped(build: => DataFrame): DataFrame = {
    val outer = pending.get
    val buf = ArrayBuffer[() => Unit]()
    pending.set(buf)
    try {
      val result =
        try build
        catch {
          case e: Throwable =>
            buf.foreach(f => try f() catch { case _: Throwable => () })
            throw e
        }
      if (buf.nonEmpty) armed(result, buf.toList) else result
    } finally {
      if (outer != null) pending.set(outer) else pending.remove()
    }
  }

  /** Armed-but-unfired listeners, oldest first. A result that is built
    * and then never materialized would otherwise pin its listener (and
    * caches) for the session's lifetime and add an O(plan) walk to
    * every later action; past this cap the oldest armed scope is
    * force-released. */
  private val MaxArmed = 64
  private val armedScopes =
    new java.util.concurrent.ConcurrentLinkedQueue[() => Unit]

  private final class ScopeListener(
      spark: org.apache.spark.sql.SparkSession,
      target: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
      releases: List[() => Unit]) extends QueryExecutionListener {
    private val done = new AtomicBoolean(false)
    /** The queue entry pointing at this listener; removed on fire so a
      * fired scope doesn't pin its plan and closures until 64 newer
      * scopes displace it. */
    @volatile var queueEntry: () => Unit = null
    def forceRelease(): Unit =
      if (done.compareAndSet(false, true)) {
        releases.foreach(f => try f() catch { case _: Throwable => () })
        spark.listenerManager.unregister(this)
        val e = queueEntry
        if (e != null) armedScopes.remove(e)
      }
    private def fire(qe: QueryExecution): Unit = {
      // Conservative on any comparison failure: better to free the
      // cache early (recompute stays correct) than to leak it.
      val hit =
        try qe.analyzed.find(_.sameResult(target)).isDefined
        catch { case _: Throwable => true }
      if (hit) forceRelease()
    }
    override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
      fire(qe)
    override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit =
      fire(qe)
  }

  private def armed(result: DataFrame, releases: List[() => Unit]): DataFrame = {
    val listener =
      new ScopeListener(result.sparkSession, result.queryExecution.analyzed, releases)
    val entry: () => Unit = () => listener.forceRelease()
    listener.queueEntry = entry
    result.sparkSession.listenerManager.register(listener)
    armedScopes.add(entry)
    while (armedScopes.size > MaxArmed) {
      val oldest = armedScopes.poll()
      if (oldest != null) oldest()
    }
    result
  }
}
