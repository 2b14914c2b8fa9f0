package graft

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.SparkSession

/** Per-JVM memo for session-bound build artifacts — materialized
  * DataFrames (`localCheckpoint`ed collapses, cluster tables, trained
  * models), at-rest table names, backup chains.
  *
  * Two cache-contract rules, shared by every consumer
  * ([[graft.operators.Dedup]], [[graft.operators.Graph]],
  * [[graft.operators.TextAnalysis]], [[graft.sources.Sinks]]):
  *
  *  1. '''The owning SparkSession rides in the key.''' A cached plan is
  *     bound to the session that built it — after a session restart in
  *     the same JVM a bare dataset-key hit would hand out a handle to a
  *     dead context, so a fresh session recomputes. Identity is the
  *     session OBJECT (`eq`), not its hash, so a hash collision between
  *     a dead and a live session can't resurrect a stale entry.
  *  2. '''Dead-session entries are evicted on every access.''' A
  *     long-lived driver that cycles SparkSessions must not strand each
  *     old session's object graph (analyzed plans, localCheckpoint
  *     metadata) for the JVM lifetime; entries whose owning context has
  *     stopped are dropped before each lookup.
  *
  * The caller's key `K` must uniquely identify the input dataset (e.g.
  * its directory) — different inputs under the same key would silently
  * reuse the first build.
  */
final class SessionMemo[K, V] {

  // plain class, not case class: no pattern matching happens and a nested
  // case class draws the unchecked-outer-reference warning
  private final class Entry(val session: SparkSession, val value: V)

  private val m = new ConcurrentHashMap[(Int, K), Entry]()

  /** Drop entries whose owning session satisfies `isDead` (default: its
    * SparkContext is stopped). Runs on every [[getOrCompute]]; exposed
    * package-wide for tests and explicit shutdown hooks. */
  private[graft] def prune(
      isDead: SparkSession => Boolean = _.sparkContext.isStopped): Unit = {
    val it = m.values.iterator()
    while (it.hasNext) if (isDead(it.next().session)) it.remove()
  }

  private[graft] def size: Int = m.size

  /** The memoized value for (`session`, `key`), building it with
    * `compute` at most once per live session. `compute` runs under the
    * map node's lock (same serialization the previous per-object
    * `computeIfAbsent` caches had), so concurrent first callers don't
    * race duplicate builds. */
  def getOrCompute(session: SparkSession, key: K)(compute: => V): V = {
    prune()
    m.compute(
      (System.identityHashCode(session), key),
      (_, old) =>
        if (old != null && (old.session eq session)) old
        else new Entry(session, compute)
    ).value
  }
}
