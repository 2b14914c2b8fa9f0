package graft

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Production hook for the engine's plan-embedded `observe()` metrics —
  * the counters every recall-trading cap reports (`ngram_prefix_buckets`,
  * `winnow_df_cap`, `semantic_dedup_cells`, …). "The cap is observed,
  * never silent" is only actionable if a CALLER can actually read the
  * counters: Spark's `Observation` API covers observations the caller
  * created, but named observe() nodes inside a library operator's plan
  * surface only through a QueryExecutionListener. This wraps that
  * plumbing into one call.
  *
  * {{{
  * val (pairs, metrics) = Observed.run(winnowPairs(docs, ...))(_.count())
  * val dropped = metrics("winnow_df_cap").getAs[Long]("dropped_postings")
  * }}}
  *
  * Contract: ONE action per call; metrics are merged by name from the
  * events this call's listener sees, so concurrent queries on the same
  * session during the call can contribute their metrics too (listener
  * events carry no caller identity — same limitation as any
  * QueryExecutionListener use; run scheduled jobs through their own
  * sessions if that matters). Listener delivery is asynchronous: when
  * the plan embeds observe() nodes, the call awaits their arrival up to
  * `timeoutMs` (metric names are taken from the ANALYZED plan, so the
  * await is exact, not a sleep). */
object Observed {

  def run[T](df: DataFrame, timeoutMs: Long = 30000L)
            (action: DataFrame => T): (T, Map[String, Row]) = {
    val spark = df.sparkSession
    val expected: Set[String] = df.queryExecution.analyzed.collect {
      case c: org.apache.spark.sql.catalyst.plans.logical.CollectMetrics =>
        c.name
    }.toSet
    val seen = new ConcurrentHashMap[String, Row]()
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
                             durationNs: Long): Unit =
        qe.observedMetrics.foreach { case (n, r) => seen.put(n, r) }
      override def onFailure(funcName: String, qe: QueryExecution,
                             error: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val result = action(df)
      val deadline = System.currentTimeMillis() + timeoutMs
      while (!expected.forall(seen.containsKey) &&
        System.currentTimeMillis() < deadline) Thread.sleep(20)
      require(expected.forall(seen.containsKey),
        s"observed metrics never arrived: " +
          s"${expected.filterNot(seen.containsKey).mkString(", ")} " +
          s"(got ${seen.keySet()})")
      (result, {
        import scala.jdk.CollectionConverters._
        seen.asScala.toMap
      })
    } finally spark.listenerManager.unregister(listener)
  }
}
