package graft

import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Optimization-round tooling: per-OPERATOR metric breakdown for named
  * registry queries (guide §1 "measure first" / §7.1's SQL tab, for
  * sessions that disable the UI). A [[QueryExecutionListener]] captures
  * the noop-write's QueryExecution; after the timed reps the EXECUTED
  * plan — AQE final stages included — is rendered with every operator's
  * accumulated SQL metrics via
  * [[org.apache.spark.sql.graft.PlanMetricsDump]].
  *
  * Usage:
  *   SPARK_GRAFT_PROFILE_QUERIES=dedup_containment,graph_pagerank \
  *   SPARK_GRAFT_PROFILE_REPS=2 sbt "runMain graft.Profile"
  *
  * Each query runs once unprofiled (warmup: codegen + memoized index
  * builds land there, same as the bench's steady state), then the timed
  * reps; the metrics dump is from the LAST rep.
  */
object Profile {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_PROFILE_REPS", "2").toInt
    val names = sys.env.getOrElse("SPARK_GRAFT_PROFILE_QUERIES", "")
      .split(",").map(_.trim).filter(_.nonEmpty)
    val spark = Sessions.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    @volatile var lastQe: QueryExecution = null
    spark.listenerManager.register(new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
                             durationNs: Long): Unit = lastQe = qe
      override def onFailure(funcName: String, qe: QueryExecution,
                             exception: Exception): Unit = ()
    })
    // SPARK_GRAFT_PROFILE_JOBS=1: per-JOB wall times with the job's first
    // stage callsite — the timeline view for RDD-backed phases (prefix
    // scans, eager pins, broadcast collects) that the SQL-metrics dump of
    // the final plan cannot attribute
    if (sys.env.contains("SPARK_GRAFT_PROFILE_JOBS")) {
      val t0 = System.nanoTime()
      val starts = new java.util.concurrent.ConcurrentHashMap[
        Int, (Long, String)]()
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onJobStart(
              j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
            val site = j.stageInfos.lastOption.map(_.details.linesIterator
              .find(l => l.contains("graft") && !l.contains("Profile"))
              .getOrElse(j.stageInfos.last.name)).getOrElse("?")
            starts.put(j.jobId, (System.nanoTime(), site))
          }
          override def onJobEnd(
              j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
            Option(starts.remove(j.jobId)).foreach { case (s, site) =>
              System.err.println(f"[job ${j.jobId}%4d " +
                f"@${(s - t0) / 1e9}%7.2fs ${(System.nanoTime() - s) / 1e9}%6.3fs] $site")
            }
          }
        })
    }

    // warmup: JIT + codegen cache
    Tables(spark, sfDir, "lineitem").groupBy("l_returnflag").count()
      .write.format("noop").mode("overwrite").save()

    names.foreach { qn =>
      SparkEntry.queries.get(qn) match {
        case None => System.err.println(s"[profile] unknown query: $qn")
        case Some(fn) =>
          // warmup rep (memoized builds, codegen)
          val w0 = System.nanoTime()
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          val warmSec = (System.nanoTime() - w0) / 1e9
          val times = (1 to reps).map { r =>
            // null out before the LAST rep and spin until the listener
            // delivers it: a fixed sleep raced a slow listener bus and
            // could render a PREVIOUS query's execution (r18 advice)
            if (r == reps) lastQe = null
            val t0 = System.nanoTime()
            fn(spark, sfDir).write.format("noop").mode("overwrite").save()
            (System.nanoTime() - t0) / 1e9
          }
          val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
          while (lastQe == null && System.nanoTime() < deadline)
            Thread.sleep(20)
          println(f"%n=== $qn: warm=$warmSec%.2fs reps=${times.map(t => f"$t%.2f").mkString(",")} ===")
          if (lastQe != null)
            println(org.apache.spark.sql.graft.PlanMetricsDump
              .render(lastQe.executedPlan))
      }
    }
    spark.stop()
  }
}
