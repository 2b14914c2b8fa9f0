package graft

/** Optimization-round tooling: dump `.explain("formatted")` for named
  * registry queries to files (the plan evidence the optimization rounds
  * commit under `plans/rNN/`).
  *
  * Usage:
  *   SPARK_GRAFT_PLAN_QUERIES=dedup_containment,graph_pagerank \
  *   SPARK_GRAFT_PLAN_OUT=plans/r18 SPARK_GRAFT_PLAN_SUFFIX=before \
  *   sbt "runMain graft.PlanDump"
  *
  * Writes `<out>/<query>_<suffix>.txt` per query. The plan is the
  * ANALYZED/physical plan BEFORE execution (AQE initial plan) — the same
  * thing `df.explain("formatted")` prints interactively.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val names = sys.env.getOrElse("SPARK_GRAFT_PLAN_QUERIES", "")
      .split(",").map(_.trim).filter(_.nonEmpty)
    val outDir = sys.env.getOrElse("SPARK_GRAFT_PLAN_OUT", "plans/r18")
    val suffix = sys.env.getOrElse("SPARK_GRAFT_PLAN_SUFFIX", "before")
    val spark = Sessions.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { n =>
      SparkEntry.queries.get(n) match {
        case None => System.err.println(s"[plandump] unknown query: $n")
        case Some(fn) =>
          try {
            val df = fn(spark, sfDir)
            val txt = df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
            val p = java.nio.file.Paths.get(outDir, s"${n}_$suffix.txt")
            java.nio.file.Files.write(p,
              txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
            System.err.println(s"[plandump] wrote $p")
          } catch {
            case e: Throwable =>
              System.err.println(s"[plandump] $n FAILED: ${e.getMessage}")
          }
      }
    }
    spark.stop()
  }
}
