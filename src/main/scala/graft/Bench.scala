package graft

/** Benchmark main: times every registered query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line {"metric":...,"queries":{...}}.
  *
  * Methodology: results are written to the `noop` sink, not `count()`ed — a
  * bare count lets Catalyst prune every column and would benchmark the scan,
  * not the compute (normalize/minhash/cosine would be optimized away). Each
  * query runs SPARK_GRAFT_BENCH_REPS times (default 3) and reports the
  * MEDIAN, so one GC pause or compilation hiccup can't masquerade as a
  * regression and per-query numbers are comparable across rounds. A failed
  * query reports -1.0 so it can never masquerade as a fast run, and the
  * failure is printed to stderr. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val spark = Sessions.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JIT/codegen warmup so the alphabetically-first query doesn't absorb
    // first-run compilation cost (~4s of noise on a sub-second query)
    Tables(spark, sfDir, "lineitem")
      .groupBy("l_returnflag").count()
      .write.format("noop").mode("overwrite").save()
    val results: Seq[(String, Double)] =
      SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        val times = (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          try {
            fn(spark, sfDir).write.format("noop").mode("overwrite").save()
            (System.nanoTime() - t0) / 1e9
          } catch {
            case e: Throwable =>
              System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
              -1.0
          }
        }
        val sec =
          if (times.exists(_ < 0)) -1.0
          else times.sorted.apply(reps / 2) // median
        name -> sec
      }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val ok = results.filter(_._2 >= 0)
    val total = ok.map(_._2).sum
    // Ingestion throughput on the reference's own production zips, the
    // direct comparison point to BASELINE.md's headline 1,457 rows/s
    // (zip->XML ingest, import_xml.log:30277-30281).
    val ingest =
      try {
        val dir = "/root/reference/uploads/xml_history/processed"
        if (new java.io.File(dir).isDirectory) {
          val t0 = System.nanoTime()
          val rows = graft.sources.XmlDeclarations.read(spark, dir).count()
          val sec = (System.nanoTime() - t0) / 1e9
          f""","xml_ingest_rows":$rows,"xml_ingest_sec":$sec%.3f,"xml_ingest_rows_per_sec":${rows / sec}%.0f,"baseline_rows_per_sec":1457"""
        } else ""
      } catch { case _: Throwable => "" }
    println(s"""{"metric":"total","value":${f"$total%.3f"},"unit":"sec","queries":$qs,"n_failed":${results.size - ok.size}$ingest,"sf":"$sfDir"}""")
    spark.stop()
  }
}
