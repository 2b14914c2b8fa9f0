package graft

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming-path scale measurement (SCALE.md §Streaming): drives the
  * REAL foreachBatch ingest bodies — not their batch twins — against
  * micro-batches cut from a large corpus and reports per-batch wall
  * times straight from Structured Streaming's own progress events.
  *
  * Method: each arrival batch is written as ONE parquet file under a
  * source directory; the stream reads it with `maxFilesPerTrigger=1` +
  * `Trigger.AvailableNow`, so file i == micro-batch i and progress
  * entry i's `batchDuration` is the honest wall cost of the ingest body
  * on that batch — INCLUDING the state the path carries at batch i (the
  * winnow ingest's kept-corpus re-read grows every batch, the CDC and
  * sketch targets rewrite per batch). That state dependence is exactly
  * what the batch twins certified at sf1 cannot see, and what this
  * harness exists to measure.
  *
  * Paths (the four §2.9 ingest families with a foreachBatch body):
  *  - `ppl_gate`   — [[streaming.DocumentStreams.perplexityGateIngest]]
  *    (frozen reference LM + cutoffs, memoized; expect ~flat batches
  *    after the first pays the model build)
  *  - `winnow_ingest` — [[streaming.DocumentStreams.dedupIngestWinnow]]
  *    (kept corpus grows per batch and is re-read; expect linear-in-
  *    state growth per batch — the documented trade, quantified here)
  *  - `cdc_upsert` — [[streaming.ChangeCaptureStreams.upsertIngest]]
  *    (copy-on-write keyed table; per-batch cost tracks TABLE size =
  *    key cardinality, not stream length)
  *  - `cms_maintain` — [[streaming.SketchStreams.cmsIngest]] (per-group
  *    CMS build over the batch + kilobyte merges into the at-rest table;
  *    expect ~flat)
  *
  * Usage: SPARK_GRAFT_SF_DIR=<corpus dir> runMain graft.StreamBench
  *   [nBatches] [docBatchRows] [eventBatchRows]
  * Prints one `[streambench] path=… batch=… rows=… sec=…` line per
  * micro-batch and one compact JSON summary line per path. */
object StreamBench {

  private def rmrf(p: Path): Unit =
    if (Files.exists(p))
      Files.walk(p).sorted(Comparator.reverseOrder[Path]())
        .forEach(f => Files.delete(f))

  private def freshDir(root: String, name: String): String = {
    val p = Paths.get(root, name)
    rmrf(p)
    Files.createDirectories(p)
    p.toString
  }

  /** Write `df` as exactly one parquet FILE per slice under `dir`,
    * slice i = rows with pmod(hash-free modulo of a provided index
    * column already present) — the caller supplies `sliceCol` in
    * [0, n). One file per slice keeps file i == micro-batch i. */
  private def writeSlices(df: DataFrame, sliceCol: String, n: Int,
                          dir: String): Unit =
    (0 until n).foreach { i =>
      df.where(col(sliceCol) === i).drop(sliceCol)
        .coalesce(1) // one FILE == one micro-batch (measurement harness
        // only — never a library path)
        .write.mode("append").parquet(dir)
    }

  /** Run `start` over a one-file-per-trigger stream of `srcDir`, await
    * completion, and return (batchId, inputRows, seconds) per progress
    * entry with rows > 0. */
  private def timedStream(spark: SparkSession, srcDir: String,
                          schema: org.apache.spark.sql.types.StructType,
                          start: DataFrame => StreamingQuery)
      : Seq[(Long, Long, Double)] = {
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
    val q = start(src)
    q.awaitTermination()
    q.recentProgress.toSeq
      .filter(_.numInputRows > 0)
      .map(p => (p.batchId, p.numInputRows,
        p.durationMs.getOrDefault("triggerExecution", 0L) / 1000.0))
  }

  private def report(path: String, rows: Seq[(Long, Long, Double)]): Unit = {
    rows.foreach { case (b, n, s) =>
      println(f"[streambench] path=$path batch=$b rows=$n sec=$s%.3f")
    }
    val secs = rows.map(_._3)
    val js = rows.map { case (b, _, s) => f""""$b":$s%.3f""" }
      .mkString("{", ",", "}")
    println(f"""{"path":"$path","n_batches":${rows.size},"total_sec":${secs.sum}%.3f,"first_sec":${secs.headOption.getOrElse(0.0)}%.3f,"last_sec":${secs.lastOption.getOrElse(0.0)}%.3f,"batches":$js}""")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/blowup10")
    val nBatches = args.headOption.map(_.toInt).getOrElse(10)
    val docRows = args.lift(1).map(_.toInt).getOrElse(2500)
    val evRows = args.lift(2).map(_.toInt).getOrElse(10000)
    val spark = Sessions.builder(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val root = Files.createTempDirectory("graft-streambench").toString
    println(s"[streambench] corpus=$sfDir work=$root " +
      s"nBatches=$nBatches docRows=$docRows evRows=$evRows")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    // Tables normalizes events.ts across SF dirs (nanos-long vs NTZ)
    val events = Tables(spark, sfDir, "events")
      .withColumn("ts", unix_micros(col("ts").cast("timestamp")))

    // ---- ppl_gate: frozen 50k-corpus reference, nBatches × docRows ----
    locally {
      val refDir = s"$sfDir/documents.parquet" // frozen generation
      val srcDir = freshDir(root, "ppl_src")
      val arrivals = docs.orderBy("doc_id").limit(nBatches * docRows)
        .withColumn("_slice", pmod(col("doc_id"), lit(nBatches)).cast("int"))
      writeSlices(arrivals, "_slice", nBatches, srcDir)
      val rows = timedStream(spark, srcDir, docs.schema, src =>
        streaming.DocumentStreams.perplexityGateIngest(src, refDir,
          freshDir(root, "ppl_out"), freshDir(root, "ppl_kept"),
          freshDir(root, "ppl_ckpt"), "doc_id", "text", "lang"))
      report("ppl_gate", rows)
    }

    // ---- winnow_ingest: seed = half the corpus, arrivals = the rest ----
    locally {
      val srcDir = freshDir(root, "win_src")
      val refDir = freshDir(root, "win_ref")
      val n = docs.count()
      val seed = docs.where(pmod(col("doc_id"), lit(2)) === 0)
      seed.write.mode("overwrite").parquet(refDir)
      val arrivals = docs.where(pmod(col("doc_id"), lit(2)) === 1)
        .orderBy("doc_id").limit(nBatches * docRows)
        .withColumn("_slice",
          pmod(col("doc_id") - 1, lit(2L * nBatches)).cast("int") / 2)
        .withColumn("_slice", col("_slice").cast("int"))
      writeSlices(arrivals, "_slice", nBatches, srcDir)
      println(s"[streambench] winnow seed=${n / 2} arrivals=" +
        s"${nBatches.toLong * docRows}")
      val rows = timedStream(spark, srcDir, docs.schema, src =>
        streaming.DocumentStreams.dedupIngestWinnow(src, refDir,
          freshDir(root, "win_out"), freshDir(root, "win_ckpt"),
          "doc_id", "text"))
      report("winnow_ingest", rows)
    }

    // ---- cdc_upsert: events as a change feed over ~20k keys ----
    locally {
      val srcDir = freshDir(root, "cdc_src")
      val changes = events.orderBy("event_id").limit(nBatches * evRows)
        .select(
          pmod(col("event_id"), lit(20000)).as("k"),
          col("ts"),
          when(pmod(col("event_id"), lit(17)) === 0, "D").otherwise("U")
            .as("op"),
          col("event_type"), col("value"),
          pmod(col("event_id"), lit(nBatches)).cast("int").as("_slice"))
      writeSlices(changes, "_slice", nBatches, srcDir)
      val schema = changes.drop("_slice").schema
      val target = s"$root/cdc_target"
      val rows = timedStream(spark, srcDir, schema, src =>
        streaming.ChangeCaptureStreams.upsertIngest(src, target,
          freshDir(root, "cdc_backup"), freshDir(root, "cdc_ckpt"),
          "k", "ts", "op"))
      report("cdc_upsert", rows)
    }

    // ---- cms_maintain: per-event-type CMS over user ids ----
    locally {
      val srcDir = freshDir(root, "cms_src")
      val feed = events.orderBy("event_id").limit(nBatches * evRows)
        .select(col("event_type"), col("user_id"),
          pmod(col("event_id"), lit(nBatches)).cast("int").as("_slice"))
      writeSlices(feed, "_slice", nBatches, srcDir)
      val schema = feed.drop("_slice").schema
      val target = s"$root/cms_target"
      val rows = timedStream(spark, srcDir, schema, src =>
        streaming.SketchStreams.cmsIngest(src, target,
          freshDir(root, "cms_backup"), freshDir(root, "cms_ckpt"),
          Seq("event_type"), "user_id"))
      report("cms_maintain", rows)
    }

    spark.stop()
  }
}
