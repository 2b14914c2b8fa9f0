package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

class DocumentStreamsSpec extends SparkSpec {

  test("dedup-on-arrival: within-batch collapse, corpus judgment, corpus growth") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val tmp = Files.createTempDirectory("ingest").toString
    val refDir = s"$tmp/ref"
    val outDir = s"$tmp/out"
    Seq((1L, "alpha beta gamma delta epsilon"))
      .toDF("doc_id", "text").write.parquet(refDir)

    val stream = MemoryStream[(Long, String)]
    val q = DocumentStreams.dedupIngest(
      stream.toDF().toDF("doc_id", "text"), refDir, outDir, s"$tmp/cp",
      "doc_id", "text", k = 2, minJaccard = 0.8,
      trigger = Trigger.ProcessingTime(0))
    try {
      // batch 0: a corpus dup, an internal near-dup pair (min id wins,
      // the survivor is then judged against the corpus), a fresh doc
      stream.addData(
        (20L, "alpha beta gamma delta epsilon"), // dup of kept doc 1
        (21L, "red orange yellow green blue violet"),
        (22L, "red orange yellow green blue violet indigo"), // j=5/6
        (23L, "completely novel content entirely unmatched"))
      q.processAllAvailable()
      // batch 1: a dup of doc 21 — kept only in batch 0, so dropping it
      // proves the corpus GREW between batches
      stream.addData((30L, "red orange yellow green blue violet"))
      q.processAllAvailable()
    } finally q.stop()

    val ref = spark.read.parquet(refDir).as[(Long, String)].collect().toMap
    assert(ref.keySet === Set(1L, 21L, 23L))
    val audit = spark.read.parquet(outDir)
      .select("new_id", "dropped", "reason", "batch_id")
      .as[(Long, Long, String, Long)].collect().toSet
    assert(audit === Set(
      (20L, 1L, "corpus_dup", 0L),
      (21L, 0L, "kept", 0L),
      (22L, 1L, "batch_dup", 0L),
      (23L, 0L, "kept", 0L),
      (30L, 1L, "corpus_dup", 1L)))
  }

  test("winnow dedup-on-arrival: a LAUNDERED verbatim copy (case/punct " +
    "re-flow) drops against the corpus, within-batch collapse works, " +
    "and the corpus grows between batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val tmp = Files.createTempDirectory("wingest").toString
    val refDir = s"$tmp/ref"
    val outDir = s"$tmp/out"
    Seq((1L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text").write.parquet(refDir)

    val stream = MemoryStream[(Long, String)]
    val q = DocumentStreams.dedupIngestWinnow(
      stream.toDF().toDF("doc_id", "text"), refDir, outDir, s"$tmp/cp",
      "doc_id", "text", minShared = 2,
      trigger = Trigger.ProcessingTime(0))
    try {
      stream.addData(
        // laundered copy of kept doc 1: same canonical stream
        (20L, "ALPHA!! beta-GAMMA, delta;epsilon??zeta"),
        // an internal near-dup pair (shared canonical run; min id wins)
        (21L, "red orange yellow green blue violet colors"),
        (22L, "red orange yellow green blue violet colors indeed"),
        (23L, "completely novel content entirely unmatched qq"))
      q.processAllAvailable()
      // batch 1: a laundered dup of doc 21 proves the corpus grew
      stream.addData((30L, "RED(orange)YELLOW green.blue VIOLET colors"))
      q.processAllAvailable()
    } finally q.stop()

    val ref = spark.read.parquet(refDir).as[(Long, String)].collect().toMap
    assert(ref.keySet === Set(1L, 21L, 23L))
    val audit = spark.read.parquet(outDir)
      .select("new_id", "dropped", "reason", "batch_id")
      .as[(Long, Long, String, Long)].collect().toSet
    assert(audit === Set(
      (20L, 1L, "corpus_dup", 0L),
      (21L, 0L, "kept", 0L),
      (22L, 1L, "batch_dup", 0L),
      (23L, 0L, "kept", 0L),
      (30L, 1L, "corpus_dup", 1L)))
  }

  test("perplexity gate on arrival: batch-equal verdicts against the " +
    "frozen reference model, unmodeled languages dropped, verdicts " +
    "stable across batch arrangements") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val tmp = Files.createTempDirectory("pplgate").toString
    val refDir = s"$tmp/ref"
    // reference corpus: the driver documents table (frozen generation)
    graft.Tables(spark, sfDir, "documents")
      .select($"doc_id", $"text", $"lang")
      .write.parquet(refDir)
    val ref = spark.read.parquet(refDir)

    // the expected verdict, computed BATCH-side with the same public
    // operators the gate composes
    val cutoffs = graft.operators.TextAnalysis.perplexityCutoffsFor(
      ref, "doc_id", "text", "lang", topN = 200, key = refDir)
      .as[(String, Long)].collect().toMap
    val fluent = ref.orderBy($"doc_id").select($"text").as[String].head()
    val arrivals = Seq(
      (1001L, fluent, "en"),                  // corpus-like -> kept
      (1002L, "qq ww ee rr tt yy uu ii", "en"), // out-of-model -> floor cost
      (1003L, fluent, "xx"))                  // unmodeled lang -> dropped
    def run(bursts: Seq[Seq[(Long, String, String)]],
            sub: String): Map[Long, (Long, Long)] = {
      val outDir = s"$tmp/out$sub"
      val keptDir = s"$tmp/kept$sub"
      val stream = MemoryStream[(Long, String, String)]
      val q = DocumentStreams.perplexityGateIngest(
        stream.toDF().toDF("doc_id", "text", "lang"), refDir, outDir,
        keptDir, s"$tmp/cp$sub", "doc_id", "text", "lang",
        trigger = Trigger.ProcessingTime(0))
      try {
        for (b <- bursts) { stream.addData(b); q.processAllAvailable() }
      } finally q.stop()
      spark.read.parquet(outDir)
        .select($"doc_id", $"mean_cost_q", $"kept")
        .as[(Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
    }
    val got = run(Seq(arrivals), "1")
    // verdicts agree with the batch-side cutoff comparison
    assert(got(1001L)._2 === 1L, s"corpus-like doc must pass: $got")
    assert(got(1001L)._1 <= cutoffs("en"))
    assert(got(1002L)._2 === 0L, s"out-of-model doc must drop: $got")
    assert(got(1002L)._1 > cutoffs("en"))
    assert(got(1003L)._2 === 0L, "unmodeled language must drop")
    // kept dir holds exactly the passing docs
    assert(spark.read.parquet(s"$tmp/kept1").select("doc_id")
      .as[Long].collect().toSet === Set(1001L))
    // arrangement-independence: one burst vs one doc per burst — the
    // model is frozen, so verdicts cannot depend on batch boundaries
    val split = run(arrivals.map(Seq(_)), "2")
    assert(split === got)
  }

  test("Gopher/C4 filter batteries are STREAMING-SAFE: the same row-local " +
    "expressions run directly on a stream (no foreachBatch) with verdicts " +
    "equal to the batch pass, independent of batch boundaries") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    val tmp = Files.createTempDirectory("gate-stateless").toString
    val docs = Seq(
      (1L, Seq.fill(6)("the cat and the dog have fun with big toys")
        .mkString(" ")),
      (2L, "tiny doc"),
      (3L, (1 to 10).map(i => s"- b $i").mkString("\n")),
      (4L, null.asInstanceOf[String]))
    val batch = TextAnalysis.gopherRules(
        docs.toDF("doc_id", "text"), "doc_id", "text")
      .select("doc_id", "pass").as[(Long, Long)].collect().toMap
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Long, String)]
    // ROW-LOCAL means the battery composes with readStream directly —
    // no state, no foreachBatch, exactly-once by projection purity
    val q = TextAnalysis.gopherRules(
        ms.toDF().toDF("doc_id", "text"), "doc_id", "text")
      .select("doc_id", "pass")
      .writeStream.format("parquet")
      .option("path", s"$tmp/out")
      .option("checkpointLocation", s"$tmp/ckpt")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      ms.addData(docs(0), docs(1)) // two boundaries, same verdicts
      q.processAllAvailable()
      ms.addData(docs(2), docs(3))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.read.parquet(s"$tmp/out")
      .as[(Long, Long)].collect().toMap
    assert(streamed === batch)
  }

  test("mix monitor: streaming state equals a one-shot batch mixGap, " +
    "reports are versioned per batch, replay is a no-op") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    implicit val sqlCtx = spark.sqlContext
    val tmp = Files.createTempDirectory("mixmon").toString
    val b0 = Seq(("en", 100L), ("en", 200L), ("de", 50L))
    val b1 = Seq(("en", 10L), ("fr", 40L), ("fr", 60L))
    val stream = MemoryStream[(String, Long)]
    val q = DocumentStreams.mixGapMonitor(
      stream.toDF().toDF("lang", "n_tokens"), s"$tmp/state", s"$tmp/out",
      s"$tmp/bak", s"$tmp/cp", "lang", "n_tokens",
      trigger = Trigger.ProcessingTime(0))
    try {
      stream.addData(b0: _*); q.processAllAvailable()
      stream.addData(b1: _*); q.processAllAvailable()
    } finally q.stop()
    // the batch-id-1 report == mixGap over EVERYTHING seen so far
    val expected = graft.operators.Sampling.mixGap(
      (b0 ++ b1).toDF("lang", "n_tokens"), "lang", "n_tokens")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5)))).toMap
    val reports = spark.read.parquet(s"$tmp/out")
    val last = reports.where(col("batch_id") === 1L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5)))).toMap
    assert(last === expected)
    // one report row set per batch: batch 0 covered only b0's groups
    assert(reports.where(col("batch_id") === 0L).count() === 2L)
    assert(reports.where(col("batch_id") === 1L).count() === 3L)
    // replaying an applied batch id is a NO-OP (sum merge + watermark)
    DocumentStreams.applyMixBatch(b1.toDF("lang", "n_tokens"), 1L,
      s"$tmp/state", s"$tmp/out", s"$tmp/bak", "lang", "n_tokens")
    val state = spark.read.parquet(s"$tmp/state")
      .select("lang", "n_docs", "sum_tokens")
      .as[(String, Long, Long)].collect().toSet
    assert(state === Set(("en", 3L, 310L), ("de", 1L, 50L),
      ("fr", 2L, 100L)))
    assert(spark.read.parquet(s"$tmp/out").count() === 5L)
  }
}
