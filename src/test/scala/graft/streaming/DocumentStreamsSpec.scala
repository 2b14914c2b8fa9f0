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
}
