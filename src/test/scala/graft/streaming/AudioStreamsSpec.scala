package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Multimodal

class AudioStreamsSpec extends SparkSpec {

  /** The registry fixture's frame-energy rows, timestamped on the real
    * frame clock (non-overlapping 256-sample frames at 8 kHz = 32 ms). */
  private def fixtureFrames: Seq[AudioStreams.FrameRow] = {
    import spark.implicits._
    val assets = (0L until 8L).map(id =>
      (id, Multimodal.buildToneSequenceWav((0 until 8).map(j =>
        if ((id * 5 + j * 7) % 4 == 0) 0.0
        else 300.0 + ((id * 7 + j * 3) % 12) * 250.0))))
      .toDF("doc_id", "payload")
    Multimodal.audioFrameEnergies(assets, "doc_id", "payload")
      .where($"ok").collect().map(e => AudioStreams.FrameRow(
        e.asset_id, new Timestamp(1700000000000L + e.frame * 32L),
        e.frame, e.sq)).toSeq
  }

  private def batchSegments: Set[(Long, Long, Boolean, Long, Long, Long, Long)] = {
    import spark.implicits._
    val assets = (0L until 8L).map(id =>
      (id, Multimodal.buildToneSequenceWav((0 until 8).map(j =>
        if ((id * 5 + j * 7) % 4 == 0) 0.0
        else 300.0 + ((id * 7 + j * 3) % 12) * 250.0))))
      .toDF("doc_id", "payload")
    Multimodal.audioSegments(
      Multimodal.audioFrameEnergies(assets, "doc_id", "payload"))
      .as[(Long, Long, Boolean, Long, Long, Long, Long)].collect().toSet
  }

  private def runStream(bursts: Seq[Seq[AudioStreams.FrameRow]],
                        name: String): Set[(Long, Long, Boolean, Long, Long, Long, Long)] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[AudioStreams.FrameRow]
    val q = AudioStreams.segments(stream.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      for (b <- bursts) { stream.addData(b.toIndexedSeq); q.processAllAvailable() }
    } finally q.stop()
    spark.table(name)
      .as[(Long, Long, Boolean, Long, Long, Long, Long)].collect().toSet
  }

  test("streaming VAD's closed runs equal the batch segments minus each " +
    "asset's trailing open run") {
    val batch = batchSegments
    val streamed = runStream(Seq(fixtureFrames), "vad_one")
    assert(streamed.nonEmpty)
    assert(streamed.subsetOf(batch),
      s"stream-only rows: ${(streamed -- batch).take(3)}")
    // exactly the per-asset trailing run (max seg_no) stays open
    val missing = batch -- streamed
    val lastSegNo = batch.groupBy(_._1).map { case (a, rs) =>
      a -> rs.map(_._2).max }
    assert(missing === batch.filter(r => r._2 === lastSegNo(r._1)),
      s"missing must be exactly the open tails: $missing")
  }

  test("a run split across micro-batches still closes as ONE batch-equal row") {
    val frames = fixtureFrames.sortBy(f => (f.asset_id, f.frame))
    // split mid-run: first 10 frames of every asset, then the rest —
    // frames 0..9 of asset 0 span silent[0-3] + part of voiced[4-15]
    val (first, rest) = frames.partition(_.frame < 10)
    val streamed = runStream(Seq(first, rest), "vad_split")
    val batch = batchSegments
    assert(streamed.subsetOf(batch))
    // the voiced[4-15] run of asset 0 crossed the batch boundary and
    // must still have closed as one merged row
    assert(streamed.exists(r => r._1 == 0L && r._4 == 4L && r._5 == 15L),
      s"cross-batch run must merge: ${streamed.filter(_._1 == 0L)}")
  }

  test("a frame arriving below the watermark cannot crash the query: " +
    "Spark drops it before the state function (pinned), and the clamped " +
    "timeout deadline keeps the query alive either way") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val t0 = 1700000000000L
    def row(aid: Long, ts: Long, frame: Long, sq: Long) =
      AudioStreams.FrameRow(aid, new Timestamp(ts), frame, sq)
    val stream = MemoryStream[AudioStreams.FrameRow]
    val q = AudioStreams.segments(stream.toDS())
      .writeStream.format("memory").queryName("vad_late")
      .outputMode("append").start()
    try {
      // push the watermark ~20 min past t0 via a far-future asset
      stream.addData(Seq(row(1L, t0 + 30L * 60000L, 0L, 1L << 40)))
      q.processAllAvailable()
      // late arrival for a NEW asset, 20 min below the watermark — its
      // flush deadline (ts + 600 s) is below the watermark too;
      // flatMapGroupsWithState does not drop late rows, so before the
      // clamp setTimeoutTimestamp threw and failed the whole query
      stream.addData(Seq(row(2L, t0, 0L, 1L << 40)))
      q.processAllAvailable()
      // two more advancing batches: watermark passes the clamped
      // deadline, the late asset's run times out and closes
      stream.addData(Seq(row(1L, t0 + 40L * 60000L, 100L, 1L << 40)))
      q.processAllAvailable()
      stream.addData(Seq(row(1L, t0 + 60L * 60000L, 200L, 1L << 40)))
      q.processAllAvailable()
      val got = spark.table("vad_late")
        .as[(Long, Long, Boolean, Long, Long, Long, Long)].collect()
      // PINNED SEMANTICS (Spark 4 flatMapGroupsWithState): the
      // below-watermark row is filtered BEFORE the state function, so the
      // late asset creates no state and no output — and the query never
      // crashes. (With late rows filtered on the same pre-batch watermark
      // the timeout check uses, an un-clamped deadline <= watermark is
      // unreachable; the clamp in AudioStreams stays as defense-in-depth
      // for any future Spark that relaxes the filter.) Asset 1's runs
      // must close normally around the late arrival.
      assert(q.exception.isEmpty, s"query died: ${q.exception}")
      assert(!got.exists(_._1 == 2L),
        s"late row must be dropped, not stated: ${got.mkString(",")}")
      assert(got.count(_._1 == 1L) >= 2,
        s"on-time asset must keep closing runs: ${got.mkString(",")}")
    } finally q.stop()
  }
}
