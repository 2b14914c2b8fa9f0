package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming voice-activity segmentation — the §2.9 twin of
  * [[graft.operators.Multimodal.audioSegments]]. A live audio-ingest
  * pipeline emits one frame-energy row per decoded frame; runs of
  * constant silence-state CLOSE as soon as the state flips or the frame
  * sequence gaps (the batch operator's gaps-and-islands semantics), and
  * each asset's trailing open run closes on event-time timeout once the
  * watermark passes its flush deadline.
  *
  * State per asset is ONE open run (seven longs) — bounded by the
  * live-asset set, never by stream length or corpus size. Closed-run
  * rows are column- and value-identical to the batch operator's
  * (including `seg_no` numbering: runs close in frame order, so the
  * running counter equals the batch rank-by-start_frame); only each
  * asset's not-yet-flushed trailing run can be missing — pinned in
  * `AudioStreamsSpec`. Frames are assumed in order ACROSS micro-batches
  * (within a batch they are sorted); an ingest that can reorder across
  * batches should raise the watermark horizon and pre-sort, as with the
  * sessionize operator. */
object AudioStreams {

  case class FrameRow(asset_id: Long, ts: Timestamp, frame: Long, sq: Long)

  case class RunState(isSilent: Boolean, start: Long, end: Long,
                      n: Long, sqSum: Long, segNo: Long, lastMs: Long)

  case class AudioSegment(asset_id: Long, seg_no: Long, is_silent: Boolean,
                          start_frame: Long, end_frame: Long,
                          n_frames: Long, sq_sum: Long)

  /** Collapse a frame-energy STREAM into closed constant-activity runs.
    * `silencePpm`/`frameLen` define silence exactly as the batch
    * operator (integer cross-multiply, never a division); `flushSec` is
    * how long after an asset's last frame its trailing run closes. */
  def segments(frames: Dataset[FrameRow], frameLen: Int = 256,
               silencePpm: Long = 1000L, flushSec: Long = 600L,
               horizon: String = "10 minutes"): Dataset[AudioSegment] = {
    implicit val segEnc = Encoders.product[AudioSegment]
    implicit val stEnc = Encoders.product[RunState]
    implicit val longEnc = Encoders.scalaLong
    val threshNum = silencePpm * frameLen * 1073741824L

    def closeRun(aid: Long, s: RunState): AudioSegment =
      AudioSegment(aid, s.segNo, s.isSilent, s.start, s.end, s.n, s.sqSum)

    frames
      .withWatermark("ts", horizon)
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[RunState, AudioSegment](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (aid, rows, state) =>
          if (state.hasTimedOut) {
            val out = state.getOption.map(closeRun(aid, _))
            state.remove()
            out.iterator
          } else {
            val sorted = rows.toSeq.sortBy(_.frame)
            var cur = state.getOption
            val closed = Seq.newBuilder[AudioSegment]
            for (f <- sorted) {
              val sil = f.sq * 1000000L < threshNum
              cur match {
                case Some(s) if s.isSilent == sil && f.frame == s.end + 1 =>
                  cur = Some(s.copy(end = f.frame, n = s.n + 1,
                    sqSum = s.sqSum + f.sq,
                    lastMs = math.max(s.lastMs, f.ts.getTime)))
                case Some(s) =>
                  closed += closeRun(aid, s)
                  cur = Some(RunState(sil, f.frame, f.frame, 1L, f.sq,
                    s.segNo + 1, math.max(s.lastMs, f.ts.getTime)))
                case None =>
                  cur = Some(RunState(sil, f.frame, f.frame, 1L, f.sq, 1L,
                    f.ts.getTime))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // clamp to watermark+1: setTimeoutTimestamp throws (and
              // fails the whole query) if the deadline is not past the
              // current watermark. Spark 4 filters below-watermark rows
              // BEFORE this function (AudioStreamsSpec pins that), which
              // makes an un-clamped deadline <= watermark unreachable
              // with these params — the clamp is defense-in-depth for
              // a relaxed late-filter or a caller with flushSec below
              // the in-batch skew
              val deadline = s.lastMs + flushSec * 1000
              state.setTimeoutTimestamp(
                math.max(deadline, state.getCurrentWatermarkMs() + 1))
            }
            closed.result().iterator
          }
      }
  }
}
