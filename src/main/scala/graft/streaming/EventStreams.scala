package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming operators over the `events` stream (the extension
  * surface beyond the reference's batch-only pipelines — SURVEY §2.9): a
  * watermarked tumbling-window aggregate and a custom-state sessionizer.
  *
  * Both are written against unbounded streams: watermarks bound state, the
  * session store is keyed by user (state per key, dropped on timeout), and
  * nothing buffers the stream globally — the shapes that survive a
  * 1000-executor deployment reading a firehose.
  */
object EventStreams {

  /** Hourly tumbling counts per event type with a 1-hour watermark — the
    * streaming twin of the batch `events_hourly_window` query (same output
    * schema, so batch results oracle the streaming results). */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(floor(col("value") * 1000000)).as("value_micros"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
        col("event_type"), col("n_events"), col("value_micros"))

  /** Stream-static enrichment: join the unbounded event stream against a
    * STATIC dimension, then aggregate per tumbling window and dimension
    * attribute. The canonical "firehose + slowly-refreshed reference
    * table" deployment shape: Spark re-plans the static side each
    * micro-batch (so a dimension refreshed at rest is picked up batch to
    * batch), the dimension holds NO stream state, and the explicit
    * broadcast keeps the stream side from ever shuffling for the join.
    * State is bounded by the windowed aggregate's watermark horizon.
    *
    * Works identically on a batch `events` frame (same plan, no
    * watermark semantics) — the batch twin is the oracled registry query
    * `events_enriched_window`. */
  def enrichedWindowCounts(events: DataFrame, dim: DataFrame,
                           keyCol: String, attrCol: String): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .join(broadcast(dim.select(col(keyCol), col(attrCol))), Seq(keyCol))
      .groupBy(window(col("ts"), "1 hour"), col(attrCol))
      .agg(count(lit(1)).as("n_events"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss")
        .as("hour_start"), col(attrCol), col("n_events"))

  /** Exactly-once event dedup on an unbounded stream: drop re-deliveries
    * of the same event id arriving within the watermark horizon. State is
    * bounded — `dropDuplicatesWithinWatermark` evicts ids once the
    * watermark passes them — so an at-least-once upstream (like the
    * reference's crash-window re-imports, `import_xml_history.py:205-211`)
    * becomes exactly-once into the sink without unbounded id memory. */
  def dedupEvents(events: DataFrame, idCol: String = "event_id",
                  horizon: String = "1 hour"): DataFrame =
    events.withWatermark("ts", horizon).dropDuplicatesWithinWatermark(idCol)

  /** NATIVE session windows on the stream: Spark's `session_window`
    * aggregation with a watermark — the engine merges/extends window
    * state per key and FINALIZES a session once the watermark passes its
    * end, so state is bounded by the active-session set (no custom state
    * code). Works identically on a batch frame (the oracled registry
    * twin is `events_session_window`); streaming == batch is pinned in
    * `EventStreamsSpec`. */
  def sessionWindowCounts(events: DataFrame, gap: String = "30 minutes",
                          horizon: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", horizon)
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_micros(col("w.start")).as("session_start_us"),
        unix_micros(col("w.end")).as("session_end_us"),
        col("n_events"))

  case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                   event_type: String, value: Double)

  case class SessionState(start: Long, last: Long, n: Long)

  case class Session(user_id: Long, session_start: Timestamp,
                     session_end: Timestamp, n_events: Long,
                     duration_sec: Double)

  /** Gap-based sessionization via `flatMapGroupsWithState`: a session ends
    * when a user is idle for `gapSec`. Emits one row per closed session;
    * open sessions close on event-time timeout (watermark-driven), so state
    * size is bounded by the active-user set. */
  def sessionize(events: Dataset[Event], gapSec: Long): Dataset[Session] = {
    implicit val sessionEnc = Encoders.product[Session]
    implicit val stateEnc = Encoders.product[SessionState]
    implicit val longEnc = Encoders.scalaLong

    def close(userId: Long, s: SessionState): Session =
      Session(userId, new Timestamp(s.start), new Timestamp(s.last), s.n,
        (s.last - s.start) / 1000.0)

    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.map(close(userId, _))
            state.remove()
            out.iterator
          } else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var cur = state.getOption
            val closed = Seq.newBuilder[Session]
            for (e <- sorted) {
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.last <= gapSec * 1000 =>
                  // in-watermark late arrivals (t < s.last across batches)
                  // extend the session BACKWARD too, keeping start/duration
                  // consistent with the batch twin
                  cur = Some(SessionState(start = math.min(s.start, t),
                    last = math.max(s.last, t), n = s.n + 1))
                case Some(s) =>
                  closed += close(userId, s)
                  cur = Some(SessionState(t, t, 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last + gapSec * 1000)
            }
            closed.result().iterator
          }
      }
  }

  case class StateChange(key: Long, ts: Timestamp, state: String)

  case class KeyedEvent(key: Long, ts: Timestamp, event_id: Long)

  case class EnrichedEvent(key: Long, event_id: Long, ts: Timestamp,
                           state: String)

  /** (side 0 = state change, side 1 = event) on the unioned stream. */
  case class TemporalRow(key: Long, ts: Timestamp, side: Int,
                         state: String, event_id: Long)

  /** Per-key buffers: state changes as (epochMs, state), events as
    * (epochMs, event_id), both kept sorted. */
  case class TemporalState(changes: List[(Long, String)],
                           pending: List[(Long, Long)])

  /** Streaming TEMPORAL (as-of) join — the operator Flink ships as
    * `FOR SYSTEM_TIME AS OF` and Spark has no native form of: each event
    * is enriched with the LATEST state change at or before its event
    * time, exactly once, correct under out-of-order arrival on BOTH
    * streams within the watermark horizon.
    *
    * How: the two streams union (tagged by side), group by key, and a
    * `flatMapGroupsWithState` buffer holds (a) future state changes and
    * (b) events the watermark has not yet passed. An event emits only
    * once the watermark passes its timestamp — after that no change with
    * an earlier timestamp can still arrive (the watermark would drop
    * it), so the matched state is FINAL. Event-time timeouts flush
    * pending events when a key goes quiet.
    *
    * State bounds (the 100 TB shape): per key, the change buffer keeps
    * ONE change at or below the watermark (the reigning state) plus
    * changes inside the horizon; the event buffer holds at most the
    * horizon's worth. Keys with no pending events and no reigning state
    * drop out of the store entirely. A key whose traffic stops retains
    * only its reigning change row — the same bounded "latest version per
    * key" any temporal-join state backend holds.
    *
    * Contract: (key, ts) must be unique on the change stream (the
    * [[graft.operators.AsofJoin.asofBackward]] determinism contract);
    * equal timestamps match (change at t enriches an event at t). The
    * batch twin IS `asofBackward` — equality is spec-pinned on the real
    * events table. */
  def temporalJoin(changes: Dataset[StateChange], events: Dataset[KeyedEvent],
                   horizon: String = "1 hour"): Dataset[EnrichedEvent] = {
    implicit val rowEnc = Encoders.product[TemporalRow]
    implicit val stEnc = Encoders.product[TemporalState]
    implicit val outEnc = Encoders.product[EnrichedEvent]
    implicit val longEnc = Encoders.scalaLong

    val tagged = changes
      .map(c => TemporalRow(c.key, c.ts, 0, c.state, 0L))
      .unionByName(events.map(e =>
        TemporalRow(e.key, e.ts, 1, null, e.event_id)))
      .withWatermark("ts", horizon)

    tagged
      .groupByKey(_.key)
      .flatMapGroupsWithState[TemporalState, EnrichedEvent](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key: Long, rows: Iterator[TemporalRow],
         st: GroupState[TemporalState]) =>
          val wm = st.getCurrentWatermarkMs()
          val prev = st.getOption.getOrElse(TemporalState(Nil, Nil))
          val (chg, evs) = rows.toSeq.partition(_.side == 0)
          val changes = (prev.changes ++
            chg.map(c => (c.ts.getTime, c.state))).sortBy(_._1)
          val pending = (prev.pending ++
            evs.map(e => (e.ts.getTime, e.event_id))).sortBy(_._1)
          // the watermark has passed these events: their match is final
          val (emit, keep) = pending.partition(_._1 <= wm)
          val out = emit.map { case (t, id) =>
            val m = changes.takeWhile(_._1 <= t).lastOption
            EnrichedEvent(key, id, new Timestamp(t), m.map(_._2).orNull)
          }
          // reigning state (latest change <= wm) + in-horizon future ones
          val (past, future) = changes.partition(_._1 <= wm)
          val kept = past.takeRight(1) ::: future
          if (keep.isEmpty && kept.isEmpty) st.remove()
          else {
            st.update(TemporalState(kept, keep))
            // flush the head pending event once the watermark passes it
            // (timeout must sit strictly beyond the current watermark)
            keep.headOption.foreach(e =>
              st.setTimeoutTimestamp(math.max(e._1, wm + 1)))
          }
          out.iterator
      }
  }

  /** Stream-stream interval join: attribute each `click` to every `view`
    * by the same user within the preceding `windowSec` seconds — the
    * classic ad-attribution shape. Both sides carry watermarks and the
    * join predicate bounds event time on BOTH sides, which is exactly
    * what lets Spark's stream-stream join evict buffered state (without
    * the time bound the buffers grow forever). Works unchanged on batch
    * DataFrames — the batch twin is the oracled `events_attribution`
    * registry query. */
  def attributeClicks(views: DataFrame, clicks: DataFrame,
                      windowSec: Long, streaming: Boolean = true,
                      joinType: String = "inner"): DataFrame = {
    val v0 = views.select(col("user_id").as("v_user"),
      col("event_id").as("view_id"), col("ts").as("view_ts"))
    val c0 = clicks.select(col("user_id").as("c_user"),
      col("event_id").as("click_id"), col("ts").as("click_ts"))
    val v = if (streaming) v0.withWatermark("view_ts", "1 hour") else v0
    val c = if (streaming) c0.withWatermark("click_ts", "1 hour") else c0
    // joinType "left_outer" additionally emits UNattributed clicks with
    // null view columns — on a stream those rows flush once the watermark
    // passes the click's join window (Spark's watermarked outer
    // stream-stream join), so "clicks that never followed a view" is a
    // continuously-produced dataset, not a batch backfill
    c.join(v,
      col("c_user") === col("v_user") &&
        col("click_ts") >= col("view_ts") &&
        col("click_ts") <= col("view_ts") + expr(s"INTERVAL $windowSec SECONDS"),
      joinType)
      .select(col("c_user").as("user_id"), col("view_id"), col("click_id"),
        col("view_ts"), col("click_ts"))
  }
}
