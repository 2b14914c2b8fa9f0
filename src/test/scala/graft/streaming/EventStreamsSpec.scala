package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class EventStreamsSpec extends SparkSpec {

  test("streaming hourly counts over the real events table match the batch query") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = Tables(spark, sfDir, "events")
      .select($"ts", $"event_type", $"value").cache()

    val stream = MemoryStream[(Timestamp, String, Double)]
    stream.addData(events.as[(Timestamp, String, Double)].collect().toIndexedSeq)
    val q = EventStreams.hourlyCounts(
        stream.toDF().toDF("ts", "event_type", "value"))
      .writeStream.format("memory").queryName("hourly")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()

    val streaming = spark.table("hourly")
    val batch = EventStreams.hourlyCounts(events) // same plan, batch input
    assert(streaming.count() === batch.count())
    assert(streaming.except(batch).count() === 0L)
    assert(batch.except(streaming).count() === 0L)
  }

  test("stream-static enrichment matches the oracled batch twin on the real tables") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = Tables(spark, sfDir, "events")
      .select($"user_id", $"ts").cache()
    val dim = Tables(spark, sfDir, "customer")
      .select($"c_custkey".as("user_id"), $"c_nationkey")

    val stream = MemoryStream[(Long, Timestamp)]
    stream.addData(events.as[(Long, Timestamp)].collect().toIndexedSeq)
    val q = EventStreams.enrichedWindowCounts(
        stream.toDF().toDF("user_id", "ts"), dim, "user_id", "c_nationkey")
      .writeStream.format("memory").queryName("enriched")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()

    val streaming = spark.table("enriched")
    val batch = graft.SparkEntry.queries("events_enriched_window")(
      spark, sfDir)
    assert(streaming.count() === batch.count())
    assert(streaming.except(batch).count() === 0L)
    assert(batch.except(streaming).count() === 0L)
  }

  test("streaming sessionize's closed sessions agree with the batch sessionize query") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = Tables(spark, sfDir, "events")
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
    val stream = MemoryStream[EventStreams.Event]
    stream.addData(events.as[EventStreams.Event].collect().toIndexedSeq)
    val q = EventStreams.sessionize(stream.toDS(), gapSec = 1800)
      .writeStream.format("memory").queryName("sess_cmp")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("sess_cmp").select(
      $"user_id",
      date_format($"session_start", "yyyy-MM-dd HH:mm:ss").as("session_start"),
      $"n_events").as[(Long, String, Long)].collect().toSet
    val batch = graft.SparkEntry.queries("events_sessionize")(spark, sfDir)
      .select("user_id", "session_start", "n_events")
      .as[(Long, String, Long)].collect().toSet
    assert(streamed.nonEmpty)
    // every watermark-closed streaming session is a batch session;
    // only the stream-tail sessions (not yet closed) may be missing
    assert(streamed.subsetOf(batch))
    assert((batch -- streamed).size < batch.size / 10) // tail only
  }

  test("stream-stream attribution join matches the oracled batch twin") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = Tables(spark, sfDir, "events")
      .select($"user_id", $"event_id", $"ts", $"event_type").cache()
    def side(ty: String) = events.where($"event_type" === ty)
      .select($"user_id", $"event_id", $"ts")

    val vStream = MemoryStream[(Long, Long, Timestamp)]
    val cStream = MemoryStream[(Long, Long, Timestamp)]
    vStream.addData(side("view").as[(Long, Long, Timestamp)].collect().toIndexedSeq)
    cStream.addData(side("click").as[(Long, Long, Timestamp)].collect().toIndexedSeq)
    val q = EventStreams.attributeClicks(
        vStream.toDF().toDF("user_id", "event_id", "ts"),
        cStream.toDF().toDF("user_id", "event_id", "ts"), 600)
      .writeStream.format("memory").queryName("attrib")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("attrib")
      .select("user_id", "view_id", "click_id")
      .as[(Long, Long, Long)].collect().toSet
    val batch = graft.SparkEntry.queries("events_attribution")(spark, sfDir)
      .select("user_id", "view_id", "click_id")
      .as[(Long, Long, Long)].collect().toSet
    assert(batch.nonEmpty)
    // single burst, all data inside the watermark horizon: exact equality
    assert(streamed === batch)
  }

  test("outer stream-stream attribution flushes unattributed clicks on watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = Tables(spark, sfDir, "events")
      .select($"user_id", $"event_id", $"ts", $"event_type").cache()
    def side(ty: String) = events.where($"event_type" === ty)
      .select($"user_id", $"event_id", $"ts")

    val vStream = MemoryStream[(Long, Long, Timestamp)]
    val cStream = MemoryStream[(Long, Long, Timestamp)]
    vStream.addData(side("view").as[(Long, Long, Timestamp)].collect().toIndexedSeq)
    cStream.addData(side("click").as[(Long, Long, Timestamp)].collect().toIndexedSeq)
    val q = EventStreams.attributeClicks(
        vStream.toDF().toDF("user_id", "event_id", "ts"),
        cStream.toDF().toDF("user_id", "event_id", "ts"), 600,
        joinType = "left_outer")
      .writeStream.format("memory").queryName("attrib_outer")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // outer (null-padded) rows only flush once the watermark passes the
      // clicks' join windows. The GLOBAL watermark is the min across both
      // inputs, so BOTH streams get a far-future sentinel (user -1, which
      // the assertion filters out — the sentinel click itself emits as
      // unattributed for user -1)
      val maxTs = events.agg(max($"ts")).head().getTimestamp(0)
      val sentinel = new Timestamp(maxTs.getTime + 3 * 3600 * 1000)
      vStream.addData(Seq((-1L, -1L, sentinel)))
      cStream.addData(Seq((-1L, -2L, sentinel)))
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("attrib_outer")
      .where($"user_id" =!= -1L)
      .select($"user_id", $"click_id", $"view_id")
      .as[(Long, Long, Option[Long])].collect().toSet
    val batch = graft.SparkEntry.queries("events_attribution_outer")(spark, sfDir)
      .select($"user_id", $"click_id", $"view_id")
      .as[(Long, Long, Option[Long])].collect().toSet
    assert(batch.exists(_._3.isEmpty), "fixture must contain unattributed clicks")
    assert(streamed === batch)
  }

  test("streaming temporal join equals the batch as-of join exactly " +
    "once sentinels flush the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ev = Tables(spark, sfDir, "events")
      .select($"event_id", $"ts", $"user_id", $"event_type").cache()
    // change stream: purchases, (key, ts) made unique per the temporal
    // contract (min event_id wins, applied identically to the twin)
    val changesB = ev.where($"event_type" === "purchase")
      .groupBy($"user_id", $"ts").agg(min($"event_id").as("chg_id"))
      .select($"user_id".as("key"), $"ts",
        $"chg_id".cast("string").as("state"))
    val eventsB = ev.where($"event_type" === "view")
      .select($"user_id".as("key"), $"ts", $"event_id")

    val cStream = MemoryStream[EventStreams.StateChange]
    val eStream = MemoryStream[EventStreams.KeyedEvent]
    cStream.addData(changesB.as[EventStreams.StateChange].collect()
      .toIndexedSeq)
    eStream.addData(eventsB.as[EventStreams.KeyedEvent].collect()
      .toIndexedSeq)
    val q = EventStreams.temporalJoin(cStream.toDS(), eStream.toDS())
      .writeStream.format("memory").queryName("temporal")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // an event emits only once the GLOBAL watermark passes it; two
      // far-future sentinel changes on an unused key advance it in two
      // steps so the second sentinel batch runs with the watermark
      // already beyond every real event (including the stream tail)
      val maxTs = ev.agg(max($"ts")).head().getTimestamp(0)
      for (h <- Seq(48, 96)) {
        cStream.addData(EventStreams.StateChange(-1L,
          new Timestamp(maxTs.getTime + h * 3600L * 1000), "s"))
        q.processAllAvailable()
      }
    } finally q.stop()

    val streamed = spark.table("temporal").where($"key" =!= -1L)
      .select($"key", $"event_id", $"state")
      .as[(Long, Long, Option[String])].collect().toSet
    val batch = graft.operators.AsofJoin.asofBackward(
        eventsB, changesB.withColumnRenamed("ts", "chg_ts"),
        "key", "ts", "chg_ts")
      .select($"key", $"event_id", $"state")
      .as[(Long, Long, Option[String])].collect().toSet
    assert(batch.nonEmpty)
    assert(batch.exists(_._3.isEmpty), "fixture must contain pre-state events")
    assert(batch.exists(_._3.nonEmpty), "fixture must contain enriched events")
    assert(streamed === batch)
  }

  test("streaming temporal join: out-of-order change within the horizon " +
    "still wins; state prunes to the reigning change") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = 1700000000L
    def t(sec: Long) = new Timestamp((base + sec) * 1000)
    val cStream = MemoryStream[EventStreams.StateChange]
    val eStream = MemoryStream[EventStreams.KeyedEvent]
    val q = EventStreams.temporalJoin(cStream.toDS(), eStream.toDS())
      .writeStream.format("memory").queryName("temporal_ooo")
      .outputMode("append").start()
    try {
      // event at 100s and its matching change arrive OUT OF ORDER:
      // the event first, the earlier change second
      eStream.addData(EventStreams.KeyedEvent(1L, t(100), 10L))
      q.processAllAvailable()
      cStream.addData(EventStreams.StateChange(1L, t(50), "a"))
      q.processAllAvailable()
      // watermark pushes (sentinel key) force the flush
      for (h <- Seq(2, 4)) {
        cStream.addData(EventStreams.StateChange(-1L, t(h * 3600), "s"))
        q.processAllAvailable()
      }
    } finally q.stop()
    val got = spark.table("temporal_ooo").where($"key" === 1L)
      .select($"event_id", $"state").as[(Long, String)].collect().toSeq
    // the late-arriving earlier change still enriches the event — the
    // watermark-gated emission is what makes that correct
    assert(got === Seq((10L, "a")))
  }

  test("streaming dedup: re-delivered events within the watermark emit once") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = 1700000000L
    def ev(id: Long, sec: Long) =
      EventStreams.Event(id, new Timestamp((base + sec) * 1000), 1L, "click", 1.0)

    val stream = MemoryStream[EventStreams.Event]
    val q = EventStreams.dedupEvents(stream.toDF())
      .writeStream.format("memory").queryName("deduped")
      .outputMode("append").start()
    try {
      stream.addData(ev(1, 0), ev(2, 10), ev(1, 0)) // dup in-batch
      q.processAllAvailable()
      stream.addData(ev(2, 10), ev(3, 20)) // re-delivery across batches
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("deduped").select("event_id")
      .as[Long].collect().sorted
    assert(got === Array(1L, 2L, 3L)) // each id exactly once
  }

  test("in-watermark late events extend an open session backward (start/duration right)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = 1700000000L
    def ev(id: Long, sec: Long, user: Long) =
      EventStreams.Event(id, new Timestamp((base + sec) * 1000), user, "click", 1.0)

    val stream = MemoryStream[EventStreams.Event]
    val q = EventStreams.sessionize(stream.toDS(), gapSec = 30)
      .writeStream.format("memory").queryName("late_sessions")
      .outputMode("append").start()
    try {
      stream.addData(ev(1, 100, 1)) // batch 1: opens session at +100s
      q.processAllAvailable()
      stream.addData(ev(2, 80, 1)) // batch 2: LATE, within gap + watermark
      q.processAllAvailable()
      stream.addData(ev(99, 100000, 9)) // advance event time -> timeout
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("late_sessions")
      .where($"user_id" === 1L)
      .select("n_events", "duration_sec")
      .as[(Long, Double)].collect()
    // late event lowered session_start to +80s: 2 events over 20s
    assert(got === Array((2L, 20.0)))
  }

  test("sessionization: gap splits sessions, counts and bounds are right") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = 1700000000L // avoid the epoch-0 watermark edge
    def ev(id: Long, sec: Long, user: Long) =
      EventStreams.Event(id, new Timestamp((base + sec) * 1000), user, "click", 1.0)

    val stream = MemoryStream[EventStreams.Event]
    // user 1: events at +0s,+10s,+20s then a 100s gap, then +130s
    // user 2: single event
    stream.addData(ev(1, 0, 1), ev(2, 10, 1), ev(3, 20, 1),
      ev(4, 130, 1), ev(5, 50, 2))
    // advance event time far enough that every session times out
    stream.addData(ev(99, 100000, 9))

    val q = EventStreams.sessionize(stream.toDS(), gapSec = 30)
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.table("sessions")
      .select("user_id", "n_events", "duration_sec")
      .as[(Long, Long, Double)].collect().sortBy(r => (r._1, -r._2))
    // user 1 splits into (3 events, 20s) + (1 event, 0s); user 2 one session
    assert(got.contains((1L, 3L, 20.0)))
    assert(got.contains((1L, 1L, 0.0)))
    assert(got.contains((2L, 1L, 0.0)))
  }

  test("native session_window stream matches the oracled batch twin on real events") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = Tables(spark, sfDir, "events")
      .select($"ts", $"user_id").cache()
    val stream = MemoryStream[(Timestamp, Long)]
    stream.addData(events.as[(Timestamp, Long)].collect().toIndexedSeq)
    val q = EventStreams.sessionWindowCounts(
        stream.toDF().toDF("ts", "user_id"))
      .writeStream.format("memory").queryName("native_sess")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("native_sess")
      .as[(Long, Long, Long, Long)].collect().toSet
    // the oracled registry query computes n_types too; project it away
    val batch = graft.SparkEntry.queries("events_session_window")(
        spark, sfDir)
      .select("user_id", "session_start_us", "session_end_us", "n_events")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(streamed.nonEmpty)
    // watermark-FINALIZED streaming sessions are exactly batch sessions;
    // only the stream tail (watermark never passed it) may be missing.
    // Derive that tail EXPLICITLY: the final watermark is
    // max(event time, ms-truncated) - horizon, so exactly the sessions
    // whose end is beyond it can be un-finalized — no tolerance factor,
    // so a testdata regeneration can't make this flaky. The two tail
    // variants (> vs >=) bracket the engine's boundary inclusivity for
    // a session ending exactly AT the watermark.
    assert(streamed.subsetOf(batch))
    val maxTsMs = events.agg(max($"ts")).as[Timestamp].head().getTime
    val cutoffUs = (maxTsMs - 3600L * 1000L) * 1000L // horizon = 1 hour
    val missing = batch -- streamed
    val tailStrict = batch.filter(_._3 > cutoffUs)
    val tailLoose = batch.filter(_._3 >= cutoffUs)
    assert(tailStrict.subsetOf(missing),
      s"a past-watermark session was finalized early: ${tailStrict -- missing}")
    assert(missing.subsetOf(tailLoose),
      s"sessions missing despite watermark passing them: ${missing -- tailLoose}")
  }
}
