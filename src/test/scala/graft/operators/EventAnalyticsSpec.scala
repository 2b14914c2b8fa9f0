package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

class EventAnalyticsSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("funnel: stage order is enforced strictly, missed stages stay null") {
    import spark.implicits._
    val events = Seq(
      // full conversion
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 11:00:00"), "click"),
      (1L, ts("2024-01-01 12:00:00"), "purchase"),
      // click only — no view means no stage ever completes
      (2L, ts("2024-01-01 10:00:00"), "click"),
      // click BEFORE the first view doesn't count; none after
      (3L, ts("2024-01-01 09:00:00"), "click"),
      (3L, ts("2024-01-01 10:00:00"), "view"),
      // view then purchase, but no click: purchase can't fire
      (4L, ts("2024-01-01 10:00:00"), "view"),
      (4L, ts("2024-01-01 11:00:00"), "purchase"),
      // click at EXACTLY the view's timestamp: strict > excludes it
      (5L, ts("2024-01-01 10:00:00"), "view"),
      (5L, ts("2024-01-01 10:00:00"), "click"),
      // second click after view: the FIRST qualifying one wins
      (6L, ts("2024-01-01 10:00:00"), "view"),
      (6L, ts("2024-01-01 11:00:00"), "click"),
      (6L, ts("2024-01-01 12:00:00"), "click"),
      (6L, ts("2024-01-01 13:00:00"), "purchase"))
      .toDF("user_id", "ts", "event_type")
    val got = EventAnalytics
      .funnel(events, "user_id", "ts", "event_type",
        "view", "click", "purchase")
      .as[(Long, Option[Timestamp], Option[Timestamp], Option[Timestamp])]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) === ((Some(ts("2024-01-01 10:00:00")),
      Some(ts("2024-01-01 11:00:00")), Some(ts("2024-01-01 12:00:00")))))
    assert(got(2L) === ((None, None, None)))
    assert(got(3L) === ((Some(ts("2024-01-01 10:00:00")), None, None)))
    assert(got(4L) === ((Some(ts("2024-01-01 10:00:00")), None, None)))
    assert(got(5L) === ((Some(ts("2024-01-01 10:00:00")), None, None)))
    assert(got(6L) === ((Some(ts("2024-01-01 10:00:00")),
      Some(ts("2024-01-01 11:00:00")), Some(ts("2024-01-01 13:00:00")))))
  }

  test("transitions: per-user ordered steps aggregate into edge counts") {
    import spark.implicits._
    val events = Seq(
      // user 1: view -> click -> view
      (1L, 10L, ts("2024-01-01 10:00:00"), "view"),
      (1L, 11L, ts("2024-01-01 11:00:00"), "click"),
      (1L, 12L, ts("2024-01-01 12:00:00"), "view"),
      // user 2: view -> click; NO cross-user edge from user 1's last view
      (2L, 20L, ts("2024-01-01 10:00:00"), "view"),
      (2L, 21L, ts("2024-01-01 11:00:00"), "click"),
      // user 3: simultaneous events ordered by event_id: a -> b
      (3L, 30L, ts("2024-01-01 10:00:00"), "a"),
      (3L, 31L, ts("2024-01-01 10:00:00"), "b"))
      .toDF("user_id", "event_id", "ts", "event_type")
    val got = EventAnalytics
      .transitions(events, "user_id", "ts", "event_id", "event_type")
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got(("view", "click")) === 2L)
    assert(got(("click", "view")) === 1L)
    assert(got(("a", "b")) === 1L)
    assert(got.size === 3) // nothing else, no cross-user leakage
  }

  test("retention: cohort by first day, distinct active users per offset") {
    import spark.implicits._
    val events = Seq(
      (1L, ts("2024-01-01 09:00:00")), (1L, ts("2024-01-01 17:00:00")),
      (1L, ts("2024-01-03 09:00:00")),
      (2L, ts("2024-01-01 12:00:00")),
      (3L, ts("2024-01-02 12:00:00")), (3L, ts("2024-01-03 12:00:00")))
      .toDF("user_id", "ts")
    val got = EventAnalytics.retention(events, "user_id", "ts")
      .as[(java.sql.Date, Long, Long)].collect()
      .map(r => (r._1.toString, r._2) -> r._3).toMap
    // cohort 01-01: users 1,2 on day 0; user 1 again on day 2 (same-day
    // repeats collapse)
    assert(got(("2024-01-01", 0L)) === 2L)
    assert(got(("2024-01-01", 2L)) === 1L)
    // cohort 01-02: user 3 on days 0 and 1
    assert(got(("2024-01-02", 0L)) === 1L)
    assert(got(("2024-01-02", 1L)) === 1L)
    assert(got.size === 4)
  }

  test("stateRuns: consecutive same-type islands, ties broken by event id") {
    import spark.implicits._
    // user 1: A A B A A A -> (A,1,2) (B,3,1) (A,4,3); the two events at
    // ts=10 order by event_id (1 then 2) and still fuse into one A-run.
    // user 2: one event -> a single run of 1
    val events = Seq(
      (1L, 10L, 1L, "A"), (1L, 10L, 2L, "A"), (1L, 20L, 3L, "B"),
      (1L, 30L, 4L, "A"), (1L, 40L, 5L, "A"), (1L, 50L, 6L, "A"),
      (2L, 10L, 7L, "B"))
      .toDF("user_id", "ts", "event_id", "event_type").repartition(5)
    val got = EventAnalytics
      .stateRuns(events, "user_id", "ts", "event_id", "event_type")
      .as[(Long, String, Long, Long)].collect().toSet
    assert(got === Set(
      (1L, "A", 1L, 2L), (1L, "B", 3L, 1L), (1L, "A", 4L, 3L),
      (2L, "B", 1L, 1L)))
  }

  test("intervalCoverage: overlap and adjacency merge, nesting, disjoint islands") {
    import spark.implicits._
    // g1: (0,10)+(5,15) overlap, (15,20) is ADJACENT (s == running max,
    // strict > keeps it in the island), (30,40) is disjoint
    // g2: (10,20) nested inside (0,100) — island spans the outer interval
    val ivs = Seq(
      ("g1", 1L, 0L, 10L), ("g1", 2L, 5L, 15L), ("g1", 3L, 15L, 20L),
      ("g1", 4L, 30L, 40L),
      ("g2", 5L, 0L, 100L), ("g2", 6L, 10L, 20L))
      .toDF("g", "id", "s", "e").repartition(5)
    val got = EventAnalytics.intervalCoverage(ivs, Seq("g"), "s", "e",
      tiebreakCols = Seq("id"))
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got("g1") === ((4L, 2L, 30L))) // [0,20] + [30,40] = 20 + 10
    assert(got("g2") === ((2L, 1L, 100L)))
  }

  test("assocRules: directed support/confidence/lift in exact ppm, duplicates collapse") {
    import spark.implicits._
    // baskets: (u1,d1)={A,B,C} (u1,d2)={A,B} (u2,d1)={A} (u2,d2)={B,C}
    // N=4; |A|=3 |B|=3 |C|=2; A∧B=2, B∧C=2, A∧C=1
    val rows = Seq(
      (1L, "d1", "A"), (1L, "d1", "B"), (1L, "d1", "C"),
      (1L, "d1", "A"), // duplicate event in the same basket: collapses
      (1L, "d2", "A"), (1L, "d2", "B"),
      (2L, "d1", "A"), (2L, "d2", "B"), (2L, "d2", "C"))
      .toDF("user_id", "day", "event_type").repartition(3)
    val got = EventAnalytics.assocRules(rows, Seq("user_id", "day"),
      "event_type", minSupport = 2L)
      .select("antecedent", "consequent", "n_pair", "confidence_ppm",
        "lift_ppm")
      .as[(String, String, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    // A->C (support 1) fell below minSupport
    assert(got.keySet === Set(("A", "B"), ("B", "A"), ("B", "C"), ("C", "B")))
    assert(got(("A", "B")) === ((2L, 666666L, 888888L))) // 2/3, 2*4/(3*3)
    assert(got(("B", "A")) === ((2L, 666666L, 888888L)))
    assert(got(("B", "C")) === ((2L, 666666L, 1333333L))) // 2/3, 2*4/(3*2)
    assert(got(("C", "B")) === ((2L, 1000000L, 1333333L))) // 2/2
  }

  test("forwardFillCalendar: gaps fill to the next observation, none after the last") {
    import spark.implicits._
    // u1: days 10 (v=5), 13 (v=7) -> 10,11,12 carry 5; 13 carries 7, no
    // fill past it. u2: single day, no fill
    val obs = Seq((1L, 10L, 5L), (1L, 13L, 7L), (2L, 20L, 9L))
      .toDF("user_id", "d", "n").repartition(3)
    val got = EventAnalytics.forwardFillCalendar(obs, Seq("user_id"),
      "d", "n").as[(Long, Long, Long, Long)].collect().toSet
    assert(got === Set(
      (1L, 10L, 5L, 1L), (1L, 11L, 5L, 0L), (1L, 12L, 5L, 0L),
      (1L, 13L, 7L, 1L), (2L, 20L, 9L, 1L)))
  }

  test("markovTransitions: adjacent pairs per user, exact ppm rows") {
    import spark.implicits._
    // u1: A B A B -> A->B x2, B->A x1 ; u2: A A -> A->A x1
    // totals: from A = 3 (A->B 2, A->A 1), from B = 1
    val events = Seq(
      (1L, 10L, 1L, "A"), (1L, 20L, 2L, "B"), (1L, 30L, 3L, "A"),
      (1L, 40L, 4L, "B"),
      (2L, 10L, 5L, "A"), (2L, 20L, 6L, "A"))
      .toDF("user_id", "ts", "event_id", "event_type").repartition(4)
    val got = EventAnalytics.markovTransitions(events, "user_id",
      Seq("ts", "event_id"), "event_type")
      .as[(String, String, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    assert(got === Map(
      ("A", "B") -> ((2L, 3L, 666666L)),
      ("A", "A") -> ((1L, 3L, 333333L)),
      ("B", "A") -> ((1L, 1L, 1000000L))))
  }

  test("ewmaIntWindow: hand-computed power-of-two weighting, window cut, " +
    "null exclusion") {
    import spark.implicits._
    val rows = Seq(
      (1L, 10L, 1L, Some(1.0)), (1L, 20L, 2L, Some(2.0)),
      (1L, 30L, 3L, Some(4.0)),
      (2L, 10L, 4L, None)) // null value: excluded entirely
      .toDF("user_id", "ts", "event_id", "value").repartition(3)
    def run(win: Int) = EventAnalytics.ewmaIntWindow(rows, "user_id",
        Seq("ts", "event_id"), "value", window = win)
      .select($"event_id", $"n", $"ewma_micros")
      .as[(Long, Long, Long)].collect().toSet
    // full window: (1·1)/1, (1·1+2·2)/3, (1·1+2·2+4·4)/7 in micro-units
    assert(run(16) === Set(
      (1L, 1L, 1000000L), (2L, 2L, 1666666L), (3L, 3L, 3000000L)))
    // window=2 drops the oldest value from the third frame: (2+4·2)/3
    assert(run(2) === Set(
      (1L, 1L, 1000000L), (2L, 2L, 1666666L), (3L, 2L, 3333333L)))
  }

  test("doubleEwmaIntWindow: constant series is a fixed point; " +
    "hand-computed ramp; forecast leads the lagging smoother") {
    import spark.implicits._
    val const = (1 to 5).map(i => (1L, i.toLong, 7.0)).toDF("u", "seq", "v")
    val c = EventAnalytics.doubleEwmaIntWindow(const, "u", Seq("seq"), "v")
      .select("ewma_micros", "dewma_micros", "forecast_micros")
      .as[(Long, Long, Long)].collect()
    assert(c.forall(_ == ((7000000L, 7000000L, 7000000L))))
    // ramp 1.0, 2.0: row2 s1 = (1e6 + 2*2e6) div 3 = 1666666,
    // s2 = (1e6 + 2*1666666) div 3 = 1444444, f = 3*s1 - 2*s2 = 2111110
    val ramp = Seq((1L, 1L, 1.0), (1L, 2L, 2.0)).toDF("u", "seq", "v")
    val r = EventAnalytics.doubleEwmaIntWindow(ramp, "u", Seq("seq"), "v")
      .where($"seq" === 2L)
      .select("ewma_micros", "dewma_micros", "forecast_micros")
      .as[(Long, Long, Long)].collect().head
    assert(r === ((1666666L, 1444444L, 2111110L)))
    // on a rising series the forecast sits above the lagging s1
    assert(r._3 > r._1)
  }

  test("twapDaily: hand-computed hold durations; last sample holds to " +
    "midnight; plain AVG would differ") {
    import spark.implicits._
    // one group, one day: v=10.0 at 00:00, v=40.0 at 18:00 ->
    // 10 held 64800s, 40 held 21600s: twap = (10000*64800 + 40000*21600)
    //   / 86400 = 17500 milli — a plain AVG would say 25000
    val df = Seq(
      ("g", java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 10.0),
      ("g", java.sql.Timestamp.valueOf("2024-01-01 18:00:00"), 40.0)
    ).toDF("g", "ts", "v")
    val got = EventAnalytics.twapDaily(df, "g", "ts", "v")
      .as[(String, Long, Long, Long, Long)].collect().head
    val day = java.sql.Date.valueOf("2024-01-01").toLocalDate.toEpochDay
    assert(got === (("g", day, 2L, 86400L, 17500L)))
  }

  test("twapDaily: late-starting day covers first-sample to midnight only") {
    import spark.implicits._
    // single sample at 23:00 -> held 3600s, twap = its own value
    val df = Seq(
      ("g", java.sql.Timestamp.valueOf("2024-02-02 23:00:00"), 7.5)
    ).toDF("g", "ts", "v")
    val got = EventAnalytics.twapDaily(df, "g", "ts", "v")
      .as[(String, Long, Long, Long, Long)].collect().head
    assert(got._4 === 3600L && got._5 === 7500L)
  }

  test("cusumChangepoint: planted level shift is located at the last " +
    "pre-shift period with the exact scaled peak") {
    import spark.implicits._
    // 10 @ level 10 then 5 days @ 20: |C·n| peaks at day 5 with 250
    val series = (1 to 10).map { d =>
      ("g", java.sql.Date.valueOf(f"2024-01-$d%02d"),
        if (d <= 5) 10L else 20L)
    }.toDF("g", "day", "x")
    val got = EventAnalytics.cusumChangepoint(series, "g", "day", "x")
      .as[(String, Long, Long, Long, Long)].collect().head
    val day5 = java.sql.Date.valueOf("2024-01-05").toLocalDate.toEpochDay
    assert(got === (("g", 10L, 150L, day5, 250L)))
  }

  test("cusumChangepoint: ties break to the EARLIEST period") {
    import spark.implicits._
    // x = (20,10,20,10): |C| = 20 at day 1 AND day 3 -> day 1 wins
    val series = Seq(
      ("g", java.sql.Date.valueOf("2024-03-01"), 20L),
      ("g", java.sql.Date.valueOf("2024-03-02"), 10L),
      ("g", java.sql.Date.valueOf("2024-03-03"), 20L),
      ("g", java.sql.Date.valueOf("2024-03-04"), 10L)).toDF("g", "day", "x")
    val got = EventAnalytics.cusumChangepoint(series, "g", "day", "x")
      .as[(String, Long, Long, Long, Long)].collect().head
    val day1 = java.sql.Date.valueOf("2024-03-01").toLocalDate.toEpochDay
    assert(got === (("g", 4L, 60L, day1, 20L)))
  }
}
