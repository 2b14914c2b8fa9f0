package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {

  private def ts(sec: Long) = new Timestamp(1700000000000L + sec * 1000)

  test("point-in-interval: inclusive bounds, keyed, bucket-straddling intervals") {
    import spark.implicits._
    val points = Seq(
      (1L, "u1", ts(100)), // inside iv A
      (2L, "u1", ts(300)), // exactly at iv A end (inclusive)
      (3L, "u1", ts(301)), // just outside iv A
      (4L, "u1", ts(650)), // inside iv B, which straddles a bucket boundary
      (5L, "u2", ts(100)) // right time, wrong key
    ).toDF("pid", "k", "t")
    val intervals = Seq(
      ("u1", "A", ts(50), ts(300)),
      ("u1", "B", ts(550), ts(700))
    ).toDF("k", "iv", "s", "e")
    val got = RangeJoin.pointInInterval(points, intervals, "k", "t", "s", "e",
      bucketSec = 600)
      .select("pid", "iv").as[(Long, String)].collect().sortBy(_._1)
    assert(got === Array((1L, "A"), (2L, "A"), (4L, "B")))
  }

  test("one pair per qualifying (point, interval) even across buckets") {
    import spark.implicits._
    val points = Seq((1L, "k", ts(10))).toDF("pid", "k", "t")
    // interval spans many buckets; the pair must appear exactly once
    val intervals = Seq(("k", "wide", ts(0), ts(10000))).toDF("k", "iv", "s", "e")
    val got = RangeJoin.pointInInterval(points, intervals, "k", "t", "s", "e",
      bucketSec = 60)
    assert(got.count() === 1L)
  }

  test("interval overlap: equals the brute-force overlap join, one row per pair") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // deterministic synthetic intervals: lengths and keys vary, several
    // straddle bucket borders, some identical, some touching endpoints
    val left = (0 until 60).map { i =>
      val start = (i * 37 % 300).toLong
      (s"k${i % 3}", i.toLong, start, start + (i * 13 % 90))
    }.toDF("k", "a_id", "a_start", "a_end")
    val right = (0 until 60).map { i =>
      val start = (i * 53 % 300).toLong
      (s"k${i % 3}", i.toLong + 1000, start, start + (i * 7 % 120))
    }.toDF("k", "b_id", "b_start", "b_end")
    val got = RangeJoin.intervalOverlap(left, right, "k",
      "a_start", "a_end", "b_start", "b_end", bucketWidth = 32)
      .select("a_id", "b_id").as[(Long, Long)].collect().sorted
    val brute = left.join(right, Seq("k"))
      .where(col("a_start") <= col("b_end") && col("b_start") <= col("a_end"))
      .select("a_id", "b_id").as[(Long, Long)].collect().sorted
    assert(brute.nonEmpty && got === brute)
  }

  test("interval overlap: touching endpoints are inclusive; disjoint never joins") {
    import spark.implicits._
    val a = Seq(("k", 1L, 100L, 200L)).toDF("k", "a_id", "a_start", "a_end")
    val b = Seq(
      ("k", 10L, 200L, 250L), // touches at 200 -> inclusive overlap
      ("k", 11L, 201L, 250L), // disjoint by one unit
      ("k", 12L, 0L, 99L) // disjoint before
    ).toDF("k", "b_id", "b_start", "b_end")
    val got = RangeJoin.intervalOverlap(a, b, "k",
      "a_start", "a_end", "b_start", "b_end", bucketWidth = 64)
      .select("b_id").as[Long].collect()
    assert(got === Array(10L))
  }
}
