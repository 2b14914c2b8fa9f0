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
}
