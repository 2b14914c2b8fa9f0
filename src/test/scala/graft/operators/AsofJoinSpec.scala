package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions.col

import graft.SparkSpec

class AsofJoinSpec extends SparkSpec {

  private def ts(sec: Long) = new Timestamp(1700000000000L + sec * 1000)

  test("backward as-of: latest prior right row, equal-ts matches, null when none") {
    import spark.implicits._
    val left = Seq(
      (1L, "u1", ts(5)), // before any right row -> null
      (2L, "u1", ts(10)), // exactly at right ts 10 -> matches q10
      (3L, "u1", ts(25)), // after 10 and 20 -> latest is q20
      (4L, "u2", ts(50)) // other key -> u2's own row only
    ).toDF("id", "k", "t")
    val right = Seq(
      ("u1", ts(10), "q10"),
      ("u1", ts(20), "q20"),
      ("u2", ts(40), "q40")
    ).toDF("k", "rt", "quote")
    val got = AsofJoin.asofBackward(left, right, "k", "t", "rt")
      .select("id", "quote").as[(Long, String)].collect().sortBy(_._1)
    assert(got === Array((1L, null), (2L, "q10"), (3L, "q20"), (4L, "q40")))
  }

  test("null right payload values stay null — no field mixing across right rows") {
    import spark.implicits._
    // newest right row has a null price; the older row's price must NOT
    // leak into the match (the per-column-ffill bug)
    val left = Seq((1L, "u1", ts(30))).toDF("id", "k", "t")
    val right = Seq(
      ("u1", ts(10), Option(9.99), "old"),
      ("u1", ts(20), Option.empty[Double], "new")
    ).toDF("k", "rt", "price", "tag")
    val got = AsofJoin.asofBackward(left, right, "k", "t", "rt")
      .select("id", "price", "tag").as[(Long, Option[Double], String)]
      .collect()
    assert(got === Array((1L, None, "new"))) // all fields from the ts(20) row
  }

  test("column collision is rejected") {
    import spark.implicits._
    val l = Seq((1L, "u", ts(0))).toDF("id", "k", "t")
    val r = Seq(("u", ts(0), 1L)).toDF("k", "rt", "id")
    intercept[IllegalArgumentException] {
      AsofJoin.asofBackward(l, r, "k", "t", "rt")
    }
  }

  test("forward as-of: earliest following right row, equal-ts matches, null when none") {
    import spark.implicits._
    val left = Seq(
      (1L, "u1", ts(5)), // before 10 and 20 -> earliest following is q10
      (2L, "u1", ts(10)), // exactly at right ts 10 -> matches q10
      (3L, "u1", ts(25)), // after every u1 right row -> null
      (4L, "u2", ts(30)) // other key -> u2's own row only
    ).toDF("id", "k", "t")
    val right = Seq(
      ("u1", ts(10), "q10"),
      ("u1", ts(20), "q20"),
      ("u2", ts(40), "q40")
    ).toDF("k", "rt", "quote")
    val got = AsofJoin.asofForward(left, right, "k", "t", "rt")
      .select("id", "quote").as[(Long, String)].collect().sortBy(_._1)
    assert(got === Array((1L, "q10"), (2L, "q10"), (3L, null), (4L, "q40")))
  }

  test("forward as-of fills the struct atomically (no field mixing)") {
    import spark.implicits._
    // nearest following right row has a null price; the later row's price
    // must NOT back-fill into the match
    val left = Seq((1L, "u1", ts(5))).toDF("id", "k", "t")
    val right = Seq(
      ("u1", ts(10), Option.empty[Double], "near"),
      ("u1", ts(20), Option(9.99), "far")
    ).toDF("k", "rt", "price", "tag")
    val got = AsofJoin.asofForward(left, right, "k", "t", "rt")
      .select("id", "price", "tag").as[(Long, Option[Double], String)]
      .collect()
    assert(got === Array((1L, None, "near")))
  }

  test("timestamp ties resolve deterministically via tiebreakCols") {
    import spark.implicits._
    val left = Seq((1L, "u1", ts(5)), (2L, "u1", ts(15))).toDF("id", "k", "t")
    // two right rows share (u1, ts=10): forward picks the SMALLEST seq,
    // backward the LARGEST — and repartitioning must not change the pick
    val right = Seq(
      ("u1", ts(10), 2L, "b"), ("u1", ts(10), 1L, "a")
    ).toDF("k", "rt", "seq", "tag").repartition(7)
    val fwd = AsofJoin.asofForward(left, right, "k", "t", "rt",
      tiebreakCols = Seq("seq"))
      .select("id", "tag").as[(Long, String)].collect().sortBy(_._1)
    assert(fwd === Array((1L, "a"), (2L, null)))
    val bwd = AsofJoin.asofBackward(left, right, "k", "t", "rt",
      tiebreakCols = Seq("seq"))
      .select("id", "tag").as[(Long, String)].collect().sortBy(_._1)
    assert(bwd === Array((1L, null), (2L, "b")))
  }

  test("asofNearest: picks the closer side, ties go backward, keys with " +
    "no right rows stay null") {
    import spark.implicits._
    val left = Seq(
      (1L, "u", ts(100)), // back at 90 (gap 10) vs fwd at 130 (gap 30) -> b
      (2L, "u", ts(125)), // back at 90 (gap 35) vs fwd at 130 (gap 5) -> f
      (3L, "u", ts(110)), // back 90 / fwd 130: equal gap 20 -> tie -> b
      (4L, "v", ts(50)), // only a forward row (60) -> f
      (5L, "w", ts(10)) // no right rows at all -> all null
    ).toDF("id", "k", "t")
    val right = Seq(
      ("u", ts(90), 900L), ("u", ts(130), 1300L), ("v", ts(60), 600L)
    ).toDF("k", "rt", "v")
    val got = AsofJoin.asofNearest(left, right, "k", "t", "rt")
      .select(col("id"), col("v"), col("asof_direction"),
        col("asof_gap_micros"))
      .as[(Long, Option[Long], String, Option[Long])]
      .collect().sortBy(_._1)
    assert(got(0) === ((1L, Some(900L), "b", Some(10000000L))))
    assert(got(1) === ((2L, Some(1300L), "f", Some(5000000L))))
    assert(got(2) === ((3L, Some(900L), "b", Some(20000000L))))
    assert(got(3) === ((4L, Some(600L), "f", Some(10000000L))))
    assert(got(4) === ((5L, None, null, None)))
  }
}
