package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

class ChangeCaptureSpec extends SparkSpec {

  private def ts(sec: Long) = new Timestamp(1700000000000L + sec * 1000)

  test("snapshotDiff classifies I/U/D and drops unchanged keys") {
    import spark.implicits._
    val prev = Seq(
      (1L, 100L, "A"), // unchanged -> dropped
      (2L, 200L, "A"), // price changes -> U
      (3L, 300L, "A"), // disappears -> D
      (4L, 400L, "A") // status changes -> U
    ).toDF("k", "price", "status")
    val next = Seq(
      (1L, 100L, "A"),
      (2L, 250L, "A"),
      (4L, 400L, "B"),
      (5L, 500L, "A") // appears -> I
    ).toDF("k", "price", "status")
    val got = ChangeCapture
      .snapshotDiff(prev, next, Seq("k"), Seq("price", "status"))
      .select("k", "change_type", "old_price", "new_price")
      .as[(Long, String, Option[Long], Option[Long])]
      .collect().sortBy(_._1)
    assert(got === Array(
      (2L, "U", Some(200L), Some(250L)),
      (3L, "D", Some(300L), None),
      (4L, "U", Some(400L), Some(400L)),
      (5L, "I", None, Some(500L))))
  }

  test("snapshotDiff null transitions are U, null-to-null is unchanged") {
    import spark.implicits._
    val prev = Seq((1L, Option.empty[Long]), (2L, Option(2L)),
      (3L, Option.empty[Long])).toDF("k", "v")
    val next = Seq((1L, Option(1L)), (2L, Option.empty[Long]),
      (3L, Option.empty[Long])).toDF("k", "v")
    val got = ChangeCapture.snapshotDiff(prev, next, Seq("k"), Seq("v"))
      .select("k", "change_type").as[(Long, String)].collect().sortBy(_._1)
    assert(got === Array((1L, "U"), (2L, "U"))) // k=3 null<=>null drops
  }

  test("null keys and null groups merge as single entities (null-safe joins)") {
    import spark.implicits._
    // null KEY: one row keyed null on both sides, value changed -> one U
    // row, never an I+D pair
    val prev = Seq((Option(1L), 10L), (Option.empty[Long], 20L)).toDF("k", "v")
    val next = Seq((Option(1L), 10L), (Option.empty[Long], 25L)).toDF("k", "v")
    val diff = ChangeCapture.snapshotDiff(prev, next, Seq("k"), Seq("v"))
    val got = diff.select("k", "change_type", "old_v", "new_v")
      .as[(Option[Long], String, Option[Long], Option[Long])].collect()
    assert(got === Array((None, "U", Some(20L), Some(25L))))
    // null GROUP: the delta for group null merges into the previous
    // aggregate's null-group row — incremental == recompute
    val prevG = Seq((1L, Option.empty[String], 3L), (2L, Option("A"), 4L))
      .toDF("k", "g", "v")
    val nextG = Seq((1L, Option.empty[String], 5L), (2L, Option("A"), 4L),
      (3L, Option.empty[String], 7L)).toDF("k", "g", "v")
    val diffG = ChangeCapture.snapshotDiff(prevG, nextG, Seq("k"), Seq("g", "v"))
    val inc = ChangeCapture.incrementalAgg(prevG, diffG, "g", "v")
      .as[(Option[String], Long, Long)].collect().sortBy(_._1)
    val rec = nextG.groupBy($"g").agg(
      org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"),
      org.apache.spark.sql.functions.sum($"v").as("s"))
      .as[(Option[String], Long, Long)].collect().sortBy(_._1)
    assert(inc === rec)
    assert(inc.count(_._1.isEmpty) === 1) // exactly ONE null-group row
  }

  test("incrementalAgg == recompute, including group-flip updates and emptied groups") {
    import spark.implicits._
    val prev = Seq(
      (1L, "A", 10L), (2L, "A", 20L), // group A
      (3L, "B", 5L), // flips to A with a new value
      (4L, "C", 7L) // group C empties (row deleted)
    ).toDF("k", "g", "v")
    val next = Seq(
      (1L, "A", 10L), (2L, "A", 25L), // one value update
      (3L, "A", 6L), // group flip B->A
      (5L, "D", 9L) // new group appears
    ).toDF("k", "g", "v")
    val diff = ChangeCapture.snapshotDiff(prev, next, Seq("k"), Seq("g", "v"))
    val got = ChangeCapture.incrementalAgg(prev, diff, "g", "v")
      .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    val want = next.groupBy("g")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.sum("v").as("s"))
      .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got === want) // B and C gone, D born, A absorbed the flip
    assert(got.map(_._1) === Seq("A", "D"))
  }

  test("scd2Intervals collapses runs and chains validity windows") {
    import spark.implicits._
    val ev = Seq(
      (1L, "free", ts(0), 1L),
      (1L, "free", ts(10), 2L), // same run -> collapsed
      (1L, "paid", ts(20), 3L), // new state
      (1L, "free", ts(30), 4L), // back to free -> NEW run, not merged
      (2L, "paid", ts(5), 5L)
    ).toDF("user_id", "state_in", "ts", "event_id")
    val got = ChangeCapture
      .scd2Intervals(ev.withColumnRenamed("state_in", "event_type"),
        "user_id", "event_type", "ts", Seq("event_id"))
      .select("user_id", "state", "valid_from", "valid_to", "is_current")
      .as[(Long, String, Timestamp, Option[Timestamp], Int)]
      .collect().sortBy(r => (r._1, r._3.getTime))
    assert(got === Array(
      (1L, "free", ts(0), Some(ts(20)), 0),
      (1L, "paid", ts(20), Some(ts(30)), 0),
      (1L, "free", ts(30), None, 1),
      (2L, "paid", ts(5), None, 1)))
  }

  test("upsert: updates win per key, untouched base survives, new keys insert") {
    import spark.implicits._
    val base = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val updates = Seq((2L, "B"), (3L, "C")).toDF("k", "v")
    val got = ChangeCapture.upsert(base, updates, Seq("k"))
      .as[(Long, String)].collect().toSet
    assert(got === Set((1L, "a"), (2L, "B"), (3L, "C")))
    intercept[IllegalArgumentException] {
      ChangeCapture.upsert(base, updates.select("v", "k"), Seq("k"))
    }
  }
}
