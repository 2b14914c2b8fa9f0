package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

class ChangeCaptureStreamsSpec extends SparkSpec {

  private def ts(sec: Long) = new Timestamp(1700000000000L + sec * 1000)

  // (key, ts, op, name, qty)
  private type Chg = (Long, Timestamp, String, String, Long)

  private def apply(batch: Seq[Chg], target: String, tmp: String): Unit = {
    import spark.implicits._
    ChangeCaptureStreams.applyUpsertBatch(
      batch.toDF("k", "ts", "op", "name", "qty"),
      target, s"$tmp/backups", "k", "ts", "op")
  }

  private def live(target: String): Map[Long, (String, Long)] = {
    import spark.implicits._
    ChangeCaptureStreams.readSnapshot(spark, target)
      .select("k", "name", "qty").as[(Long, String, Long)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
  }

  test("batched applies == one-shot apply of the whole log; deletes " +
    "tombstone; stale updates cannot resurrect a deleted key") {
    val tmp = Files.createTempDirectory("cdc-stream").toString
    val b1: Seq[Chg] = Seq(
      (1L, ts(10), "U", "ada", 5L),
      (2L, ts(10), "U", "bob", 7L))
    val b2: Seq[Chg] = Seq(
      (1L, ts(20), "U", "ada2", 6L), // newer update wins
      (2L, ts(30), "D", null, 0L), // delete k=2
      (3L, ts(20), "U", "eve", 1L)) // insert k=3
    val b3: Seq[Chg] = Seq(
      (2L, ts(25), "U", "bob-stale", 9L), // OLDER than the delete: must lose
      (3L, ts(5), "U", "eve-stale", 2L)) // older than the insert: must lose
    val incr = s"$tmp/incr"
    Seq(b1, b2, b3).foreach(apply(_, incr, tmp))
    val oneShot = s"$tmp/oneshot"
    apply(b1 ++ b2 ++ b3, oneShot, tmp)
    val want = Map(1L -> (("ada2", 6L)), 3L -> (("eve", 1L)))
    assert(live(incr) === want)
    assert(live(oneShot) === want)
    // the delete is retained as a tombstone carrying its ts (the
    // evidence that k=2's stale update lost)
    import spark.implicits._
    val tomb = ChangeCaptureStreams.readWithTombstones(spark, incr)
      .where(col("_deleted")).select("k", "_ts")
      .as[(Long, Timestamp)].collect()
    assert(tomb === Array((2L, ts(30))))
  }

  test("replayed micro-batch is a no-op by algebra (LWW max absorbs repeats)") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("cdc-replay").toString
    val target = s"$tmp/t"
    val b1: Seq[Chg] = Seq((1L, ts(10), "U", "ada", 5L),
      (2L, ts(10), "U", "bob", 7L))
    val b2: Seq[Chg] = Seq((2L, ts(30), "D", null, 0L),
      (3L, ts(20), "U", "eve", 1L))
    apply(b1, target, tmp); apply(b2, target, tmp)
    val before = ChangeCaptureStreams.readWithTombstones(spark, target)
      .orderBy("k").collect().toSeq
    apply(b2, target, tmp) // at-least-once redelivery
    val after = ChangeCaptureStreams.readWithTombstones(spark, target)
      .orderBy("k").collect().toSeq
    assert(after === before)
  }

  test("same-ts races are deterministic: delete outranks upsert, payload " +
    "breaks upsert-upsert ties") {
    val tmp = Files.createTempDirectory("cdc-ties").toString
    val target = s"$tmp/t"
    apply(Seq(
      (1L, ts(10), "U", "x", 1L), (1L, ts(10), "D", null, 0L), // D wins
      (2L, ts(10), "U", "a", 1L), (2L, ts(10), "U", "b", 1L) // max payload wins
    ), target, tmp)
    assert(live(target) === Map(2L -> (("b", 1L))))
  }

  test("MemoryStream e2e: two micro-batches through upsertIngest") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("cdc-e2e").toString
    val target = s"$tmp/t"
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[Chg]
    val q = ChangeCaptureStreams.upsertIngest(
      ms.toDF().toDF("k", "ts", "op", "name", "qty"),
      target, s"$tmp/backups", s"$tmp/ckpt", "k", "ts", "op",
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    try {
      ms.addData((1L, ts(10), "U", "ada", 5L), (2L, ts(10), "U", "bob", 7L))
      q.processAllAvailable()
      ms.addData((1L, ts(20), "D", null, 0L), (3L, ts(20), "U", "eve", 1L))
      q.processAllAvailable()
    } finally q.stop()
    assert(live(target) === Map(2L -> (("bob", 7L)), 3L -> (("eve", 1L))))
  }
}
