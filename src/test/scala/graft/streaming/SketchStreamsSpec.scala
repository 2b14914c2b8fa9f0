package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.operators.Sketches

class SketchStreamsSpec extends SparkSpec {

  test("streamed CMS table equals a one-shot whole-input build BYTE-" +
    "exactly; a replayed batch is a no-op; estimates answer from the " +
    "maintained table") {
    import spark.implicits._
    val li = Tables(spark, sfDir, "lineitem")
      .select(col("l_returnflag"), col("l_partkey")).cache()
    val tmp = Files.createTempDirectory("cms-stream").toString
    val target = s"$tmp/fsk"
    val (d, w) = (4, 512)
    // three deterministic disjoint batches
    val parts = Seq(
      li.where(col("l_partkey") % 3 === 0),
      li.where(col("l_partkey") % 3 === 1),
      li.where(col("l_partkey") % 3 === 2))
    parts.zipWithIndex.foreach { case (b, i) =>
      SketchStreams.applyCmsBatch(b, i.toLong, target, s"$tmp/backups",
        Seq("l_returnflag"), "l_partkey", d, w)
    }
    val streamed = SketchStreams.readSketchTable(spark, target)
      .as[(String, Array[Byte])].collect().toMap
    val whole = Sketches.cmsTable(li, Seq("l_returnflag"), "l_partkey",
        d, w)
      .as[(String, Array[Byte])].collect().toMap
    assert(streamed.keySet === whole.keySet)
    streamed.foreach { case (k, bytes) =>
      assert(java.util.Arrays.equals(bytes, whole(k)),
        s"group $k streamed != whole-input")
    }
    // REPLAY batch 1: the applied-batch watermark must make it a no-op
    // (CMS sums are not idempotent — without the marker this would
    // double-count every batch-1 key)
    SketchStreams.applyCmsBatch(parts(1), 1L, target, s"$tmp/backups",
      Seq("l_returnflag"), "l_partkey", d, w)
    val afterReplay = SketchStreams.readSketchTable(spark, target)
      .as[(String, Array[Byte])].collect().toMap
    afterReplay.foreach { case (k, bytes) =>
      assert(java.util.Arrays.equals(bytes, whole(k)), s"replay mutated $k")
    }
    // point estimates from the maintained table behave like CMS: never
    // under the truth
    val flag = afterReplay.keys.head
    val probe = li.where(col("l_returnflag") === flag)
      .groupBy("l_partkey").count().orderBy(col("count").desc)
      .as[(Long, Long)].head()
    val got = SketchStreams.readSketchTable(spark, target)
      .where(col("l_returnflag") === flag)
      .select(Sketches.cmsEstimate(col("fsketch"), lit(probe._1))
        .as("e")).as[Long].head()
    assert(got >= probe._2)
  }

  test("streamed bitmap table: exact counts equal one-shot build; a " +
    "replayed batch is a set-algebra no-op WITHOUT any marker") {
    import spark.implicits._
    val li = Tables(spark, sfDir, "lineitem")
      .select(col("l_returnflag"), col("l_partkey")).cache()
    val tmp = Files.createTempDirectory("bm-stream").toString
    val target = s"$tmp/bmt"
    // three deterministic OVERLAPPING batches (overlap is the point: the
    // OR absorbs re-seen keys exactly like a replay would)
    val parts = Seq(
      li.where(col("l_partkey") % 3 =!= 2),
      li.where(col("l_partkey") % 3 =!= 0),
      li.where(col("l_partkey") % 3 === 2))
    parts.foreach { b =>
      SketchStreams.applyBitmapBatch(b, target, s"$tmp/backups",
        Seq("l_returnflag"), "l_partkey")
    }
    def counts(): Map[String, Long] = spark.read.parquet(target)
      .select(col("l_returnflag"),
        Sketches.bitmapCount(col("bm")).as("n"))
      .as[(String, Long)].collect().toMap
    val streamed = counts()
    val exact = li.groupBy("l_returnflag")
      .agg(countDistinct("l_partkey").as("n"))
      .as[(String, Long)].collect().toMap
    assert(streamed === exact)
    // replay batch 1: OR is idempotent — no watermark, still a no-op
    SketchStreams.applyBitmapBatch(parts(1), target, s"$tmp/backups",
      Seq("l_returnflag"), "l_partkey")
    assert(counts() === exact)
  }

  test("cmsIngest end-to-end over a MemoryStream: micro-batches maintain " +
    "the table; estimates match the batch-built sketches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val tmp = Files.createTempDirectory("cms-stream2").toString
    val target = s"$tmp/fsk"
    val rows = (1L to 4000L).map(v => ("g" + (v % 2), v % 97))
    val (b0, b1) = rows.splitAt(2000)
    val stream = MemoryStream[(String, Long)]
    val q = SketchStreams.cmsIngest(
      stream.toDF().toDF("g", "k"), target, s"$tmp/backups", s"$tmp/cp",
      Seq("g"), "k", depth = 4, width = 256,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    try {
      stream.addData(b0: _*)
      q.processAllAvailable()
      stream.addData(b1: _*) // a SECOND micro-batch proves maintenance
      q.processAllAvailable()
    } finally q.stop()
    val streamed = SketchStreams.readSketchTable(spark, target)
      .as[(String, Array[Byte])].collect().toMap
    val whole = Sketches.cmsTable(rows.toDF("g", "k"), Seq("g"), "k",
        4, 256)
      .as[(String, Array[Byte])].collect().toMap
    assert(streamed.keySet === whole.keySet && streamed.keySet === Set(
      "g0", "g1"))
    streamed.foreach { case (k, bytes) =>
      assert(java.util.Arrays.equals(bytes, whole(k)), s"group $k differs")
    }
  }

  test("streamed HLL++ register table is BYTE-identical to a one-shot " +
    "build; a replayed batch is an algebraic no-op (max-merge, no " +
    "marker); estimates equal the direct aggregate") {
    import spark.implicits._
    val orders = Tables(spark, sfDir, "orders")
      .select(col("o_orderstatus"), col("o_custkey")).cache()
    val tmp = Files.createTempDirectory("hpp-stream").toString
    val target = s"$tmp/hpp"
    val parts = Seq(
      orders.where(col("o_custkey") % 3 === 0),
      orders.where(col("o_custkey") % 3 === 1),
      orders.where(col("o_custkey") % 3 === 2))
    parts.foreach { b =>
      SketchStreams.applyHllppBatch(b, target, s"$tmp/backups",
        Seq("o_orderstatus"), "o_custkey")
    }
    val streamed = SketchStreams.readSketchTable(spark, target)
      .as[(String, Array[Byte])].collect().toMap
    val whole = orders.groupBy("o_orderstatus")
      .agg(Sketches.hllppSketchAgg(col("o_custkey")).as("sketch"))
      .as[(String, Array[Byte])].collect().toMap
    assert(streamed.keySet === whole.keySet)
    streamed.foreach { case (k, bytes) =>
      assert(java.util.Arrays.equals(bytes, whole(k)),
        s"group $k streamed != whole-input")
    }
    // replay batch 1 WITHOUT any watermark: max(a, a) = a, so the table
    // must not move a byte (the idempotence contrast with CMS)
    SketchStreams.applyHllppBatch(parts(1), target, s"$tmp/backups",
      Seq("o_orderstatus"), "o_custkey")
    SketchStreams.readSketchTable(spark, target)
      .as[(String, Array[Byte])].collect().toMap
      .foreach { case (k, bytes) =>
        assert(java.util.Arrays.equals(bytes, whole(k)), s"replay mutated $k")
      }
    // estimates from the maintained table equal the direct aggregate
    val est = SketchStreams.readSketchTable(spark, target)
      .select(col("o_orderstatus"),
        Sketches.hllppEstimate(col("sketch")).as("n"))
      .as[(String, Long)].collect().toMap
    val direct = orders.groupBy("o_orderstatus")
      .agg(approx_count_distinct(col("o_custkey"), 0.02).as("n"))
      .as[(String, Long)].collect().toMap
    assert(est === direct)
  }
}
