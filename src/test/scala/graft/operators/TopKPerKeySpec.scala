package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.TopKPerKeyOps.topKPerKey

/** The custom planner-strategy operator: map-side-partial top-k per key
  * must equal the row_number-window formulation on any input, while
  * planning through TopKPerKeyExec (never a full-row shuffle + sort). */
class TopKPerKeySpec extends SparkSpec {

  test("equals the window formulation on skewed data with ties") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = (1 to 5000).map { i =>
      val key = if (i % 10 < 7) "hot" else s"k${rnd.nextInt(50)}" // skew
      (key, rnd.nextInt(40).toLong, i.toLong) // heavy ties in v
    }
    val df = rows.toDF("key", "v", "id").repartition(13)
    val got = topKPerKey(df, Seq("key"),
      Seq(("v", true), ("id", true)), k = 3)
      .as[(String, Long, Long)].collect().toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("key").orderBy(col("v").asc, col("id").asc)
    val expect = df.withColumn("_rn", row_number().over(w))
      .where(col("_rn") <= 3).drop("_rn")
      .as[(String, Long, Long)].collect().toSet
    assert(got === expect)
  }

  test("descending order selects the largest; groups smaller than k survive whole") {
    import spark.implicits._
    val df = Seq(("a", 1L), ("a", 5L), ("a", 3L), ("b", 9L))
      .toDF("key", "v").repartition(4)
    val got = topKPerKey(df, Seq("key"), Seq(("v", false)), k = 2)
      .as[(String, Long)].collect().toSet
    assert(got === Set(("a", 5L), ("a", 3L), ("b", 9L)))
  }

  test("plans through TopKPerKeyExec and works on an empty input") {
    import spark.implicits._
    val df = Seq(("a", 1L)).toDF("key", "v")
    val plan = topKPerKey(df, Seq("key"), Seq(("v", true)), k = 1)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), plan) // nodeName strips "Exec"
    assert(!plan.toLowerCase.contains("window"), plan)
    val empty = Seq.empty[(String, Long)].toDF("key", "v")
    assert(topKPerKey(empty, Seq("key"), Seq(("v", true)), 2).count() === 0L)
  }

  test("map-side prune ships <= k x keys x partitions records, matching Spark's native WindowGroupLimit") {
    import spark.implicits._
    import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
    // 60k rows, 20 keys, 16 partitions: an UNPRUNED shuffle would ship
    // all 60k rows; both the custom operator and (since Spark 3.5)
    // the built-in WindowGroupLimit rewrite of row_number<=k ship only
    // <= k x keys x partitions = 960 — pinned here so neither side can
    // silently regress to shuffle-everything
    val df = (1 to 60000).map(i =>
      (s"k${i % 20}", (i * 2654435761L) % 100003L, i.toLong))
      .toDF("key", "v", "id").repartition(16).cache()
    df.count() // materialize so neither run pays the parent lineage
    def shuffleRecords(body: => Unit): Long = {
      val records = new java.util.concurrent.atomic.AtomicLong
      val l = new SparkListener {
        override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
          records.addAndGet(
            s.stageInfo.taskMetrics.shuffleWriteMetrics.recordsWritten)
      }
      // drain queued events from EARLIER jobs first — a still-queued
      // stage-completed event would otherwise be delivered to this
      // listener and attributed to the measured body
      org.apache.spark.GraftTestBridge.waitForListeners(spark.sparkContext)
      spark.sparkContext.addSparkListener(l)
      try {
        body
        org.apache.spark.GraftTestBridge.waitForListeners(spark.sparkContext)
      } finally spark.sparkContext.removeSparkListener(l)
      records.get()
    }
    val custom = shuffleRecords {
      topKPerKey(df, Seq("key"), Seq(("v", true), ("id", true)), 3).count()
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("key").orderBy(col("v").asc, col("id").asc)
    val windowDf = df.withColumn("_rn", row_number().over(w))
      .where(col("_rn") <= 3).drop("_rn")
    // confirm the built-in prune is what makes the window cheap — the
    // comparison below is only meaningful against the pruned plan
    assert(windowDf.queryExecution.executedPlan.toString
      .contains("WindowGroupLimit"))
    val window = shuffleRecords { windowDf.count() }
    df.unpersist()
    // lower bound too: 20 keys x k=3 surviving rows MUST cross the
    // shuffle — a broken metrics source reading 0 must fail, not pass
    assert(custom >= 60L && custom <= 1000L &&
      window >= 60L && window <= 1000L,
      s"custom=$custom window=$window records")
  }

  test("opt-in optimizer rule rewrites row_number<=k into TopKPerKey") {
    import spark.implicits._
    val df = (1 to 2000).map(i => (s"k${i % 40}", (i * 7 % 100).toLong,
      i.toLong)).toDF("key", "v", "id").repartition(7)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("key").orderBy(col("v").asc, col("id").asc)
    def shortlist() = df.withColumn("_rn", row_number().over(w))
      .where(col("_rn") <= 2).drop("_rn")
    val before = shortlist().queryExecution.executedPlan.toString
    assert(!before.contains("TopKPerKey"), before) // default: off
    val expect = shortlist().as[(String, Long, Long)].collect().toSet
    spark.conf.set("spark.graft.topkRewrite.enabled", "true")
    try {
      val rewritten = shortlist()
      val plan = rewritten.queryExecution.executedPlan.toString
      assert(plan.contains("TopKPerKey"), plan)
      assert(!plan.toLowerCase.contains("window"), plan)
      assert(rewritten.as[(String, Long, Long)].collect().toSet === expect)
    } finally spark.conf.unset("spark.graft.topkRewrite.enabled")
  }

  test("opt-in rule also matches the commuted comparison (k >= rn)") {
    import spark.implicits._
    val df = (1 to 500).map(i => (s"k${i % 10}", (i * 13 % 97).toLong,
      i.toLong)).toDF("key", "v", "id").repartition(3)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("key").orderBy(col("v").asc, col("id").asc)
    // literal on the LEFT: `2 >= _rn` — same shortlist, commuted shape
    def shortlist() = df.withColumn("_rn", row_number().over(w))
      .where(lit(2) >= col("_rn")).drop("_rn")
    val expect = shortlist().as[(String, Long, Long)].collect().toSet
    spark.conf.set("spark.graft.topkRewrite.enabled", "true")
    try {
      val rewritten = shortlist()
      val plan = rewritten.queryExecution.executedPlan.toString
      assert(plan.contains("TopKPerKey"), plan)
      assert(rewritten.as[(String, Long, Long)].collect().toSet === expect)
    } finally spark.conf.unset("spark.graft.topkRewrite.enabled")
  }

  test("map-typed grouping keys are rejected loudly (binary != semantic equality)") {
    import spark.implicits._
    val df = Seq((Map("a" -> 1), 1L), (Map("a" -> 1), 2L))
      .toDF("key", "id")
    val e = intercept[IllegalArgumentException] {
      topKPerKey(df, Seq("key"), Seq(("id", true)), 1)
    }
    assert(e.getMessage.contains("grouping key"), e.getMessage)
  }

  test("floating-point keys: 0.0/-0.0 and NaN bit patterns form ONE group, like windows") {
    import spark.implicits._
    val nanA = java.lang.Double.longBitsToDouble(0x7ff8000000000001L)
    val rows = Seq((0.0, 1L), (-0.0, 2L), (Double.NaN, 3L), (nanA, 4L),
      (1.5, 5L), (0.0, 6L), (Double.NaN, 7L))
    val df = rows.toDF("key", "id").repartition(5)
    val got = topKPerKey(df, Seq("key"), Seq(("id", true)), k = 1)
      .select("id").as[Long].collect().toSet
    // three logical keys (0.0 group, NaN group, 1.5) -> exactly three
    // survivors, the min id of each group — byte-wise grouping without
    // normalization would emit up to five
    assert(got === Set(1L, 3L, 5L))
  }

  test("unknown column fails loudly; k >= 1 enforced") {
    import spark.implicits._
    val df = Seq(("a", 1L)).toDF("key", "v")
    intercept[IllegalArgumentException] {
      topKPerKey(df, Seq("nope"), Seq(("v", true)), 1)
    }
    intercept[IllegalArgumentException] {
      topKPerKey(df, Seq("key"), Seq(("v", true)), 0)
    }
  }
}
