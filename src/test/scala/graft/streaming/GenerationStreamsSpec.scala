package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.sources.Generations

class GenerationStreamsSpec extends SparkSpec {

  test("folded generations equal the one-shot batch aggregate; a " +
    "replayed batch id is a no-op; EVERY generation's tables reconcile " +
    "cross-table (never a mixed fold)") {
    import spark.implicits._
    val o = Tables(spark, sfDir, "orders")
      .select(col("o_orderstatus").as("st"),
        (col("o_orderkey") % 97).cast("long").as("v"),
        col("o_orderkey"))
      .cache()
    val tmp = Files.createTempDirectory("gen-stream").toString
    val root = s"$tmp/gens"
    val parts = (0 until 3).map(i =>
      o.where(col("o_orderkey") % 3 === i).drop("o_orderkey"))
    parts.zipWithIndex.foreach { case (b, i) =>
      GenerationStreams.applyGenerationBatch(b, i.toLong, root, "st", "v")
    }
    // one generation per applied batch, meta carries the last batch id
    assert(Generations.currentVersion(spark, root) === Some(3L))
    assert(Generations.readTableAt(spark, root, 3L, "meta")
      .as[Long].head() === 2L)
    // final by_group == the one-shot whole-input aggregate
    val streamed = Generations.readTableAt(spark, root, 3L, "by_group")
      .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    val whole = o.drop("o_orderkey").groupBy(col("st").as("g"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
      .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(streamed === whole)
    // REPLAY batch 1: the meta watermark makes it a no-op (the fold is
    // a sum — without the marker this would double-count batch 1)
    GenerationStreams.applyGenerationBatch(parts(1), 1L, root, "st", "v")
    assert(Generations.currentVersion(spark, root) === Some(3L))
    // cross-table consistency at EVERY generation: totals must derive
    // from by_group of the SAME generation — the guarantee the atomic
    // set publish exists for
    for (v <- 1L to 3L) {
      val bg = Generations.readTableAt(spark, root, v, "by_group")
        .agg(count(lit(1)), sum(col("n")), sum(col("s")))
        .as[(Long, Long, Long)].head()
      val tot = Generations.readTableAt(spark, root, v, "totals")
        .as[(Long, Long, Long)].head()
      assert(bg === tot, s"generation $v tables disagree")
    }
    // the generations really are cumulative prefixes of the feed
    assert(Generations.readTableAt(spark, root, 1L, "totals")
      .select(col("n_rows")).as[Long].head() === parts(0).count())
    assert(Generations.readTableAt(spark, root, 2L, "totals")
      .select(col("n_rows")).as[Long].head()
      === parts(0).count() + parts(1).count())
  }

  test("generationIngest drives the same body through a real stream " +
    "(AvailableNow, one file per trigger)") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("gen-ingest").toString
    val srcDir = s"$tmp/src"
    val feed = Seq(("a", 1L), ("b", 2L), ("a", 3L), ("c", 4L))
      .toDF("g", "v")
    feed.where(col("v") <= 2).coalesce(1)
      .write.mode("append").parquet(srcDir)
    feed.where(col("v") > 2).coalesce(1)
      .write.mode("append").parquet(srcDir)
    val src = spark.readStream.schema(feed.schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
    val q = GenerationStreams.generationIngest(src, s"$tmp/gens",
      s"$tmp/ckpt", "g", "v")
    q.awaitTermination()
    val got = Generations.readTable(spark, s"$tmp/gens", "by_group")
      .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got === Seq(("a", 2L, 4L), ("b", 1L, 2L), ("c", 1L, 4L)))
  }
}
