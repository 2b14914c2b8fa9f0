package graft
import org.apache.spark.sql.functions._
import graft.streaming.EventStreams
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.builder("8").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    // stage the real events table as a file-stream source dir
    val root = java.nio.file.Files.createTempDirectory("stream").toString
    val batch = Tables(spark, "/root/testdata/sf0.001", "events")
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
    batch.write.parquet(s"$root/in")
    val stream = spark.readStream.schema(batch.schema).parquet(s"$root/in")

    val q1 = EventStreams.hourlyCounts(stream)
      .writeStream.format("memory").queryName("hourly").outputMode("complete").start()
    q1.processAllAvailable(); q1.stop()
    val streamed = spark.table("hourly")
    val batchRes = EventStreams.hourlyCounts(batch)
    println(s"hourly: streamed=${streamed.count()} batch=${batchRes.count()} " +
      s"diff=${streamed.except(batchRes).count() + batchRes.except(streamed).count()}")
    streamed.orderBy("hour_start", "event_type").show(5)

    val q2 = EventStreams.sessionize(
        stream.as[EventStreams.Event], gapSec = 1800)
      .writeStream.format("memory").queryName("sessions").outputMode("append").start()
    q2.processAllAvailable(); q2.stop()
    val sess = spark.table("sessions")
    println(s"sessions closed: ${sess.count()} (single batch -> only watermark-closed)")
    sess.orderBy(desc("n_events")).show(5)
    spark.stop()
  }
}
