package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Test-table loader over the driver's parquet star schema (TESTDATA.md). */
object Tables {
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** `events.ts` is written as parquet TIMESTAMP(NANOS), which Spark 4 does
    * not read natively — sessions set
    * `spark.sql.legacy.parquet.nanosAsLong=true` (see [[Sessions.builder]])
    * so it arrives as a long, and this loader converts it back to a
    * microsecond timestamp with integral division (ns epoch values exceed
    * 2^53, so a double division would corrupt low bits). */
  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType.typeName == "long")
      df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else df
  }
}
