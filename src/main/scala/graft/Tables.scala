package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Test-table loader over the driver's parquet star schema (TESTDATA.md). */
object Tables {
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** `events.ts` normalization — the generated parquet has shipped two
    * encodings across driver rounds, both loaded to the SAME session-tz
    * (UTC) instant type so every downstream `unix_micros`/window query
    * sees one shape:
    *  - TIMESTAMP(NANOS): not natively read by Spark 4 — sessions set
    *    `spark.sql.legacy.parquet.nanosAsLong=true` (see
    *    [[Sessions.builder]]) so it arrives as a long; converted back
    *    with integral division (ns epoch values exceed 2^53, a double
    *    division would corrupt low bits).
    *  - TIMESTAMP(MICROS, isAdjustedToUTC=false): arrives as
    *    TIMESTAMP_NTZ; cast to TIMESTAMP — an identity re-tag under the
    *    UTC session timezone, matching DuckDB's naive reading. */
  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType.typeName == "long")
      df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else if (name == "events" &&
        df.schema("ts").dataType.typeName == "timestamp_ntz")
      df.withColumn("ts", col("ts").cast("timestamp"))
    else df
  }
}
