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
  /** Timestamp-carrying columns per table: the set the encoding
    * normalization below defends. The date columns currently arrive as
    * TIMESTAMP(MICROS) NTZ and are consumed via date functions (NTZ is
    * fine there — left untouched); the nanos→long defense covers a
    * future regeneration flipping them to TIMESTAMP(NANOS), which would
    * otherwise surface as a long column and fail every date function. */
  private val tsCols: Map[String, Seq[String]] = Map(
    "events" -> Seq("ts"),
    "lineitem" -> Seq("l_shipdate"),
    "orders" -> Seq("o_orderdate"))

  /** Per-(session, path) memo of the ANALYZED base-table DataFrame — the
    * catalog-metadata reuse a real deployment gets from its metastore
    * (guide §6: file-listing caches). `spark.read.parquet` on a bare path
    * re-lists the directory and re-reads footers for schema inference on
    * EVERY call; the bench resolves these ten static tables thousands of
    * times per run, all pure metadata overhead. The memo holds a LAZY
    * plan handle only — no rows are cached; every query still scans the
    * parquet (the no-result-caching bench contract). Keyed by directory
    * so distinct scale factors never collide; dead sessions evicted by
    * [[SessionMemo]]. */
  private val relations = new SessionMemo[String, DataFrame]()

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    relations.getOrCompute(spark, s"$sfDir/$name") {
      val df = spark.read.parquet(s"$sfDir/$name.parquet")
      tsCols.getOrElse(name, Nil).foldLeft(df) { (d, c) =>
        d.schema(c).dataType.typeName match {
          case "long" => // TIMESTAMP(NANOS) read via nanosAsLong
            d.withColumn(c, expr(s"timestamp_micros($c div 1000)"))
          case "timestamp_ntz" if c == "ts" => // instant-typed consumers
            d.withColumn(c, col(c).cast("timestamp"))
          case _ => d
        }
      }
    }
}
