package graft.sources

import graft.{SparkSpec, SparkEntry, Tables}
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

/** Non-parquet scan paths: the format roundtrips must be lossless AND
  * keep the scan-side scale properties (pushdown, no inference pass). */
class FormatScanSpec extends SparkSpec {

  test("json roundtrip is lossless vs the parquet-side computation") {
    val viaJson = SparkEntry.queries("s_json_scan")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    val direct = Tables(spark, sfDir, "orders")
      .where(datediff(col("o_orderdate"), lit("1992-01-01"))
        .between(1000, 2000))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"),
        sum(round(col("o_totalprice") * 100, 0).cast("long")).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(viaJson.nonEmpty && viaJson.toSeq === direct.toSeq)
  }

  test("json read is schema-first (no inference job) and FAILFAST on drift") {
    import spark.implicits._
    val path = Formats.layoutFor(
      Seq((1L, "a"), (2L, "b")).toDF("k", "v"),
      "json", key = "drift-fixture")
    // contract schema reads clean
    val ok = Formats.readJson(spark, path, "k long, v string")
    assert(ok.schema.map(_.name) === Seq("k", "v")) // no inference pass ran
    assert(ok.count() === 2L)
    // a type-drifted contract fails loudly instead of nulling
    val bad = Formats.readJson(spark, path, "k timestamp, v long")
    intercept[Throwable] { bad.collect() }
  }

  test("csv roundtrip is lossless vs parquet and FAILFAST on drift") {
    val viaCsv = SparkEntry.queries("s_csv_scan")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    val direct = Tables(spark, sfDir, "customer")
      .where(round(col("c_acctbal") * 100, 0).cast("long") > 0)
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"),
        sum(round(col("c_acctbal") * 100, 0).cast("long")).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(viaCsv.nonEmpty && viaCsv.toSeq === direct.toSeq)
    // a drifted contract (string column read as long) fails loudly
    import spark.implicits._
    val path = Formats.layoutFor(
      Seq((1L, "a"), (2L, "b")).toDF("k", "v"),
      "csv", key = "csv-drift-fixture", options = Map("header" -> "true"))
    val bad = Formats.readCsv(spark, path, "k long, v long")
    intercept[Throwable] { bad.collect() }
  }

  test("avro roundtrip is lossless (nulls included) and FAILFAST on drift") {
    import spark.implicits._
    // nullable string + long columns round-trip, null stays null
    val df = Seq((1L, Some("a"), Some(10L)), (2L, None, Some(20L)),
      (3L, Some("c"), None)).toDF("k", "v", "n")
    val path = graft.TmpArtifacts.path("graft-formats", "avro-spec-fixture")
    Avro.writeAvro(df, path)
    val back = Avro.readAvro(spark, path, "k bigint, v string, n bigint")
      .collect().map(r => (r.getLong(0),
        Option(r.get(1)).map(_.toString), if (r.isNullAt(2)) None else Some(r.getLong(2))))
      .sortBy(_._1)
    assert(back.toSeq === Seq((1L, Some("a"), Some(10L)),
      (2L, None, Some(20L)), (3L, Some("c"), None)))
    // a type-drifted reader contract fails loudly at resolution, never
    // nulls: long column read as string
    val bad = Avro.readAvro(spark, path, "k string, v string, n bigint")
    intercept[Throwable] { bad.collect() }
  }

  test("avro roundtrip holds at the edges: extreme longs, NaN/Inf/-0.0, " +
    "unicode and empty strings, binary") {
    import spark.implicits._
    val df = Seq(
      (Long.MinValue, "", 0.0, Array[Byte]()),
      (Long.MaxValue, "héllо 世界", -0.0, Array[Byte](0, -1, 127)),
      (0L, "plain", Double.NaN, Array[Byte](42)),
      (-1L, "q\"uote\nline", Double.PositiveInfinity, Array[Byte](-128)))
      .toDF("k", "s", "d", "b")
    val path = graft.TmpArtifacts.path("graft-formats", "avro-edge-fixture")
    Avro.writeAvro(df, path)
    val back = Avro.readAvro(spark, path, "k bigint, s string, d double, b binary")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        r.getAs[Array[Byte]](3).toSeq)).sortBy(_._1)
    val want = df.collect().map(r => (r.getLong(0), r.getString(1),
      r.getDouble(2), r.getAs[Array[Byte]](3).toSeq)).sortBy(_._1)
    // NaN != NaN — compare bit patterns for the double column
    assert(back.length === want.length)
    back.zip(want).foreach { case ((k1, s1, d1, b1), (k2, s2, d2, b2)) =>
      assert(k1 === k2 && s1 === s2 && b1 === b2)
      assert(java.lang.Double.doubleToLongBits(d1) ===
        java.lang.Double.doubleToLongBits(d2), s"double bits for k=$k1")
    }
  }

  test("avro date/timestamp logical types round-trip to the microsecond") {
    import spark.implicits._
    val df = Seq(
      (1L, java.sql.Date.valueOf("1994-02-01"),
        java.sql.Timestamp.valueOf("1994-02-01 12:34:56.789123")),
      (2L, java.sql.Date.valueOf("1969-12-31"), // pre-epoch: floorDiv path
        java.sql.Timestamp.valueOf("1969-12-31 23:59:59.000001")))
      .toDF("k", "d", "ts")
    val path = graft.TmpArtifacts.path("graft-formats", "avro-dates-fixture")
    Avro.writeAvro(df, path)
    val back = Avro.readAvro(spark, path, "k bigint, d date, ts timestamp")
      .collect().map(r => (r.getLong(0), r.getDate(1).toString,
        r.getTimestamp(2).getTime, r.getTimestamp(2).getNanos))
      .sortBy(_._1)
    assert(back(0) === ((1L, "1994-02-01",
      java.sql.Timestamp.valueOf("1994-02-01 12:34:56.789123").getTime,
      789123000)))
    assert(back(1) === ((2L, "1969-12-31",
      java.sql.Timestamp.valueOf("1969-12-31 23:59:59.000001").getTime,
      1000)))
  }

  test("avro decimal round-trips exactly, negatives included") {
    import spark.implicits._
    val df = Seq("12345.67", "-0.01", "0.00", "-99999999.99")
      .zipWithIndex.map { case (v, i) => (i.toLong, BigDecimal(v)) }
      .toDF("k", "m").select(col("k"),
        col("m").cast("decimal(12,2)").as("m"))
    val path = graft.TmpArtifacts.path("graft-formats", "avro-decimal-fixture")
    Avro.writeAvro(df, path)
    val back = Avro.readAvro(spark, path, "k bigint, m decimal(12,2)")
      .collect().map(r => (r.getLong(0), r.getDecimal(1).toPlainString))
      .sortBy(_._1).toSeq
    assert(back === Seq((0L, "12345.67"), (1L, "-0.01"), (2L, "0.00"),
      (3L, "-99999999.99")))
  }

  test("avro registry scan matches the parquet-side computation") {
    val viaAvro = SparkEntry.queries("s_avro_scan")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    val direct = Tables(spark, sfDir, "part")
      .where(col("p_size").cast("long") > 25)
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n"),
        sum(round(col("p_retailprice") * 100, 0).cast("long")).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(viaAvro.nonEmpty && viaAvro.toSeq === direct.toSeq)
  }

  test("orc scan pushes the filter (PushedFilters) and matches parquet") {
    val df = SparkEntry.queries("s_orc_scan")(spark, sfDir)
    val plan = df.queryExecution.explainString(
      ExplainMode.fromString("formatted"))
    assert(plan.contains("PushedFilters:"), plan)
    assert(plan.contains("l_returnflag"), plan)
    val Array(row) = df.collect()
    val direct = Tables(spark, sfDir, "lineitem")
      .where(col("l_returnflag") === "R" && col("l_quantity") > 30)
      .agg(count(lit(1)),
        sum(round(col("l_extendedprice") * 100, 0).cast("long")))
      .collect()(0)
    assert(row.getLong(0) === direct.getLong(0))
    assert(row.getLong(1) === direct.getLong(1))
  }

  test("footer-stats aggregate is answered by PushedAggregation, exactly") {
    val df = SparkEntry.queries("s_agg_footer_stats")(spark, sfDir)
    val plan = df.queryExecution.explainString(
      ExplainMode.fromString("formatted"))
    assert(plan.contains("PushedAggregation"), plan)
    val Array(row) = df.collect()
    val direct = Tables(spark, sfDir, "lineitem")
      .agg(count(lit(1)), min("l_orderkey"), max("l_orderkey"),
        min("l_quantity"), max("l_quantity")).collect()(0)
    assert(row.getLong(0) === direct.getLong(0))
    assert(row.getLong(1) === direct.getLong(1))
    assert(row.getLong(2) === direct.getLong(2))
    assert(row.getLong(3) === direct.getDouble(3).toLong)
    assert(row.getLong(4) === direct.getDouble(4).toLong)
  }
}
