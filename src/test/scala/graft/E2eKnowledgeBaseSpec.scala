package graft

import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions._
import graft.operators.{GroupedMode, LinkAlign}
import graft.sources.XmlDeclarations

/** End-to-end golden for the WHOLE reference pipeline in one run: real
  * production-zip XML ingestion (E1) → link-key hygiene → count-gated
  * ordinal alignment → majority vote (E3), asserted against an
  * independently-computed expectation in plain Scala (not against the
  * operators under test). Manifest twins are derived from the ingested
  * declarations (informal desc = "商品" + official desc) so ground truth is
  * known for every bill; one bill is sabotaged with an extra manifest row
  * to prove the reference's count-equality gate (`batch_train.py:98-99`)
  * drops it end-to-end. */
class E2eKnowledgeBaseSpec extends SparkSpec {

  test("zip ingestion -> align -> vote reproduces the KB computed directly") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("kb_e2e")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(
        "/root/reference/uploads/xml_history/processed/IPC250403407EX.zip"),
      dir.resolve("IPC250403407EX.zip"))

    // E1: ingest the real zip (2,649 rows — golden from import_xml.log)
    val decls = XmlDeclarations.read(spark, dir.toString)
      .withColumn("link_key", linkKey($"mawb_no", $"hawb_no"))
      .select("link_key", "data_source_file", "item_sequence",
        "description_official", "ccc_code")
      .cache()
    assert(decls.count() === 2649L)

    // manifest twins: one line per declaration line, same bill order,
    // informal description derived from the official one
    val twins = decls.select(
      $"link_key",
      row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy("link_key")
        .orderBy("data_source_file", "item_sequence")).as("item_no"),
      concat(lit("商品"), $"description_official").as("description_original"))
    // sabotage one bill: an extra manifest line breaks its count match
    val badKey = decls.select("link_key").orderBy("link_key").first().getString(0)
    val sabotaged = twins.unionByName(
      Seq((badKey, 9999, "走私品不得出現")).toDF(
        "link_key", "item_no", "description_original"))

    // E3: count-gated ordinal alignment + majority vote
    val aligned = LinkAlign.alignByOrdinal(
      sabotaged,
      decls,
      "link_key",
      orderA = Seq(col("item_no")),
      orderB = Seq(col("data_source_file"), col("item_sequence"))).cache()
    val nBad = decls.where($"link_key" === badKey).count()
    assert(aligned.count() === 2649L - nBad) // gate dropped the whole bill
    assert(aligned.where($"description_original" === "走私品不得出現")
      .count() === 0L)

    val kb = GroupedMode.modeBy(
      aligned.select(
        normalizeText($"description_original").as("original_description"),
        $"description_official", $"ccc_code"),
      Seq("original_description"),
      Seq("description_official", "ccc_code"))
      .as[(String, String, String, Long)].collect().toSet

    // independent expectation, plain Scala over the good bills: same votes,
    // same deterministic tie-break (freq desc, then value asc)
    val goodRows = decls.where($"link_key" =!= badKey)
      .select(normalizeText(concat(lit("商品"), $"description_official"))
        .as("k"), $"description_official", $"ccc_code")
      .as[(String, String, String)].collect()
    val expected = goodRows.groupBy(identity).view.mapValues(_.length.toLong)
      .toSeq.map { case ((k, off, ccc), n) => (k, off, ccc, n) }
      .groupBy(_._1).map { case (_, cands) =>
        cands.minBy { case (_, off, ccc, n) => (-n, off, ccc) }
      }.toSet
    assert(kb === expected)

    // the training.log:21 shape on a known declaration: informal 商品家具零件
    // maps to (家具零件, 9403.99.00.00-7)
    val furniture = kb.find(_._1 === "商品家具零件")
    assert(furniture.exists(r => r._2 === "家具零件" &&
      r._3 === "9403.99.00.00-7" && r._4 > 0))
  }

  test("decimal-money ledger chain (q1_pricing_decimal_ledger): per-line " +
    "HALF_UP at the money scale, hand-computed; the float shadow measures " +
    "the drift float money incurs") {
    import spark.implicits._
    // Line 1 exercises INTERMEDIATE ledger rounding: 12.3456*(1-0.05) =
    // 11.72832 -> HALF_UP@4 = 11.7283 (the .2 fraction drops), then
    // *1.10 = 12.90113 -> 12.9011; the float chain never rounds the
    // intermediate (11.728319..*1.1 = 12.9011519..) and lands at 12.9012
    // — one drift unit HIGH. Line 2 exercises the EXACT .5 half:
    // 100.0001*(1+0.5) = 150.00015 -> HALF_UP rounds UP to 150.0002;
    // the float shadow agrees there.
    val li = Seq(
      ("A", "F", 12.3456, 0.05, 0.10),
      ("A", "F", 100.0001, 0.00, 0.50)
    ).toDF("l_returnflag", "l_linestatus", "l_extendedprice",
      "l_discount", "l_tax")
      // Tables' lineitem loader normalizes l_shipdate — give it one
      .withColumn("l_shipdate",
        lit(java.sql.Timestamp.valueOf("1995-01-01 00:00:00")))
    val dir = java.nio.file.Files
      .createTempDirectory("graft-money").toString
    li.write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = SparkEntry.queries("q1_pricing_decimal_ledger")(spark, dir)
      .as[(String, String, Long, Long, Long, Long, Long, Long)]
      .collect()
    assert(out.length === 1)
    val (_, _, base, disc, charge, chargeF, n, drift) = out.head
    assert(n === 2L)
    assert(base === 123456L + 1000001L)
    assert(disc === 117283L + 1000001L)
    assert(charge === 129011L + 1500002L, // .5 half rounds UP on line 2
      s"decimal ledger charge: $charge")
    // the float shadow lands one e4-unit HIGH on the intermediate-
    // rounding line — this delta, summed per group, is the registry
    // row's float_drift_e4 (measured −2067 e4-units over the 600k-line
    // sf0.1 corpus)
    assert(drift === chargeF - charge)
    assert(drift === 1L,
      s"float money must drift exactly the intermediate-rounding line: $drift")
  }
}
