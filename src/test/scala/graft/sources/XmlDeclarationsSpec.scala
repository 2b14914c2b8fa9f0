package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Golden-count e2e tests for the zip/XML declaration reader against the
  * reference's real production inputs; expected row counts come from the
  * reference's own run logs (`import_xml.log:30264-30281`). */
class XmlDeclarationsSpec extends SparkSpec {

  private val processedDir = "/root/reference/uploads/xml_history/processed"

  private lazy val processed =
    XmlDeclarations.read(spark, processedDir).cache()

  test("golden row counts per production zip (import_xml.log)") {
    val counts = processed
      .withColumn("zip", split(col("data_source_file"), "::").getItem(0))
      .groupBy("zip").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("25040104EX.zip") === 8072L)
    assert(counts("IPC250403408EX.zip") === 2306L)
    assert(counts("IPC250403409EX.zip") === 3032L)
    assert(counts("IPC250403407EX.zip") === 2649L)
  }

  test("item_sequence is a 1-based dense per-(file, hawb) sequence") {
    import spark.implicits._
    val bad = processed
      .groupBy("data_source_file", "hawb_no")
      .agg(count(lit(1)).as("n"), min("item_sequence").as("lo"),
        max("item_sequence").as("hi"))
      .where($"lo" =!= 1 || $"hi" =!= $"n")
      .count()
    assert(bad === 0L)
  }

  test("extended BID_HEAD fields: typed golden values from a production member") {
    import spark.implicits._
    val got = processed.where(
      $"data_source_file" === "IPC250403407EX.zip::KEVIN_1767768378072.xml" &&
        $"hawb_no" === "HY01117453" && $"item_sequence" === 1)
      .select($"auto_seq", $"seq_no", $"dcl_doc_type", $"dcl_doc_no_5",
        date_format($"dcl_date", "yyyy-MM-dd"),
        date_format($"doc_date", "yyyy-MM-dd"),
        $"tax_amt1", $"tax_amt3", $"tax_amt4", $"tot_tax_amt", $"tax_base",
        $"currency", $"ex_rate", $"hawb_ex_rate", $"broker_box_no")
      .as[(Long, Double, String, String, String, String, Double, Double,
        Double, Double, Double, String, Option[Double], Double, String)]
      .collect()
    assert(got === Array((6552014L, 1.0, "X3", "FYR3P", "2025-04-03",
      "2025-04-03", 61.0, 0.0 /* absent -> F6 zero */, 124.0, 185.0, 2485.0,
      "TWD", None /* absent rate -> null, never 0 */, 1.0, "472")))
    // corpus-level: the tax fields are really populated, not all-default
    assert(processed.where($"tot_tax_amt" > 0).count() > 0L)
    assert(processed.where($"auto_seq".isNull).count() === 0L)
  }

  test("DataSourceV2 customs-xml: format/SQL surfaces match the flatMap reader, prune columns") {
    import spark.implicits._
    import org.apache.spark.sql.execution.ExplainMode
    val raw = XmlDeclarations.readRaw(spark, processedDir).toDF().cache()
    val viaV2 = spark.read.format("customs-xml").load(processedDir)
    assert(viaV2.schema === XmlDeclarationsSource.rawSchema)
    assert(viaV2.count() === raw.count())
    // same rows, not just same count
    assert(viaV2.except(raw).count() === 0L)
    assert(raw.except(viaV2).count() === 0L)
    // cleanse composes on top -> the typed table
    assert(XmlDeclarations.cleanse(viaV2).count() === processed.count())
    // required-column pushdown reaches the scan: the BatchScan leaf emits
    // ONLY the selected column (DSv2 explain has no ReadSchema line)
    val leaf = viaV2.select("hawb_no").queryExecution.executedPlan
      .collectLeaves().head
    assert(leaf.schema.fieldNames.toSeq === Seq("hawb_no"),
      leaf.schema.treeString)
    // pure-SQL surface via the registered short name
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW decl_v2 " +
      s"USING `customs-xml` OPTIONS (path '$processedDir')")
    assert(spark.sql("SELECT count(*) FROM decl_v2").as[Long].head()
      === raw.count())
  }

  test("DSv2 packs many small files into bounded size-weighted partitions, listing recursively") {
    val src = new java.io.File("src/test/resources/xml/standalone.xml").toPath
    val dir = java.nio.file.Files.createTempDirectory("manyxml")
    val sub = java.nio.file.Files.createDirectory(dir.resolve("nested"))
    for (i <- 1 to 15) java.nio.file.Files.copy(src, dir.resolve(s"a$i.xml"))
    for (i <- 1 to 5) java.nio.file.Files.copy(src, sub.resolve(s"b$i.xml"))
    val perFile = spark.read.format("customs-xml").load(src.toString).count()
    val df = spark.read.format("customs-xml").load(dir.toString)
    assert(df.count() === 20 * perFile) // nested subdirectory files included
    // 20 x (966 B + 4 MB open cost) ~ 80 MB < the 128 MB target -> ONE
    // packed task, not twenty single-file tasks
    assert(df.rdd.getNumPartitions === 1)
  }

  test("cleansing: doc numbers have no spaces/slashes, dates are truncated") {
    import spark.implicits._
    assert(processed.where($"dcl_doc_no".rlike("[ \n/]")).count() === 0L)
    // IMPORT_DATE like 2025-03-22T00:00:00+08:00 -> DATE 2025-03-22
    assert(processed.where($"import_date".isNull).count() === 0L)
    val d = processed.select(date_format($"import_date", "yyyy-MM-dd"))
      .first().getString(0)
    assert(d.matches("""\d{4}-\d{2}-\d{2}"""))
  }

  test("unit price is round(item_total/qty, 4) guarded by qty > 0") {
    import spark.implicits._
    val bad = processed
      .where($"qty" > 0 &&
        abs($"unit_price_calculated" - bround($"item_total_amount" / $"qty", 4))
          > 1e-9)
      .count()
    assert(bad === 0L)
    val zeroQty = processed.where($"qty" <= 0 && $"unit_price_calculated" =!= 0.0)
    assert(zeroQty.count() === 0L)
  }

  test("standalone (non-zip) xml: blank-HAWB drop, coercions, per-hawb sequence") {
    import spark.implicits._
    val dir = new java.io.File("src/test/resources/xml").getAbsolutePath
    val rows = XmlDeclarations.read(spark, dir)
      .orderBy("hawb_no", "item_sequence")
      .select("data_source_file", "hawb_no", "item_sequence", "dcl_doc_no",
        "qty", "unit_price_calculated")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getString(3),
        r.getDouble(4), r.getDouble(5)))
    assert(rows === Array(
      // blank-HAWB row dropped; HB001 sequences 1,2 in document order
      ("standalone.xml", "HB001", 1, "BY14001TEST1", 2.0, 50.0),
      ("standalone.xml", "HB001", 2, "BY2", 0.0, 0.0), // qty coerced to 0
      ("standalone.xml", "HB002", 1, "", 0.0, 0.0))) // qty=0 -> unit price 0
  }

  test("zip junk members are skipped, lineage is zip::member") {
    import spark.implicits._
    val srcs = processed.select("data_source_file").distinct()
    assert(srcs.where($"data_source_file".contains("__MACOSX")).count() === 0L)
    assert(srcs.where(!$"data_source_file".contains("::")).count() === 0L)
  }
}
