package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CsvManifestsSpec extends SparkSpec {

  private def fixture(name: String): String =
    new java.io.File(s"src/test/resources/manifests/$name").getAbsolutePath

  test("old format: named columns, header offset 3, ffill, filename-stem MAWB") {
    import spark.implicits._
    val df = CsvManifests.readManifest(spark, fixture("old_format.csv")).cache()
    assert(df.count() === 3L)
    // A1 is '主提單號碼:' (fails the alnum gate) -> MAWB from filename stem
    assert(df.select("mawb_no").distinct().as[String].collect() ===
      Array("old_format"))
    // merged-cell ffill: the blank second row inherits HAWB001
    val byItem = df.orderBy("hawb_no", "item_no")
      .select("hawb_no", "item_no", "description_original", "qty")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getDouble(3)))
    assert(byItem === Array(
      ("HAWB001", 1, "USB风扇", 10.0),
      ("HAWB001", 2, "手機殼", 20.0),
      ("HAWB002", 1, "紙袋", 5.0)))
    assert(df.where($"currency" =!= "TWD" || $"processing_status" =!= "PENDING")
      .count() === 0L)
  }

  test("new format: positional columns, header offset 2, cumcount item_no, A1 MAWB") {
    import spark.implicits._
    val df = CsvManifests.readManifest(spark, fixture("new_format.csv")).cache()
    assert(df.count() === 3L)
    assert(df.select("mawb_no").distinct().as[String].collect() ===
      Array("IPC250403408EX"))
    val rows = df.orderBy("hawb_no", "item_no")
      .select("hawb_no", "item_no", "description_original", "qty", "unit_price",
        "total_amount")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(rows === Array(
      ("HAWB100", 1, "Toy, red", 3.0, 1.5, 4.5), // quoted comma survives
      ("HAWB100", 2, "Pen", 2.0, 1.0, 2.0), // blank hawb ffilled, cumcount 2
      ("HAWB200", 1, "Bag", 1.0, 9.9, 9.9)))
  }

  test("xlsx old format: shared strings, Chinese headers, merged-cell ffill") {
    import spark.implicits._
    val df = CsvManifests.readManifest(spark, fixture("old_format.xlsx")).cache()
    assert(df.select("mawb_no").distinct().as[String].collect() ===
      Array("old_format")) // A1 fails alnum gate -> filename stem
    val rows = df.orderBy("hawb_no", "item_no")
      .select("hawb_no", "item_no", "description_original", "qty")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getDouble(3)))
    assert(rows === Array(
      ("XHAWB01", 1, "USB风扇", 10.0),
      ("XHAWB01", 2, "手機殼", 20.0), // blank merged cell ffilled
      ("XHAWB02", 1, "紙袋", 5.0)))
  }

  test("xlsx new format: inline strings, positional columns, cumcount") {
    import spark.implicits._
    val df = CsvManifests.readManifest(spark, fixture("new_format.xlsx")).cache()
    assert(df.select("mawb_no").distinct().as[String].collect() ===
      Array("XLSX250403408EX")) // valid A1 MAWB
    val rows = df.orderBy("hawb_no", "item_no")
      .select("hawb_no", "item_no", "description_original", "qty", "unit_price")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2),
        r.getDouble(3), r.getDouble(4)))
    assert(rows === Array(
      ("XHAWB100", 1, "Toy, red", 3.0, 1.5),
      ("XHAWB100", 2, "Pen", 2.0, 1.0),
      ("XHAWB200", 1, "Bag", 1.0, 9.9)))
  }

  test("xlsx cell reference parsing") {
    assert(Xlsx.colIndex("A1") === 0)
    assert(Xlsx.colIndex("O3") === 14)
    assert(Xlsx.colIndex("AA10") === 26)
    assert(Xlsx.colIndex("BC7") === 54)
  }

  test("readAll unions csv and xlsx, both formats") {
    val dir = new java.io.File("src/test/resources/manifests").getAbsolutePath
    val all = CsvManifests.readAll(spark, dir)
    assert(all.count() === 12L) // 4 files x 3 rows
    assert(all.columns.length === 15)
    assert(all.select("data_source_file").distinct().count() === 4L)
  }

  test("neither-format file is rejected with a diagnostic (P7 dispatch)") {
    val bad = java.nio.file.Files.createTempDirectory("badmanifest")
      .resolve("weird.csv")
    java.nio.file.Files.writeString(bad, "just,three,cols\nno,header,here\n")
    val e = intercept[IllegalArgumentException] {
      CsvManifests.readManifest(spark, bad.toString)
    }
    assert(e.getMessage.contains("weird.csv"))
    assert(e.getMessage.contains("neither"))
  }

  test("csv line splitter handles quotes and escaped quotes") {
    assert(CsvManifests.splitCsvLine("""a,"b,c",d""") === Seq("a", "b,c", "d"))
    assert(CsvManifests.splitCsvLine("a,\"say \"\"hi\"\"\",c") ===
      Seq("a", "say \"hi\"", "c"))
    assert(CsvManifests.splitCsvLine("a,,c") === Seq("a", "", "c"))
  }
}
