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

  test("xlsx first sheet resolves via workbook.xml/rels, not the part name") {
    // sheet part is named sheet99.xml; only the workbook+rels route finds it
    val buf = new java.io.ByteArrayOutputStream
    val z = new java.util.zip.ZipOutputStream(buf)
    def entry(name: String, body: String): Unit = {
      z.putNextEntry(new java.util.zip.ZipEntry(name))
      z.write(body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      z.closeEntry()
    }
    entry("xl/workbook.xml",
      """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"
        | xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
        |<sheets><sheet name="Data" sheetId="1" r:id="rId7"/></sheets></workbook>""".stripMargin)
    entry("xl/_rels/workbook.xml.rels",
      """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId7" Type="t" Target="worksheets/sheet99.xml"/></Relationships>""".stripMargin)
    entry("xl/worksheets/sheet99.xml",
      """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
        |<sheetData><row r="1"><c r="A1" t="inlineStr"><is><t>hello</t></is></c>
        |<c r="B1"><v>42</v></c></row></sheetData></worksheet>""".stripMargin)
    z.close()
    val grid = Xlsx.grid(buf.toByteArray)
    assert(grid === Seq((0L, IndexedSeq("hello", "42"))))
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

  test("readAll over many files is ONE distributed scan, no per-file plans") {
    import org.apache.spark.sql.execution.ExplainMode
    val dir = java.nio.file.Files.createTempDirectory("manymanifests")
    val src = new java.io.File("src/test/resources/manifests")
    for (f <- src.listFiles(); i <- 1 to 3)
      java.nio.file.Files.copy(f.toPath,
        dir.resolve(s"copy${i}_${f.getName}"))
    val all = CsvManifests.readAll(spark, dir.toString)
    val plan = all.queryExecution.explainString(ExplainMode.fromString("formatted"))
    val scans = plan.linesIterator.count(_.trim.startsWith("Location: InMemoryFileIndex"))
    assert(scans === 1, s"expected exactly 1 scan for 12 files, got $scans:\n$plan")
    assert(all.count() === 36L) // 12 files x 3 rows
    assert(all.select("data_source_file").distinct().count() === 12L)
  }

  test("readAll skips neither-format files; rejects() surfaces them") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("mixedmanifests")
    java.nio.file.Files.copy(
      new java.io.File(fixture("old_format.csv")).toPath,
      dir.resolve("good.csv"))
    java.nio.file.Files.writeString(dir.resolve("weird.csv"),
      "just,three,cols\nno,header,here\n")
    val all = CsvManifests.readAll(spark, dir.toString)
    assert(all.count() === 3L) // only the good file's rows
    val rej = CsvManifests.rejects(spark, dir.toString)
      .as[(String, String)].collect()
    assert(rej.length === 1)
    assert(rej.head._1 === "weird.csv" && rej.head._2.contains("neither"))
  }

  test(".xls BIFF8 manifests match their .csv twins row-for-row (both CFB layouts)") {
    // old_format: small stream -> CFB mini-stream path
    // new_format: padded stream -> regular FAT path
    for ((base, pad) <- Seq("old_format" -> false, "new_format" -> true)) {
      val csvPath = fixture(s"$base.csv")
      val grid = CsvManifests.gridOf(s"$base.csv",
        java.nio.file.Files.readAllBytes(new java.io.File(csvPath).toPath))
      val dir = java.nio.file.Files.createTempDirectory(s"xls_$base")
      val xls = dir.resolve(s"$base.xls") // same stem -> same MAWB fallback
      BiffFixture.write(xls, grid, pad)
      val fromCsv = CsvManifests.readManifest(spark, csvPath)
        .drop("data_source_file").orderBy("hawb_no", "item_no").collect()
      val fromXls = CsvManifests.readManifest(spark, xls.toString)
        .drop("data_source_file").orderBy("hawb_no", "item_no").collect()
      assert(fromXls === fromCsv, s"$base: .xls rows diverge from .csv twin")
    }
  }

  test("corrupt binary files are isolated as rejects, never task failures") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("corruptmanifests")
    java.nio.file.Files.copy(
      new java.io.File(fixture("old_format.csv")).toPath,
      dir.resolve("good.csv"))
    // garbage bytes under both binary extensions
    java.nio.file.Files.write(dir.resolve("junk.xls"),
      Array.tabulate[Byte](600)(i => (i * 7).toByte))
    java.nio.file.Files.write(dir.resolve("junk.xlsx"),
      "this is not a zip archive".getBytes)
    val all = CsvManifests.readAll(spark, dir.toString)
    assert(all.count() === 3L) // only the good file
    val rej = CsvManifests.rejects(spark, dir.toString)
      .as[(String, String)].collect().sortBy(_._1)
    assert(rej.map(_._1).toSeq === Seq("junk.xls", "junk.xlsx"))
    assert(rej.exists(_._2.contains("unreadable")))
  }

  test("readAll on a directory with no manifest files fails loudly") {
    val empty = java.nio.file.Files.createTempDirectory("nomanifests")
    java.nio.file.Files.writeString(empty.resolve("readme.txt"), "nothing here")
    val e = intercept[IllegalArgumentException] {
      CsvManifests.readAll(spark, empty.toString)
    }
    assert(e.getMessage.contains("no .csv/.xls/.xlsx manifests"))
  }

  test("csv line splitter handles quotes and escaped quotes") {
    assert(CsvManifests.splitCsvLine("""a,"b,c",d""") === Seq("a", "b,c", "d"))
    assert(CsvManifests.splitCsvLine("a,\"say \"\"hi\"\"\",c") ===
      Seq("a", "say \"hi\"", "c"))
    assert(CsvManifests.splitCsvLine("a,,c") === Seq("a", "", "c"))
  }

  test("csv scanner: embedded newlines in quoted fields stay one record (RFC 4180)") {
    // record framing: quoted \n and \r\n are field content, not separators
    assert(CsvManifests.csvRecords("a,\"line1\nline2\",c\r\nd,e,f") === Seq(
      (0L, IndexedSeq("a", "line1\nline2", "c")),
      (1L, IndexedSeq("d", "e", "f"))))
    // empty physical lines are skipped but keep their record ordinal
    assert(CsvManifests.csvRecords("a,b\n\nc,d") === Seq(
      (0L, IndexedSeq("a", "b")), (2L, IndexedSeq("c", "d"))))
    // trailing record without a final newline; escaped quotes across a break
    assert(CsvManifests.csvRecords("\"say \"\"hi\"\"\nbye\",x") === Seq(
      (0L, IndexedSeq("say \"hi\"\nbye", "x"))))
    // CRLF inside quotes is preserved verbatim
    assert(CsvManifests.csvRecords("\"a\r\nb\",c\n") === Seq(
      (0L, IndexedSeq("a\r\nb", "c"))))
  }

  test("manifest with a line break inside a quoted description parses as one row") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("multiline")
    val csv = dir.resolve("MULTI123.csv")
    java.nio.file.Files.writeString(csv,
      "MULTI123,,,,,,,,,,,,,,\n" +
        "junk,,,,,,,,,,,,,,\n" +
        "A,B,C,DESC,E,F,G,H,I,QTY,UNIT,L,M,PRICE,TOTAL\n" +
        "HAWB900,,,\"Toy,\nred line 2\",,,,,,3,PCE,,,1.5,4.5\n" +
        "HAWB901,,,Plain,,,,,,1,PCE,,,2.0,2.0\n")
    val df = CsvManifests.readManifest(spark, csv.toString).cache()
    assert(df.count() === 2L) // the pandas-parity check: NOT three mangled rows
    val multi = df.where($"hawb_no" === "HAWB900")
      .select("description_original", "qty").as[(String, Double)].collect()
    assert(multi === Array(("Toy,\nred line 2", 3.0)))
  }
}
