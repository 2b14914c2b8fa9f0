package graft.sources

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property roundtrip for the OOXML/.xlsx reader: random grids written as
  * a minimal spreadsheet zip (workbook + rels pointing at a NON-sheet1
  * part name, shared or inline strings, numeric cells) must read back
  * cell-for-cell. Pure JVM — no Spark session. */
class XlsxRoundtripSpec extends AnyFunSuite {

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  private val cell: Gen[String] = Gen.frequency(
    3 -> Gen.alphaNumStr.map(_.take(12)),
    2 -> Gen.listOfN(4, Gen.oneOf("風", "扇", "貨", "物", "數", "量"))
      .map(_.mkString),
    2 -> Gen.chooseNum(-500000, 500000).map(_.toString),
    1 -> Gen.oneOf("a<b", "c&d", "e>f", "\"q\""), // XML-escaping cases
    2 -> Gen.const(""))

  private val grid: Gen[Seq[(Long, Seq[String])]] =
    Gen.chooseNum(1, 25).flatMap { rows =>
      Gen.sequence[Seq[(Long, Seq[String])], (Long, Seq[String])](
        (0 until rows).map { r =>
          Gen.chooseNum(1, 8).flatMap(cols =>
            Gen.listOfN(cols, cell).map(cs => (r.toLong, cs: Seq[String])))
        })
    }

  private def colRef(c: Int): String = {
    var n = c + 1
    val sb = new StringBuilder
    while (n > 0) { sb.insert(0, ('A' + (n - 1) % 26).toChar); n = (n - 1) / 26 }
    sb.toString
  }

  private def esc(s: String): String = s.replace("&", "&amp;")
    .replace("<", "&lt;").replace(">", "&gt;")

  /** Minimal .xlsx writer: first sheet resolvable ONLY via workbook+rels
    * (the part is named sheet7.xml). */
  private def write(path: java.nio.file.Path, g: Seq[(Long, Seq[String])],
                    shared: Boolean): Unit = {
    val strings = g.flatMap(_._2).filter(v => v.nonEmpty && v.toDoubleOption.isEmpty)
      .distinct.toIndexedSeq
    val sstIdx = strings.zipWithIndex.toMap
    def cellXml(r: Long, c: Int, v: String): String = {
      val ref = s"${colRef(c)}${r + 1}"
      v.toDoubleOption match {
        case Some(_) => s"""<c r="$ref"><v>$v</v></c>"""
        case None if shared => s"""<c r="$ref" t="s"><v>${sstIdx(v)}</v></c>"""
        case None => s"""<c r="$ref" t="inlineStr"><is><t>${esc(v)}</t></is></c>"""
      }
    }
    val rows = g.map { case (r, cs) =>
      val cells = cs.zipWithIndex.collect { case (v, c) if v.nonEmpty =>
        cellXml(r, c, v) }.mkString
      s"""<row r="${r + 1}">$cells</row>"""
    }.mkString
    val out = new java.util.zip.ZipOutputStream(
      java.nio.file.Files.newOutputStream(path))
    def entry(name: String, body: String): Unit = {
      out.putNextEntry(new java.util.zip.ZipEntry(name))
      out.write(body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      out.closeEntry()
    }
    entry("xl/workbook.xml",
      """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"
        | xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
        |<sheets><sheet name="Data" sheetId="1" r:id="rId9"/></sheets></workbook>""".stripMargin)
    entry("xl/_rels/workbook.xml.rels",
      """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId9" Type="t" Target="worksheets/sheet7.xml"/></Relationships>""".stripMargin)
    if (shared) entry("xl/sharedStrings.xml",
      s"""<sst count="${strings.length}" uniqueCount="${strings.length}">""" +
        strings.map(s => s"<si><t>${esc(s)}</t></si>").mkString + "</sst>")
    entry("xl/worksheets/sheet7.xml",
      s"""<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
         |<sheetData>$rows</sheetData></worksheet>""".stripMargin)
    out.close()
  }

  test("random grids roundtrip through write+read, shared and inline strings") {
    for (seed <- 1L to 12L; shared <- Seq(false, true)) {
      val g = sample(grid, seed)
      val dir = java.nio.file.Files.createTempDirectory(s"xlsx_prop_$seed")
      val path = dir.resolve("t.xlsx")
      write(path, g, shared)
      val got = Xlsx.grid(java.nio.file.Files.readAllBytes(path))
        .flatMap { case (ln, cs) => cs.zipWithIndex.collect {
          case (v, c) if v.nonEmpty => (ln, c) -> v } }.toMap
      val expected = g.flatMap { case (ln, cs) => cs.zipWithIndex.collect {
        case (v, c) if v.nonEmpty => (ln, c) -> v } }.toMap
      assert(got === expected, s"seed=$seed shared=$shared")
    }
  }
}
