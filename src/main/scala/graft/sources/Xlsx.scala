package graft.sources

import java.io.{ByteArrayInputStream, InputStream}
import java.util.zip.ZipInputStream

import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}

/** Minimal XLSX (OOXML spreadsheet) cell-grid extraction with the JDK only:
  * an .xlsx file is a zip of XML parts, so the same streamed-zip + StAX
  * machinery as the declarations reader applies. Reads `xl/sharedStrings
  * .xml` and the first worksheet, resolving shared/inline strings and
  * numeric cell values into a dense row/column string grid — exactly what
  * the manifest format dispatch needs (the reference's Pipeline A inputs
  * are .xlsx files read via pandas/openpyxl).
  *
  * Scope: values only (shared strings, inline strings, numbers, booleans,
  * formula cached values). No styles, dates-as-serials arrive as raw
  * numbers, only the first worksheet — matching `read_excel(...)` defaults
  * in the reference (`process_excel_order.py:198,216`).
  */
object Xlsx {

  private val factory = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f
  }

  /** `"BC7"` → 0-based column index 54. */
  private[sources] def colIndex(ref: String): Int = {
    var i = 0; var acc = 0
    while (i < ref.length && ref.charAt(i).isLetter) {
      acc = acc * 26 + (ref.charAt(i).toUpper - 'A' + 1)
      i += 1
    }
    acc - 1
  }

  private def noClose(in: InputStream): InputStream =
    new java.io.FilterInputStream(in) { override def close(): Unit = () }

  private def parseSharedStrings(in: InputStream): IndexedSeq[String] = {
    val r = factory.createXMLStreamReader(noClose(in))
    val out = IndexedSeq.newBuilder[String]
    var cur: StringBuilder = null
    var inT = false
    while (r.hasNext) r.next() match {
      case XMLStreamConstants.START_ELEMENT if r.getLocalName == "si" =>
        cur = new StringBuilder
      case XMLStreamConstants.START_ELEMENT if r.getLocalName == "t" =>
        inT = cur != null
      case XMLStreamConstants.CHARACTERS if inT =>
        cur.append(r.getText)
      case XMLStreamConstants.END_ELEMENT if r.getLocalName == "t" =>
        inT = false
      case XMLStreamConstants.END_ELEMENT if r.getLocalName == "si" =>
        out += cur.result(); cur = null
      case _ =>
    }
    out.result()
  }

  /** One worksheet → (1-based row number, dense cells). */
  private def parseSheet(in: InputStream, shared: IndexedSeq[String])
      : Seq[(Long, IndexedSeq[String])] = {
    val r = factory.createXMLStreamReader(noClose(in))
    val rows = Seq.newBuilder[(Long, IndexedSeq[String])]
    var rowNum = 0L
    var cells: scala.collection.mutable.ArrayBuffer[String] = null
    var cellCol = -1
    var cellType = ""
    var value: StringBuilder = null
    var inV = false
    def put(col: Int, v: String): Unit = {
      while (cells.length <= col) cells += ""
      cells(col) = v
    }
    while (r.hasNext) r.next() match {
      case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
        case "row" =>
          rowNum = Option(r.getAttributeValue(null, "r"))
            .map(_.toLong).getOrElse(rowNum + 1)
          cells = scala.collection.mutable.ArrayBuffer.empty[String]
        case "c" =>
          cellCol = Option(r.getAttributeValue(null, "r"))
            .map(colIndex).getOrElse(cellCol + 1)
          cellType = Option(r.getAttributeValue(null, "t")).getOrElse("n")
          value = new StringBuilder
        case "v" | "t" => inV = cells != null && value != null
        case _ =>
      }
      case XMLStreamConstants.CHARACTERS if inV =>
        value.append(r.getText)
      case XMLStreamConstants.END_ELEMENT => r.getLocalName match {
        case "v" | "t" => inV = false
        case "c" =>
          val raw = value.result()
          val resolved = cellType match {
            case "s" => shared.lift(raw.trim.toInt).getOrElse("")
            case "b" => if (raw.trim == "1") "TRUE" else "FALSE"
            case _ => raw // n, str, inlineStr (via t), e
          }
          if (cellCol >= 0) put(cellCol, resolved)
          value = null
        case "row" =>
          rows += rowNum -> cells.toIndexedSeq
          cells = null
        case _ =>
      }
      case _ =>
    }
    rows.result()
  }

  /** First `<sheet>` element's relationship id from `xl/workbook.xml` —
    * workbook sheet order, not part-name order. */
  private def firstSheetRelId(in: InputStream): Option[String] = {
    val r = factory.createXMLStreamReader(noClose(in))
    while (r.hasNext) {
      if (r.next() == XMLStreamConstants.START_ELEMENT &&
          r.getLocalName == "sheet") {
        var i = 0
        while (i < r.getAttributeCount) {
          if (r.getAttributeLocalName(i) == "id") // r:id
            return Some(r.getAttributeValue(i))
          i += 1
        }
      }
    }
    None
  }

  /** `rId` → part name (relative targets resolved against `xl/`) from
    * `xl/_rels/workbook.xml.rels`. */
  private def relTarget(in: InputStream, rid: String): Option[String] = {
    val r = factory.createXMLStreamReader(noClose(in))
    while (r.hasNext) {
      if (r.next() == XMLStreamConstants.START_ELEMENT &&
          r.getLocalName == "Relationship" &&
          Option(r.getAttributeValue(null, "Id")).contains(rid)) {
        return Option(r.getAttributeValue(null, "Target")).map { t =>
          if (t.startsWith("/")) t.substring(1)
          else if (t.startsWith("xl/")) t
          else s"xl/$t"
        }
      }
    }
    None
  }

  /** Extract the first worksheet of an xlsx payload as
    * (0-based line ordinal, cells) — the same shape as the CSV line reader,
    * so both formats share the manifest pipeline. "First" is resolved via
    * `xl/workbook.xml` sheet order + the workbook rels (part names are NOT
    * guaranteed to be `sheet1.xml`); when either part is absent the
    * lexicographically-first worksheet member is used. */
  def grid(content: Array[Byte]): Seq[(Long, IndexedSeq[String])] = {
    val zis = new ZipInputStream(new ByteArrayInputStream(content))
    var shared: IndexedSeq[String] = IndexedSeq.empty
    var workbook: Option[Array[Byte]] = None
    var rels: Option[Array[Byte]] = None
    val sheets = scala.collection.mutable.Map.empty[String, Array[Byte]]
    try {
      var e = zis.getNextEntry
      while (e != null) {
        e.getName match {
          case "xl/sharedStrings.xml" =>
            shared = parseSharedStrings(zis)
          case "xl/workbook.xml" =>
            workbook = Some(zis.readAllBytes())
          case "xl/_rels/workbook.xml.rels" =>
            rels = Some(zis.readAllBytes())
          case n if n.startsWith("xl/worksheets/") && n.endsWith(".xml") =>
            sheets(n) = zis.readAllBytes()
          case _ =>
        }
        e = zis.getNextEntry
      }
    } finally zis.close()
    val resolved: Option[Array[Byte]] = (for {
      wb <- workbook
      rl <- rels
      rid <- firstSheetRelId(new ByteArrayInputStream(wb))
      part <- relTarget(new ByteArrayInputStream(rl), rid)
      bytes <- sheets.get(part)
    } yield bytes).orElse(sheets.toSeq.sortBy(_._1).headOption.map(_._2))
    resolved match {
      case None => Seq.empty
      case Some(bytes) =>
        parseSheet(new ByteArrayInputStream(bytes), shared)
          .map { case (r, cs) => (r - 1, cs) } // 1-based row -> 0-based line
    }
  }
}
