package graft.sources

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions._

/** Shipper-manifest ingestion (SURVEY §2.1 S4-S6, §2.2 P4-P7, §2.5 W2/W3):
  * Excel/CSV files in two auto-detected layouts → `table_a_raw` rows
  * (ref `src/process_excel_order.py`). `.xlsx` decodes via the JDK-only
  * [[Xlsx]] reader, legacy `.xls` via [[Biff]]; CSV carries the same
  * operator surface (header offset, A1 probe, positional mapping,
  * forward-fill, cumcount).
  *
  * Architecture: ONE distributed pass for any number of files. A
  * `binaryFile` scan hands each file to an executor task; the task builds
  * the cell grid (RFC-4180 CSV record scan / xlsx / xls), sniffs the header lines
  * file-locally (the reference's two-strategy dispatch, ref `:195-227`),
  * and emits format-tagged [[ManifestLine]] rows. Ingesting N files is one
  * job over one plan — no per-file driver round-trips, no N-way plan
  * union. All row-level work after extraction (ffill, cumcount, cleansing,
  * filters) is Column expressions, partitioned per file so no global
  * ordering exists anywhere.
  *
  * Files that match neither layout become `format = "error"` rows (message
  * in the description field): `readAll` drops them — the reference's
  * per-file error isolation (ref `:268-271` logs and continues) — and
  * [[rejects]] surfaces them for auditing; the single-file [[readManifest]]
  * throws instead.
  */
object CsvManifests {

  case class RawLine(src_file: String, line_no: Long, cells: Seq[String])

  /** One extracted manifest line before cleansing: raw trimmed cell values
    * tagged with the detected layout. A fixed shape for both layouts keeps
    * the downstream plan single-branch. */
  case class ManifestLine(
      src_file: String, line_no: Long, format: String, mawb_no: String,
      hawb_cell: String, item_no_cell: String, description_cell: String,
      qty_cell: String, qty_unit_cell: String, net_weight_cell: String,
      unit_price_cell: String, total_cell: String,
      consignee_name_cell: String, consignee_id_cell: String,
      consignee_phone_cell: String)

  /** Quote-aware single-line CSV split (kept for callers that already have
    * line-framed input; [[csvRecords]] is the whole-buffer scanner that
    * also handles newlines inside quoted fields). */
  private[sources] def splitCsvLine(line: String): Seq[String] =
    csvRecords(line).headOption.map(_._2.toSeq).getOrElse(Seq(""))

  /** Whole-buffer RFC-4180 scanner: one pass over the text, tracking quote
    * state, so a quoted field may contain commas, escaped quotes ("") AND
    * embedded line breaks — pandas `read_csv` parity (the reference parses
    * manifests with it, ref `process_excel_order.py:197,216`). Returns
    * (0-based RECORD ordinal, cells); for files without embedded newlines a
    * record is exactly a physical line, so ordinals are unchanged. Records
    * with no characters at all (empty lines) are skipped, ordinals
    * preserved — same rule the per-line splitter applied. */
  private[sources] def csvRecords(text: String): Seq[(Long, IndexedSeq[String])] = {
    val out = Seq.newBuilder[(Long, IndexedSeq[String])]
    var cells = IndexedSeq.newBuilder[String]
    val cur = new StringBuilder
    var inQ = false
    var sawChar = false // any char consumed in the current record
    var nCells = 0
    var rec = 0L
    var i = 0
    def endCell(): Unit = { cells += cur.result(); cur.clear(); nCells += 1 }
    def endRecord(): Unit = {
      endCell()
      if (sawChar) out += ((rec, cells.result()))
      cells = IndexedSeq.newBuilder[String]
      nCells = 0; sawChar = false
      rec += 1
    }
    while (i < text.length) {
      val c = text.charAt(i)
      if (inQ) {
        if (c == '"') {
          if (i + 1 < text.length && text.charAt(i + 1) == '"') { cur += '"'; i += 1 }
          else inQ = false
        } else cur += c // includes \r / \n: embedded line break
      } else c match {
        case '"' => inQ = true; sawChar = true
        case ',' => endCell(); sawChar = true
        case '\r' =>
          if (i + 1 < text.length && text.charAt(i + 1) == '\n') i += 1
          endRecord()
        case '\n' => endRecord()
        case _ => cur += c; sawChar = true
      }
      i += 1
    }
    if (sawChar || nCells > 0 || cur.nonEmpty) endRecord() // trailing record, no newline
    out.result()
  }

  /** File bytes → (0-based record ordinal, cells) grid, dispatched on
    * extension — runs inside the executor task. */
  private[sources] def gridOf(name: String, bytes: Array[Byte])
      : Seq[(Long, IndexedSeq[String])] = {
    val lower = name.toLowerCase
    if (lower.endsWith(".xlsx"))
      Xlsx.grid(bytes).filter(_._2.exists(_.nonEmpty))
    else if (lower.endsWith(".xls"))
      Biff.grid(bytes).filter(_._2.exists(_.nonEmpty))
    else
      csvRecords(new String(bytes, java.nio.charset.StandardCharsets.UTF_8))
  }

  /** Distributed line scan with per-file line ordinals — the raw-grid view
    * (S5), shared by all three physical formats. */
  def readLines(spark: SparkSession, path: String): Dataset[RawLine] = {
    import spark.implicits._
    manifestFiles(spark, path).flatMap { case (p, bytes) =>
      val name = p.substring(p.lastIndexOf('/') + 1)
      gridOf(name, bytes).map { case (ln, cells) => RawLine(name, ln, cells) }
    }
  }

  /** Old-format required named columns after F8 header hygiene
    * (ref `process_excel_order.py:88-91`). */
  private val oldRequired = Seq("分提單號碼", "貨物編號", "货物名称", "數量",
    "單價金額", "發票總金額")

  /** F8 — header-name hygiene: strip + drop embedded newlines
    * (ref `:86,203`). */
  private def cleanName(h: String): String = h.replace("\n", "").trim

  /** S6/F10/F11 — MAWB detection: cell A1 iff alphanumeric and not a null
    * sentinel, else the filename stem (ref `:40-76`). */
  private def mawbOf(fileName: String, a1: String): String = {
    val v = a1.trim
    val isReal = v.nonEmpty && !Set("nan", "none").contains(v.toLowerCase)
    if (isReal && v.matches("^[A-Za-z0-9]+$")) v
    else fileName.replaceAll("\\.[^.]*$", "")
  }

  /** File-local format dispatch + cell extraction — pure, executor-side.
    * Tries the old named-column layout (header on line index 3); if its
    * required columns are missing, falls back to the new positional layout
    * (header on line index 2, ≥15 columns); neither → one error row. */
  private[sources] def parseManifest(fileName: String,
      grid: Seq[(Long, IndexedSeq[String])]): Seq[ManifestLine] = {
    def cellAt(cells: IndexedSeq[String], i: Int): String =
      if (i >= 0 && cells.length > i) cells(i).trim else null
    val head = grid.filter(_._1 <= 3).toMap
    val a1 = head.get(0L).flatMap(_.headOption).getOrElse("")
    val mawb = mawbOf(fileName, a1)
    val oldHeader = head.get(3L).map(_.map(cleanName))
    if (oldHeader.exists(h => oldRequired.forall(h.contains))) {
      val idx = oldHeader.get.zipWithIndex.toMap
      def named(cells: IndexedSeq[String], n: String): String =
        cellAt(cells, idx.getOrElse(n, -1))
      grid.collect { case (ln, cells) if ln > 3 =>
        ManifestLine(fileName, ln, "old", mawb,
          hawb_cell = named(cells, "分提單號碼"),
          item_no_cell = named(cells, "貨物編號"),
          description_cell = named(cells, "货物名称"),
          qty_cell = named(cells, "數量"),
          qty_unit_cell = named(cells, "數量單位"),
          net_weight_cell = named(cells, "淨重"),
          unit_price_cell = named(cells, "單價金額"),
          total_cell = named(cells, "發票總金額"),
          consignee_name_cell = named(cells, "進口人英文名稱"),
          consignee_id_cell = named(cells, "進口人統一編號"),
          consignee_phone_cell = named(cells, "進口人電話"))
      }
    } else if (head.get(2L).exists(_.length >= 15)) { // P6 arity gate, ref :128
      grid.collect { case (ln, cells) if ln > 2 && cells.length >= 15 =>
        ManifestLine(fileName, ln, "new", mawb,
          hawb_cell = cellAt(cells, 0), // A
          item_no_cell = null, // new format has no item-no column (W2 cumcount)
          description_cell = cellAt(cells, 3), // D
          qty_cell = cellAt(cells, 9), // J
          qty_unit_cell = cellAt(cells, 10), // K
          net_weight_cell = null,
          unit_price_cell = cellAt(cells, 13), // N
          total_cell = cellAt(cells, 14), // O
          consignee_name_cell = null, consignee_id_cell = null,
          consignee_phone_cell = null)
      }
    } else Seq(ManifestLine(fileName, -1L, "error", mawb,
      null, null,
      s"$fileName: neither old-format named columns nor >=15-column " +
        "new-format header found",
      null, null, null, null, null, null, null, null))
  }

  private def manifestFiles(spark: SparkSession, path: String)
      : Dataset[(String, Array[Byte])] = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.{csv,CSV,xls,XLS,xlsx,XLSX}")
      .load(path)
      .select("path", "content")
      .as[(String, Array[Byte])]
  }

  /** The one distributed pass: scan → per-file grid + dispatch + extract.
    * A file whose BYTES can't be decoded (corrupt zip/CFB container,
    * malformed XML part) becomes an error row instead of failing the task —
    * per-file isolation, like the reference's try/except around each file
    * (ref `process_excel_order.py:268-271`). */
  private[graft] def parsedLines(spark: SparkSession, path: String)
      : Dataset[ManifestLine] = {
    import spark.implicits._
    manifestFiles(spark, path).flatMap { case (p, bytes) =>
      val name = p.substring(p.lastIndexOf('/') + 1)
      try parseManifest(name, gridOf(name, bytes))
      catch {
        case e: Exception =>
          Seq(ManifestLine(name, -1L, "error", mawbOf(name, ""),
            null, null, s"$name: unreadable (${e.getMessage})",
            null, null, null, null, null, null, null, null))
      }
    }
  }

  private def realOrNull(c: Column): Column = when(isRealValue(c), c)

  /** Extracted lines → `table_a_raw` rows: ffill merged HAWB cells (W3,
    * ref `:94,146`), per-layout row filters (P4, ref `:95,149`), cumcount
    * item numbers for the positional layout (W2, ref `:156`), numeric
    * coercion and literal enrichment. One branch-free plan for any mix of
    * layouts; every window partitions by file. */
  private def finalize(parsed: DataFrame,
                       decimalMoney: Boolean = false): DataFrame = {
    // money (unit price / invoice total) coerces from the raw CELL STRING:
    // decimal mode must never route through the double (see GraftFunctions
    // .numOrZeroDec). qty/net_weight stay double — quantities, not money.
    val money: Column => Column =
      if (decimalMoney) numOrZeroDec else numOrZero
    val isOld = col("format") === "old"
    val filled = parsed
      .where(col("format") =!= "error")
      .withColumn("hawb_no", // W3: merged HAWB cells arrive blank (ref :94)
        ffill(realOrNull(col("hawb_cell")), Seq(col("src_file")),
          Seq(col("line_no"))))
      .where(isRealValue(col("hawb_no")) &&
        when(isOld, isRealValue(col("item_no_cell")))
          .otherwise(isRealValue(col("description_cell"))))
    filled.select(
      col("mawb_no"),
      col("hawb_no"),
      when(isOld, numOrZero(col("item_no_cell")).cast("int"))
        .otherwise(row_number().over( // W2 cumcount + 1, ref :156
          Window.partitionBy("src_file", "hawb_no").orderBy("line_no")))
        .as("item_no"),
      col("description_cell").as("description_original"),
      numOrZero(col("qty_cell")).as("qty"),
      realOrNull(col("qty_unit_cell")).as("qty_unit"),
      when(isOld, numOrZero(realOrNull(col("net_weight_cell"))))
        .otherwise(lit(null).cast("double")).as("net_weight"),
      money(col("unit_price_cell")).as("unit_price"),
      money(col("total_cell")).as("total_amount"),
      lit("TWD").as("currency"), // F12, ref :110
      realOrNull(col("consignee_name_cell")).as("consignee_name"),
      realOrNull(col("consignee_id_cell")).as("consignee_id"),
      realOrNull(col("consignee_phone_cell")).as("consignee_phone"),
      lit("PENDING").as("processing_status"),
      col("src_file").as("data_source_file"))
  }

  /** One manifest file → `table_a_raw` rows. Throws (P7 diagnostic) when
    * the file matches neither layout. */
  def readManifest(spark: SparkSession, file: String): DataFrame = {
    import spark.implicits._
    val parsed = parsedLines(spark, file)
    val errs = parsed.where(col("format") === "error")
      .select("description_cell").as[String].collect()
    require(errs.isEmpty, errs.mkString("; "))
    finalize(parsed.toDF())
  }

  /** Ingest every manifest in a directory as ONE distributed job: per-file
    * format dispatch happens inside the scan tasks, so N files is one scan
    * and one plan (no driver round-trips, no N-way union). Files matching
    * neither layout are skipped (see [[rejects]]). */
  /** One driver metadata call — a misconfigured one-shot ingest must fail
    * loudly, not silently import nothing. (Streaming drains skip this: a
    * watched drop directory legitimately starts empty.) */
  private[graft] def requireManifestDir(spark: SparkSession, dir: String): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val exts = Set("csv", "xls", "xlsx")
    val any = fs.listStatus(new org.apache.hadoop.fs.Path(dir)).exists { s =>
      val n = s.getPath.getName
      s.isFile && exts.contains(n.substring(n.lastIndexOf('.') + 1).toLowerCase)
    }
    require(any, s"no .csv/.xls/.xlsx manifests in $dir")
  }

  def readAll(spark: SparkSession, dir: String): DataFrame = {
    requireManifestDir(spark, dir)
    finalize(parsedLines(spark, dir).toDF())
  }

  /** [[readAll]] with money columns (unit_price, total_amount) as exact
    * DECIMAL(18,4) — the SURVEY §1.3 correctness upgrade over the
    * reference's float money; default path stays double for bit-parity. */
  def readAllDecimal(spark: SparkSession, dir: String): DataFrame = {
    requireManifestDir(spark, dir)
    finalize(parsedLines(spark, dir).toDF(), decimalMoney = true)
  }

  /** Audit view of files rejected by the format dispatch: (file, reason). */
  def rejects(spark: SparkSession, dir: String): DataFrame =
    parsedLines(spark, dir).toDF()
      .where(col("format") === "error")
      .select(col("src_file"), col("description_cell").as("reason"))

  /** Streaming variant of the manifest scan (the reference's Pipeline A is
    * ALSO a drop-directory loop, ref `process_excel_order.py:249-262`):
    * same per-file dispatch over a file stream, inputs archived by the
    * source. Finalization (ffill/cumcount windows) isn't stream-plannable
    * — run [[finalizeBatch]] per micro-batch; windows partition by file
    * and a file is never split across batches, so batch-at-a-time is
    * semantically exact. */
  def readStreamParsed(spark: SparkSession, dir: String,
                       archiveDir: Option[String] = None): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val binaryFileSchema = StructType(Seq( // the binaryFile source's fixed schema
      StructField("path", StringType), StructField("modificationTime", TimestampType),
      StructField("length", LongType), StructField("content", BinaryType)))
    val reader = spark.readStream.format("binaryFile")
      .schema(binaryFileSchema)
      .option("pathGlobFilter", "*.{csv,CSV,xls,XLS,xlsx,XLSX}")
      .option("maxFilesPerTrigger", "64")
    archiveDir.foreach { a =>
      reader.option("cleanSource", "archive").option("sourceArchiveDir", a)
    }
    reader.load(dir)
      .select("path", "content")
      .as[(String, Array[Byte])]
      .flatMap { case (p, bytes) =>
        val name = p.substring(p.lastIndexOf('/') + 1)
        // same per-file isolation as the batch path: a corrupt container
        // must become a reject row, not a poison pill that kills the
        // stream on every restart
        try parseManifest(name, gridOf(name, bytes))
        catch {
          case e: Exception =>
            Seq(ManifestLine(name, -1L, "error", mawbOf(name, ""),
              null, null, s"$name: unreadable (${e.getMessage})",
              null, null, null, null, null, null, null, null))
        }
      }
      .toDF()
  }

  /** Per-micro-batch finalization for the streaming drain. */
  def finalizeBatch(parsed: DataFrame): DataFrame = finalize(parsed)
}
