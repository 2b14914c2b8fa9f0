package graft.sources

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions._

/** Shipper-manifest ingestion (SURVEY §2.1 S4-S6, §2.2 P4-P7, §2.5 W2/W3):
  * Excel/CSV files in two auto-detected layouts → `table_a_raw` rows
  * (ref `src/process_excel_order.py`). The CSV path carries the full
  * operator surface (header offset, A1 probe, positional mapping,
  * forward-fill, cumcount); true `.xlsx` decoding is a reader concern the
  * environment has no codec for.
  *
  * Architecture: files are read distributed (`binaryFile` + a flatMap CSV
  * line parser that carries an explicit per-file line ordinal — Spark has
  * no implicit row order, so W2/W3 need the ordinal column). Format
  * dispatch (old named-column layout vs new positional layout, ref
  * `:195-227`) is driver-side control flow over the first 4 header lines
  * only — a metadata read, not a data scan. All row-level work (ffill,
  * cumcount, cleansing, filters) is Column expressions over the
  * distributed lines.
  *
  * Manifest files are small (thousands of rows); cluster scale comes from
  * ingesting MANY of them — `readAll` unions per-file plans, and every
  * window is partitioned by (file, ...) so no global ordering exists
  * anywhere.
  */
object CsvManifests {

  case class RawLine(src_file: String, line_no: Long, cells: Seq[String])

  /** Quote-aware CSV line split (RFC-4180 commas/quotes; embedded newlines
    * in quoted fields are out of scope for these fixtures). */
  private[sources] def splitCsvLine(line: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var inQ = false
    var i = 0
    while (i < line.length) {
      val c = line.charAt(i)
      if (inQ) {
        if (c == '"') {
          if (i + 1 < line.length && line.charAt(i + 1) == '"') { cur += '"'; i += 1 }
          else inQ = false
        } else cur += c
      } else c match {
        case '"' => inQ = true
        case ',' => out += cur.result(); cur.clear()
        case _ => cur += c
      }
      i += 1
    }
    out += cur.result()
    out.result()
  }

  /** Distributed line scan with per-file line ordinals. CSV files split by
    * line; `.xlsx` files extract the first worksheet's cell grid (see
    * [[Xlsx]]) — both formats produce the same RawLine shape, so the whole
    * manifest pipeline downstream is format-agnostic. */
  def readLines(spark: SparkSession, path: String): Dataset[RawLine] = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.{csv,CSV,xlsx,XLSX}")
      .load(path)
      .select("path", "content")
      .as[(String, Array[Byte])]
      .flatMap { case (p, bytes) =>
        val name = p.substring(p.lastIndexOf('/') + 1)
        if (name.toLowerCase.endsWith(".xlsx"))
          Xlsx.grid(bytes).collect {
            case (ln, cells) if cells.exists(_.nonEmpty) =>
              RawLine(name, ln, cells)
          }
        else
          new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
            .split("\r\n|\r|\n", -1).toIndexedSeq
            .zipWithIndex
            .filter(_._1.nonEmpty)
            .map { case (l, i) => RawLine(name, i.toLong, splitCsvLine(l)) }
      }
  }

  /** Old-format required named columns after F8 header hygiene
    * (ref `process_excel_order.py:88-91`). */
  private val oldRequired = Seq("分提單號碼", "貨物編號", "货物名称", "數量",
    "單價金額", "發票總金額")
  private val oldOptional = Seq("數量單位", "淨重", "進口人英文名稱",
    "進口人統一編號", "進口人電話")

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

  private def cell(idx: Int): Column =
    when(size(col("cells")) > idx, trim(element_at(col("cells"), idx + 1)))
      .otherwise(lit(null).cast("string"))

  private def realOrNull(c: Column): Column = when(isRealValue(c), c)

  /** One manifest file → `table_a_raw` rows. Tries the old named-column
    * layout (header on line index 3); if its required columns are missing,
    * falls back to the new positional layout (header on line index 2,
    * ≥15 columns) — the reference's two-strategy dispatch (ref `:195-227`).
    */
  def readManifest(spark: SparkSession, file: String): DataFrame = {
    val lines = readLines(spark, file).toDF()
    val fileName = file.substring(file.lastIndexOf('/') + 1)
    // driver-side metadata probe: first lines only (A1 cell + both header
    // candidates) — mirrors the reference's header sniffing
    val head = lines.where(col("line_no") <= 3)
      .orderBy("line_no").collect()
      .map(r => r.getLong(1) -> r.getSeq[String](2)).toMap
    val a1 = head.get(0L).flatMap(_.headOption).getOrElse("")
    val mawb = mawbOf(fileName, a1)

    val oldHeader = head.get(3L).map(_.map(cleanName))
    val oldOk = oldHeader.exists(h => oldRequired.forall(h.contains))
    if (oldOk) oldFormat(lines, oldHeader.get, mawb)
    else {
      val newHeader = head.get(2L)
      require(newHeader.exists(_.length >= 15), // P6 arity gate, ref :128
        s"$fileName: neither old-format named columns nor >=15-column " +
          "new-format header found")
      newFormat(lines, mawb)
    }
  }

  /** Old layout: named Chinese columns, header line index 3
    * (ref `:80-120,198-200`). */
  private def oldFormat(lines: DataFrame, header: Seq[String],
                        mawb: String): DataFrame = {
    val idx = header.zipWithIndex.toMap
    def named(n: String): Column = cell(idx(n))
    def namedOpt(n: String): Column =
      idx.get(n).map(i => realOrNull(cell(i)))
        .getOrElse(lit(null).cast("string"))
    val data = lines.where(col("line_no") > 3)
    data.select(
      col("src_file"), col("line_no"),
      // W3: merged HAWB cells arrive blank under a previous value (ref :94)
      ffill(realOrNull(named("分提單號碼")), Seq(col("src_file")),
        Seq(col("line_no"))).as("hawb_no"),
      named("貨物編號").as("item_no_raw"),
      named("货物名称").as("description_original"),
      named("數量").as("qty_raw"),
      namedOpt("數量單位").as("qty_unit"),
      namedOpt("淨重").as("net_weight_raw"),
      named("單價金額").as("unit_price_raw"),
      named("發票總金額").as("total_raw"),
      namedOpt("進口人英文名稱").as("consignee_name"),
      namedOpt("進口人統一編號").as("consignee_id"),
      namedOpt("進口人電話").as("consignee_phone"))
      .where(isRealValue(col("hawb_no")) && isRealValue(col("item_no_raw"))) // P4, ref :95
      .select(
        lit(mawb).as("mawb_no"),
        col("hawb_no"),
        numOrZero(col("item_no_raw")).cast("int").as("item_no"),
        col("description_original"),
        numOrZero(col("qty_raw")).as("qty"),
        col("qty_unit"),
        numOrZero(col("net_weight_raw")).as("net_weight"),
        numOrZero(col("unit_price_raw")).as("unit_price"),
        numOrZero(col("total_raw")).as("total_amount"),
        lit("TWD").as("currency"), // F12, ref :110
        col("consignee_name"), col("consignee_id"), col("consignee_phone"),
        lit("PENDING").as("processing_status"),
        col("src_file").as("data_source_file"))
  }

  /** New layout: positional columns A/D/J/K/N/O, header line index 2,
    * no item-number column — item_no is a per-HAWB cumcount
    * (ref `:122-174,216-218`). */
  private def newFormat(lines: DataFrame, mawb: String): DataFrame = {
    val data = lines.where(col("line_no") > 2 && size(col("cells")) >= 15)
    val extracted = data.select(
      col("src_file"), col("line_no"),
      realOrNull(cell(0)).as("hawb_raw"), // A
      cell(3).as("description_original"), // D
      cell(9).as("qty_raw"), // J
      realOrNull(cell(10)).as("qty_unit"), // K
      cell(13).as("unit_price_raw"), // N
      cell(14).as("total_raw")) // O
    val filled = extracted.withColumn("hawb_no", // W3, ref :146
      ffill(col("hawb_raw"), Seq(col("src_file")), Seq(col("line_no"))))
      .where(isRealValue(col("hawb_no")) &&
        isRealValue(col("description_original"))) // P4, ref :149
    filled
      .withColumn("item_no", // W2 cumcount + 1, ref :156
        row_number().over(Window.partitionBy("src_file", "hawb_no")
          .orderBy("line_no")))
      .select(
        lit(mawb).as("mawb_no"),
        col("hawb_no"),
        col("item_no"),
        col("description_original"),
        numOrZero(col("qty_raw")).as("qty"),
        col("qty_unit"),
        lit(null).cast("double").as("net_weight"),
        numOrZero(col("unit_price_raw")).as("unit_price"),
        numOrZero(col("total_raw")).as("total_amount"),
        lit("TWD").as("currency"),
        lit(null).cast("string").as("consignee_name"),
        lit(null).cast("string").as("consignee_id"),
        lit(null).cast("string").as("consignee_phone"),
        lit("PENDING").as("processing_status"),
        col("src_file").as("data_source_file"))
  }

  /** Ingest every manifest in a directory: per-file format dispatch
    * (driver-side metadata), unioned distributed plans (O4). */
  def readAll(spark: SparkSession, dir: String): DataFrame = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .filter { s =>
        val n = s.getPath.getName.toLowerCase
        s.isFile && (n.endsWith(".csv") || n.endsWith(".xlsx"))
      }
      .map(_.getPath.toString)
    require(files.nonEmpty, s"no .csv/.xlsx manifests in $dir")
    files.map(readManifest(spark, _)).reduce(_ unionByName _)
  }
}
