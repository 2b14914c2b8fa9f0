package graft.sources

/** Minimal legacy `.xls` (BIFF8 inside an OLE2/CFB compound file) cell-grid
  * extraction with the JDK only, feeding the same (line ordinal, cells)
  * shape as [[Xlsx.grid]] so all three manifest formats share one pipeline.
  * The reference accepts `.xls` uploads (ref `process_excel_order.py:254`,
  * via pandas/xlrd); old-format shippers are exactly the ones still sending
  * them.
  *
  * Scope (values only, matching what the manifest dispatch needs):
  *  - CFB: FAT + DIFAT chains, directory, mini-FAT/mini-stream for small
  *    workbook streams.
  *  - BIFF8 records: SST (with CONTINUE spans), LABELSST, LABEL, NUMBER,
  *    RK, MULRK, BOOLERR, FORMULA (cached numeric/boolean + trailing STRING
  *    record), first BOUNDSHEET only — "first worksheet", like the `.xlsx`
  *    reader. No styles; date cells arrive as raw serial numbers.
  *
  * Numbers are rendered with integral values undecorated (`10` not `10.0`)
  * — downstream numeric cells all pass through `numOrZero`, and string
  * cells (descriptions, waybills) are never NUMBER records.
  */
object Biff {

  // ---------------------------------------------------------------- CFB

  private val FREESECT = -1 // 0xFFFFFFFF
  private val ENDOFCHAIN = -2 // 0xFFFFFFFE

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF
  private def u16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def i32(b: Array[Byte], i: Int): Int =
    u16(b, i) | (u16(b, i + 2) << 16)

  /** Extract a named stream ("Workbook"/"Book") from a CFB container. */
  private def cfbStream(b: Array[Byte], names: Seq[String]): Array[Byte] = {
    require(b.length >= 512 &&
      u16(b, 0) == 0xCFD0 && u16(b, 2) == 0xE011 &&
      u16(b, 4) == 0xB1A1 && u16(b, 6) == 0xE11A, "not an OLE2/CFB file")
    val sectorSize = 1 << u16(b, 30)
    val miniSectorSize = 1 << u16(b, 32)
    val firstDirSector = i32(b, 48)
    val miniCutoff = i32(b, 56)
    val firstMiniFat = i32(b, 60)
    val firstDifat = i32(b, 68)

    def sectorBytes(s: Int): Array[Byte] = {
      val off = (s + 1) * sectorSize
      java.util.Arrays.copyOfRange(b, off, math.min(off + sectorSize, b.length))
    }
    // FAT sector list: 109 header DIFAT slots + chained DIFAT sectors
    val fatSectors = Seq.newBuilder[Int]
    for (i <- 0 until 109) {
      val s = i32(b, 76 + 4 * i)
      if (s >= 0) fatSectors += s
    }
    var difat = firstDifat
    while (difat >= 0) {
      val ds = sectorBytes(difat)
      val perSector = sectorSize / 4 - 1
      for (i <- 0 until perSector) {
        val s = i32(ds, 4 * i)
        if (s >= 0) fatSectors += s
      }
      difat = i32(ds, sectorSize - 4)
    }
    val fat: Array[Int] =
      fatSectors.result().toArray.flatMap { s =>
        val d = sectorBytes(s)
        (0 until sectorSize / 4).map(i => i32(d, 4 * i))
      }
    def chain(start: Int): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      var s = start
      var guard = 0
      while (s >= 0 && guard <= fat.length) {
        out.write(sectorBytes(s))
        s = fat(s)
        guard += 1
      }
      out.toByteArray
    }

    val dir = chain(firstDirSector)
    case class Entry(name: String, objType: Int, start: Int, size: Long)
    val entries = (0 until dir.length / 128).map { e =>
      val off = e * 128
      val nameLen = u16(dir, off + 64)
      val name =
        if (nameLen < 2) ""
        else new String(dir, off, nameLen - 2, java.nio.charset.StandardCharsets.UTF_16LE)
      Entry(name, u8(dir, off + 66), i32(dir, off + 116),
        i32(dir, off + 120).toLong & 0xFFFFFFFFL)
    }
    val root = entries.find(_.objType == 5).getOrElse(
      throw new IllegalArgumentException("CFB: no root entry"))
    val wb = entries.find(e => e.objType == 2 && names.contains(e.name))
      .getOrElse(throw new IllegalArgumentException(
        s"CFB: no ${names.mkString("/")} stream"))

    val raw =
      if (wb.size >= miniCutoff) chain(wb.start)
      else {
        // small stream: mini-FAT chain over the root entry's mini stream
        val miniStream = chain(root.start)
        val miniFatBytes = chain(firstMiniFat)
        val miniFat = (0 until miniFatBytes.length / 4)
          .map(i => i32(miniFatBytes, 4 * i)).toArray
        val out = new java.io.ByteArrayOutputStream()
        var s = wb.start
        var guard = 0
        while (s >= 0 && guard <= miniFat.length) {
          val off = s * miniSectorSize
          out.write(java.util.Arrays.copyOfRange(miniStream, off,
            math.min(off + miniSectorSize, miniStream.length)))
          s = miniFat(s)
          guard += 1
        }
        out.toByteArray
      }
    if (raw.length > wb.size) java.util.Arrays.copyOf(raw, wb.size.toInt) else raw
  }

  // --------------------------------------------------------------- BIFF

  private case class Record(id: Int, data: Array[Byte], offset: Int)

  private def records(s: Array[Byte]): IndexedSeq[Record] = {
    val out = IndexedSeq.newBuilder[Record]
    var i = 0
    while (i + 4 <= s.length) {
      val id = u16(s, i)
      val len = u16(s, i + 2)
      if (i + 4 + len > s.length) { i = s.length } // truncated tail
      else {
        out += Record(id, java.util.Arrays.copyOfRange(s, i + 4, i + 4 + len), i)
        i += 4 + len
      }
    }
    out.result()
  }

  /** Byte cursor over an SST record plus its CONTINUE records. String
    * character data may split at segment boundaries, where the continuation
    * restates the compression flag — the one genuinely stateful part of
    * BIFF parsing. */
  private final class SegStream(segs: IndexedSeq[Array[Byte]]) {
    private var si = 0
    private var off = 0
    private def hop(): Unit =
      while (si < segs.length && off >= segs(si).length) { si += 1; off = 0 }
    def exhausted: Boolean = { hop(); si >= segs.length }
    def u8(): Int = { hop(); val v = segs(si)(off) & 0xFF; off += 1; v }
    def u16(): Int = u8() | (u8() << 8)
    def i32(): Int = u16() | (u16() << 16)
    def skip(n: Int): Unit = { var i = 0; while (i < n) { u8(); i += 1 } }
    private def atBoundary: Boolean = { hop(); off == 0 && si > 0 }
    /** XLUnicodeRichExtendedString, boundary-aware. */
    def readString(): String = {
      val cch = u16()
      var grbit = u8()
      val cRun = if ((grbit & 0x08) != 0) u16() else 0
      val cbExt = if ((grbit & 0x04) != 0) i32() else 0
      val sb = new java.lang.StringBuilder(cch)
      var remaining = cch
      var compressed = (grbit & 0x01) == 0
      while (remaining > 0) {
        // ANY record boundary inside the character data restates the flag
        // byte — including a split landing exactly after the cch/flags
        // header, before the first character (a between-strings split
        // never triggers this: reading the next header moves the cursor
        // off the boundary first)
        if (atBoundary) {
          grbit = u8()
          compressed = (grbit & 0x01) == 0
        }
        sb.append(if (compressed) u8().toChar else u16().toChar)
        remaining -= 1
      }
      skip(4 * cRun + cbExt)
      sb.toString
    }
  }

  private def parseSst(recs: IndexedSeq[Record], at: Int): IndexedSeq[String] = {
    val segs = IndexedSeq.newBuilder[Array[Byte]]
    segs += recs(at).data
    var j = at + 1
    while (j < recs.length && recs(j).id == 0x003C) { // CONTINUE
      segs += recs(j).data
      j += 1
    }
    val s = new SegStream(segs.result())
    s.i32() // cstTotal
    val unique = s.i32()
    val out = IndexedSeq.newBuilder[String]
    var i = 0
    while (i < unique && !s.exhausted) { out += s.readString(); i += 1 }
    out.result()
  }

  /** Short XLUnicodeString (8-bit length), used by LABEL/BOUNDSHEET. */
  private def xlString(d: Array[Byte], off: Int, len16: Boolean): String = {
    val cch = if (len16) u16(d, off) else u8(d, off)
    val fOff = off + (if (len16) 2 else 1)
    val grbit = u8(d, fOff)
    val chars = fOff + 1 +
      (if ((grbit & 0x08) != 0) 2 else 0) + (if ((grbit & 0x04) != 0) 4 else 0)
    if ((grbit & 0x01) == 0)
      new String(d.slice(chars, chars + cch).map(b => (b & 0xFF).toChar))
    else
      new String(d, chars, 2 * cch, java.nio.charset.StandardCharsets.UTF_16LE)
  }

  private def rkValue(rk: Int): Double = {
    val base =
      if ((rk & 0x02) != 0) (rk >> 2).toDouble // 30-bit signed int
      else java.lang.Double.longBitsToDouble((rk.toLong & 0xFFFFFFFCL) << 32)
    if ((rk & 0x01) != 0) base / 100.0 else base
  }

  private[sources] def numToString(v: Double): String =
    if (v == math.rint(v) && math.abs(v) < 1e15) v.toLong.toString
    else v.toString

  /** First worksheet of an `.xls` payload as (0-based line ordinal, dense
    * cells) — same contract as [[Xlsx.grid]]. */
  def grid(content: Array[Byte]): Seq[(Long, IndexedSeq[String])] = {
    val stream = cfbStream(content, Seq("Workbook", "Book"))
    val recs = records(stream)
    var sst: IndexedSeq[String] = IndexedSeq.empty
    var sheetOffset = -1
    // workbook-globals substream: SST + first BOUNDSHEET
    var i = 0
    var stop = false
    while (i < recs.length && !stop) {
      recs(i).id match {
        case 0x00FC => sst = parseSst(recs, i)
        case 0x0085 if sheetOffset < 0 => // BOUNDSHEET
          sheetOffset = i32(recs(i).data, 0)
        case 0x000A => stop = true // EOF of globals
        case _ =>
      }
      i += 1
    }
    if (sheetOffset < 0) return Seq.empty

    val cells = scala.collection.mutable.Map.empty[(Int, Int), String]
    def put(rw: Int, c: Int, v: String): Unit = cells((rw, c)) = v
    var j = recs.indexWhere(_.offset == sheetOffset)
    if (j < 0) return Seq.empty
    var done = false
    var pendingFormulaCell: Option[(Int, Int)] = None // awaiting STRING record
    while (j < recs.length && !done) {
      val r = recs(j)
      val d = r.data
      r.id match {
        case 0x00FD => // LABELSST
          put(u16(d, 0), u16(d, 2), sst.lift(i32(d, 6)).getOrElse(""))
        case 0x0204 => // LABEL (inline string)
          put(u16(d, 0), u16(d, 2), xlString(d, 6, len16 = true))
        case 0x0203 => // NUMBER
          put(u16(d, 0), u16(d, 2), numToString(
            java.lang.Double.longBitsToDouble(
              (0 until 8).map(k => (d(6 + k).toLong & 0xFF) << (8 * k)).sum)))
        case 0x027E => // RK
          put(u16(d, 0), u16(d, 2), numToString(rkValue(i32(d, 6))))
        case 0x00BD => // MULRK: run of RK cells on one row
          val rw = u16(d, 0)
          val colFirst = u16(d, 2)
          val n = (d.length - 6) / 6
          for (k <- 0 until n)
            put(rw, colFirst + k, numToString(rkValue(i32(d, 4 + 6 * k + 2))))
        case 0x0205 => // BOOLERR
          if (u8(d, 7) == 0) put(u16(d, 0), u16(d, 2),
            if (u8(d, 6) == 1) "TRUE" else "FALSE")
        case 0x0006 => // FORMULA: cached result
          val rw = u16(d, 0); val c = u16(d, 2)
          if (u16(d, 12) == 0xFFFF) u8(d, 6) match {
            case 0 => pendingFormulaCell = Some((rw, c)) // string follows
            case 1 => put(rw, c, if (u8(d, 8) == 1) "TRUE" else "FALSE")
            case _ => // error / empty-string cached result
          } else put(rw, c, numToString(
            java.lang.Double.longBitsToDouble(
              (0 until 8).map(k => (d(6 + k).toLong & 0xFF) << (8 * k)).sum)))
        case 0x0207 => // STRING: cached string result of preceding FORMULA
          pendingFormulaCell.foreach { case (rw, c) =>
            put(rw, c, xlString(d, 0, len16 = true))
          }
          pendingFormulaCell = None
        case 0x000A => done = true // EOF of the first sheet substream
        case _ =>
      }
      j += 1
    }
    if (cells.isEmpty) Seq.empty
    else cells.keys.groupBy(_._1).toSeq.sortBy(_._1).map { case (rw, ks) =>
      val maxCol = ks.map(_._2).max
      val dense = IndexedSeq.tabulate(maxCol + 1)(c => cells.getOrElse((rw, c), ""))
      (rw.toLong, dense)
    }
  }
}
