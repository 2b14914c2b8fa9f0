package graft.sources

import java.nio.charset.StandardCharsets.UTF_16LE

/** Test-side minimal BIFF8/`.xls` writer: enough of the format (spec'd in
  * MS-XLS/MS-CFB) to produce files for roundtrip goldens against [[Biff]].
  * Deliberately exercises the reader's edge paths: RK-encoded integers,
  * NUMBER doubles, SST strings with a forced CONTINUE split mid-string,
  * and both CFB stream layouts (mini-stream when the workbook stream is
  * < 4096 bytes, regular FAT chain when padded above the cutoff). */
object BiffFixture {

  private def u16(v: Int): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
  private def i32(v: Int): Array[Byte] = u16(v & 0xFFFF) ++ u16(v >>> 16)
  private def doubleLe(d: Double): Array[Byte] = {
    val bits = java.lang.Double.doubleToLongBits(d)
    Array.tabulate(8)(k => ((bits >> (8 * k)) & 0xFF).toByte)
  }
  private def rec(id: Int, data: Array[Byte]): Array[Byte] =
    u16(id) ++ u16(data.length) ++ data

  /** Write `grid` as a one-sheet .xls. `pad` forces the workbook stream
    * above the 4096-byte mini-stream cutoff (regular FAT layout);
    * `contSplitAtStart` places the forced SST CONTINUE split immediately
    * after a string's cch/flags header (before its first character) —
    * the other legal split position readers must survive. */
  def write(path: java.nio.file.Path, grid: Seq[(Long, Seq[String])],
            pad: Boolean, contSplitAtStart: Boolean = false): Unit = {
    val cells = for ((ln, cs) <- grid; (v, c) <- cs.zipWithIndex if v.nonEmpty)
      yield (ln.toInt, c, v)
    // a cell is numeric only if the double roundtrips its text exactly —
    // "007" stays a text cell, as Excel itself would store it
    def numericOf(v: String): Option[Double] = v.toDoubleOption
      .filter(d => d.toString == v || Biff.numToString(d) == v)
    def asRkInt(v: String): Option[Int] = numericOf(v).collect {
      case d if d == math.rint(d) && math.abs(d) < (1 << 29) &&
        Biff.numToString(d) == v => d.toInt
    }
    val strings = cells.collect {
      case (_, _, v) if numericOf(v).isEmpty => v
    }.distinct.toIndexedSeq
    val sstIdx = strings.zipWithIndex.toMap

    val sheet = {
      val b = new java.io.ByteArrayOutputStream
      b.write(rec(0x0809, u16(0x0600) ++ u16(0x0010) ++ u16(0x0DBB) ++
        u16(0x07CC) ++ i32(0) ++ i32(0))) // BOF worksheet
      for ((rw, c, v) <- cells) {
        val cell = u16(rw) ++ u16(c) ++ u16(0) // rw, col, ixfe
        asRkInt(v) match {
          case Some(n) => b.write(rec(0x027E, cell ++ i32((n << 2) | 0x02)))
          case None => numericOf(v) match {
            case Some(d) => b.write(rec(0x0203, cell ++ doubleLe(d)))
            case None => b.write(rec(0x00FD, cell ++ i32(sstIdx(v))))
          }
        }
      }
      b.write(rec(0x000A, Array.empty))
      b.toByteArray
    }

    // SST payload, force-split mid-string into a CONTINUE when possible
    val sstParts: Seq[(Int, Array[Byte])] = {
      val blobs = strings.map { s =>
        u16(s.length) ++ Array(0x01.toByte) ++ s.getBytes(UTF_16LE)
      }
      val nRefs = cells.count(c => numericOf(c._3).isEmpty)
      val all = i32(nRefs) ++ i32(strings.length) ++ blobs.flatten
      val lastChars = strings.lastOption.map(_.length * 2).getOrElse(0)
      if (lastChars >= 4) {
        val charsStart = all.length - lastChars
        val cut = // even offsets: utf16 chars
          if (contSplitAtStart) charsStart
          else charsStart + ((lastChars / 2) & ~1)
        Seq(0x00FC -> all.take(cut),
          0x003C -> (Array(0x01.toByte) ++ all.drop(cut))) // CONTINUE, utf16
      } else Seq(0x00FC -> all)
    }

    def globals(lbPlyPos: Int): Array[Byte] = {
      val b = new java.io.ByteArrayOutputStream
      b.write(rec(0x0809, u16(0x0600) ++ u16(0x0005) ++ u16(0x0DBB) ++
        u16(0x07CC) ++ i32(0) ++ i32(0))) // BOF globals
      if (pad) b.write(rec(0x005C, Array.fill(4000)(0x20.toByte))) // WRITEACCESS pad
      sstParts.foreach { case (id, data) => b.write(rec(id, data)) }
      val name = "Sheet1"
      b.write(rec(0x0085, i32(lbPlyPos) ++ u16(0) ++
        Array(name.length.toByte, 0x01.toByte) ++ name.getBytes(UTF_16LE)))
      b.write(rec(0x000A, Array.empty))
      b.toByteArray
    }
    val globalsLen = globals(0).length
    val stream = globals(globalsLen) ++ sheet
    java.nio.file.Files.write(path, cfb(stream))
  }

  private val FREE = 0xFFFFFFFF
  private val EOC = 0xFFFFFFFE
  private val FATSECT = 0xFFFFFFFD

  private def dirEntry(name: String, objType: Int, child: Int, start: Int,
                       size: Int): Array[Byte] = {
    val nm = name.getBytes(UTF_16LE)
    nm ++ Array.fill(64 - nm.length)(0.toByte) ++
      u16(nm.length + 2) ++ Array(objType.toByte, 1.toByte) ++ // color: black
      i32(FREE) ++ i32(FREE) ++ i32(child) ++ // left, right, child
      Array.fill(16 + 4 + 16)(0.toByte) ++ // clsid, state, ctime+mtime
      i32(start) ++ i32(size) ++ i32(0)
  }

  private def sectorPad(b: Array[Byte]): Array[Byte] =
    b ++ Array.fill((512 - b.length % 512) % 512)(0.toByte)

  /** Wrap a Workbook stream in a CFB container: regular FAT layout when
    * >= 4096 bytes, root mini-stream layout below. */
  private def cfb(stream: Array[Byte]): Array[Byte] = {
    val mini = stream.length < 4096
    val header = new java.io.ByteArrayOutputStream
    def fatSector(entries: Seq[Int]): Array[Byte] =
      (entries ++ Seq.fill(128 - entries.size)(FREE)).flatMap(i32).toArray

    if (!mini) {
      // sectors: 0 FAT, 1 dir, 2.. stream
      val n = (stream.length + 511) / 512
      val fat = fatSector(Seq(FATSECT, EOC) ++
        (3 until 2 + n).map(identity) ++ Seq(EOC))
      val dir = sectorPad(
        dirEntry("Root Entry", 5, 1, EOC, 0) ++
          dirEntry("Workbook", 2, FREE, 2, stream.length))
      header.write(cfbHeader(firstDir = 1, firstMiniFat = EOC, nMiniFat = 0))
      header.write(fat); header.write(dir); header.write(sectorPad(stream))
    } else {
      // sectors: 0 FAT, 1 dir, 2 miniFAT, 3.. mini-stream container
      val miniStream = stream ++ Array.fill((64 - stream.length % 64) % 64)(0.toByte)
      val nMini = miniStream.length / 64
      val nCont = (miniStream.length + 511) / 512
      val fat = fatSector(Seq(FATSECT, EOC, EOC) ++
        (4 until 3 + nCont).map(identity) ++ Seq(EOC))
      val miniFat = sectorPad(
        ((1 until nMini).map(identity) ++ Seq(EOC)).flatMap(i32).toArray)
      val dir = sectorPad(
        dirEntry("Root Entry", 5, 1, 3, miniStream.length) ++
          dirEntry("Workbook", 2, FREE, 0, stream.length))
      header.write(cfbHeader(firstDir = 1, firstMiniFat = 2, nMiniFat = 1))
      header.write(fat); header.write(dir); header.write(miniFat)
      header.write(sectorPad(miniStream))
    }
    header.toByteArray
  }

  private def cfbHeader(firstDir: Int, firstMiniFat: Int, nMiniFat: Int)
      : Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(512)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put(Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1)
      .map(_.toByte)) // signature
    b.position(24)
    b.putShort(0x003E.toShort).putShort(0x0003.toShort) // minor, major
    b.putShort(0xFFFE.toShort) // byte order
    b.putShort(9.toShort).putShort(6.toShort) // sector / mini shifts
    b.position(44)
    b.putInt(1) // one FAT sector
    b.putInt(firstDir)
    b.position(56)
    b.putInt(4096) // mini cutoff
    b.putInt(firstMiniFat).putInt(nMiniFat)
    b.putInt(EOC).putInt(0) // no DIFAT chain
    b.putInt(0) // DIFAT[0]: FAT at sector 0
    for (_ <- 1 until 109) b.putInt(FREE)
    b.array()
  }
}
