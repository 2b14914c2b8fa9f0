package graft.sources

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property roundtrip for the whole-buffer RFC-4180 scanner
  * ([[CsvManifests.csvRecords]]): random grids whose cells contain commas,
  * quotes, embedded LF/CRLF line breaks, CJK text and blanks, serialized
  * with standard quoting (quote-wrap when a cell holds `"` `,` CR or LF;
  * `""` escapes), must scan back cell-for-cell with record ordinals intact —
  * under LF and CRLF record separators, with and without a trailing
  * newline. Mirrors the BIFF8 roundtrip approach; pure JVM, no Spark. */
class CsvRoundtripSpec extends AnyFunSuite {

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  private val cell: Gen[String] = Gen.frequency(
    3 -> Gen.alphaNumStr.map(_.take(10)),
    2 -> Gen.listOfN(3, Gen.oneOf("風", "扇", "貨", "物")).map(_.mkString),
    2 -> Gen.oneOf("a,b", "x,", ",y", ","),                // commas
    2 -> Gen.oneOf("say \"hi\"", "\"", "\"\"", "a\"b"),    // quotes
    2 -> Gen.oneOf("l1\nl2", "l1\r\nl2", "a\rb", "\n"),    // line breaks
    2 -> Gen.const(""))                                    // blank

  private val grid: Gen[Seq[Seq[String]]] =
    Gen.chooseNum(1, 25).flatMap { rows =>
      Gen.sequence[Seq[Seq[String]], Seq[String]]((0 until rows).map { _ =>
        Gen.chooseNum(1, 6).flatMap(cols => Gen.listOfN(cols, cell))
      })
    }

  /** Standard RFC-4180 writer. Empty cells are quoted too, so even an
    * all-blank single-cell record serializes to a non-empty line (`""`)
    * and survives the scanner's empty-physical-line skip. */
  private def writeCsv(rows: Seq[Seq[String]], sep: String,
                       trailing: Boolean): String = {
    val body = rows.map(_.map { c =>
      if (c.isEmpty || c.exists("\",\r\n".contains(_)))
        "\"" + c.replace("\"", "\"\"") + "\""
      else c
    }.mkString(",")).mkString(sep)
    if (trailing) body + sep else body
  }

  test("random grids roundtrip through write+scan (LF/CRLF × trailing-newline)") {
    for (seed <- 1L to 25L; sep <- Seq("\n", "\r\n"); trailing <- Seq(true, false)) {
      val rows = sample(grid, seed)
      val text = writeCsv(rows, sep, trailing)
      val got = CsvManifests.csvRecords(text)
      val expected = rows.zipWithIndex.map { case (cs, i) => (i.toLong, cs) }
      assert(got.map(_._1) === expected.map(_._1),
        s"ordinals diverged (seed=$seed sep=${sep.length} trailing=$trailing)")
      assert(got.map(_._2.toSeq) === expected.map(_._2),
        s"cells diverged (seed=$seed sep=${sep.length} trailing=$trailing)")
    }
  }

  test("trailing-record edges: no final newline, final empty quoted cell, lone quoted cell") {
    assert(CsvManifests.csvRecords("a,b") === Seq((0L, IndexedSeq("a", "b"))))
    assert(CsvManifests.csvRecords("a,\"\"") === Seq((0L, IndexedSeq("a", ""))))
    assert(CsvManifests.csvRecords("\"\"") === Seq((0L, IndexedSeq(""))))
    assert(CsvManifests.csvRecords("a,") === Seq((0L, IndexedSeq("a", ""))))
    // unterminated quote: everything to EOF is one cell (pandas parity)
    assert(CsvManifests.csvRecords("\"a,b\nc") === Seq((0L, IndexedSeq("a,b\nc"))))
  }
}
