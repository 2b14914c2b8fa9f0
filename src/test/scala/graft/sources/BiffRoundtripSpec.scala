package graft.sources

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property roundtrip for the BIFF8/.xls reader: random cell grids
  * (ASCII + CJK strings, RK-able integers, doubles, blanks) written by the
  * test-side BIFF writer must read back cell-for-cell, in both CFB layouts
  * (mini-stream for small streams, regular FAT when padded). Pure JVM — no
  * Spark session. */
class BiffRoundtripSpec extends AnyFunSuite {

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  private val cell: Gen[String] = Gen.frequency(
    3 -> Gen.alphaNumStr.map(_.take(12)),
    2 -> Gen.listOfN(4, Gen.oneOf("風", "扇", "貨", "物", "数", "量"))
      .map(_.mkString),
    2 -> Gen.chooseNum(-500000, 500000).map(_.toString),
    1 -> Gen.chooseNum(-1000.0, 1000.0).map(d => (math.rint(d * 4) / 4).toString),
    2 -> Gen.const("")) // blank cell

  private val grid: Gen[Seq[(Long, Seq[String])]] =
    Gen.chooseNum(1, 30).flatMap { rows =>
      Gen.sequence[Seq[(Long, Seq[String])], (Long, Seq[String])](
        (0 until rows).map { r =>
          Gen.chooseNum(1, 8).flatMap(cols =>
            Gen.listOfN(cols, cell).map(cs => (r.toLong, cs: Seq[String])))
        })
    }

  test("random grids roundtrip through write+read in both CFB layouts") {
    for (seed <- 1L to 12L; pad <- Seq(false, true)) {
      val g = sample(grid, seed)
      val dir = java.nio.file.Files.createTempDirectory(s"biff_prop_$seed")
      val path = dir.resolve("t.xls")
      // alternate the CONTINUE split position: mid-character-data and
      // immediately-after-header are both legal and both must roundtrip
      BiffFixture.write(path, g, pad, contSplitAtStart = seed % 2 == 0)
      val got = Biff.grid(java.nio.file.Files.readAllBytes(path))
        .flatMap { case (ln, cs) => cs.zipWithIndex.collect {
          case (v, c) if v.nonEmpty => (ln, c) -> v } }.toMap
      val expected = g.flatMap { case (ln, cs) => cs.zipWithIndex.collect {
        case (v, c) if v.nonEmpty => (ln.toLong, c) -> normalize(v) } }.toMap
      assert(got === expected, s"seed=$seed pad=$pad")
    }
  }

  /** The writer stores exactly-roundtripping numerics as numbers; the
    * reader renders integral doubles undecorated — mirror that here. */
  private def normalize(v: String): String =
    v.toDoubleOption match {
      case Some(d) if d.toString == v || Biff.numToString(d) == v =>
        Biff.numToString(d)
      case _ => v
    }
}
