package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench-artifact plumbing that the driver depends on: the
  * previous-round median extraction must read BOTH artifact shapes (the
  * raw BENCH_FULL.json line and the driver's escaped-"tail" wrapper), and
  * the family bucketing must cover every registered query so the compact
  * stdout line's subtotals account for the whole registry. */
class BenchFormatSpec extends AnyFunSuite {

  test("previousMedians parses a raw JSON line") {
    val raw =
      """{"metric":"total","value":9.9,"unit":"sec","queries":{"q1":0.500,"knn_ivf":2.993},"regressions":{},"sf":"x"}"""
    assert(Bench.previousMedians(raw) === Map("q1" -> 0.5, "knn_ivf" -> 2.993))
  }

  test("previousMedians parses the driver wrapper with escaped quotes") {
    val wrapped =
      """{"n":5,"rc":0,"tail":"...{\"queries\":{\"a\":1.250,\"b\":0.125},\"regressions\":{}}...","parsed":null}"""
    assert(Bench.previousMedians(wrapped) === Map("a" -> 1.25, "b" -> 0.125))
  }

  test("every registered query maps to a named family (no 'other')") {
    val unbucketed = SparkEntry.queries.keys.filter(Bench.familyOf(_) == "other")
    assert(unbucketed.isEmpty, s"unbucketed queries: $unbucketed")
  }

  test("compact headline stays within the harness tail budget") {
    // 113 query names at ~24 chars each overflowed the 2000-char tail in
    // r4/r5; the compact line carries ≤ 10 slowest + 8 core + families.
    // Worst-case synthetic render of those pieces must fit with ~500 chars
    // of summary/ingest fields to spare.
    val names = SparkEntry.queries.keys.toSeq.sortBy(-_.length).take(18)
    val qmap = names.map(n => "\"" + n + "\":99.99").mkString("{", ",", "}")
    val fams = SparkEntry.queries.keys.map(Bench.familyOf).toSet.toSeq.sorted
      .map(f => "\"" + f + "\":999.99").mkString("{", ",", "}")
    assert(qmap.length + fams.length <= 1500,
      s"headline render too large: ${qmap.length + fams.length}")
  }
}
