package graft

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.expressions.SpecificInternalRow
import org.apache.spark.sql.catalyst.util.HyperLogLogPlusPlusHelper
import org.apache.spark.sql.types.LongType
import org.scalatest.funsuite.AnyFunSuite

/** Drift guard for [[HllSql]]: the DuckDB oracle replays Spark's HLL++
  * from a MODEL of `HyperLogLogPlusPlusHelper` (register math, in-order
  * harmonic fold, bias kNN, branch structure) that was read from the
  * 4.1.2 bytecode. This spec re-derives the same model in Scala and
  * pins it against the REAL helper across every estimator regime — if
  * a Spark upgrade changes any step, this fails before the driver's
  * oracle run does. */
class HllSqlSpec extends AnyFunSuite {

  private val rsd = 0.02
  private val p = Math.ceil(2.0d * Math.log(1.106d / rsd) / Math.log(2.0d)).toInt
  private val m = 1 << p

  /** The oracle's model of query(): registers from hashLong(key, 42),
    * zInverse as the idx-order IEEE fold, the exact branch structure. */
  private def modelEstimate(keys: Seq[Long]): Long = {
    val regs = new Array[Int](m)
    keys.foreach { key =>
      val x = XXH64.hashLong(key, 42L)
      val idx = (x >>> (64 - p)).toInt
      val pw = java.lang.Long.numberOfLeadingZeros((x << p) | (1L << (p - 1))) + 1
      if (pw > regs(idx)) regs(idx) = pw
    }
    var zInverse = 0.0d
    var v = 0.0d
    var i = 0
    while (i < m) {
      zInverse += 1.0d / (1L << regs(i))
      if (regs(i) == 0) v += 1.0d
      i += 1
    }
    val alphaM2 = (0.7213d / (1.0d + 1.079d / m)) * m * m
    val e = alphaM2 / zInverse
    def eBiasCorrected: Double =
      if (e < 5.0d * m) e - estimateBiasModel(e) else e
    val estimate = if (v > 0) {
      val h = m * Math.log(m / v)
      if (h <= HyperLogLogPlusPlusHelper.THRESHOLDS(p - 4) || e <= 2.5d * m) h
      else eBiasCorrected
    } else eBiasCorrected
    Math.round(estimate)
  }

  /** The oracle's model of estimateBias: count(raw < e) as the binary
    * search, then the window slide, then the in-order 6-term fold. */
  private def estimateBiasModel(e: Double): Double = {
    val raws = HyperLogLogPlusPlusHelper.RAW_ESTIMATE_DATA(p - 4)
    val biases = HyperLogLogPlusPlusHelper.BIAS_DATA(p - 4)
    val n = raws.length
    val k = HyperLogLogPlusPlusHelper.K
    def dist(i: Int): Double = { val d = e - raws(i); d * d }
    val nidx = raws.count(_ < e) // no duplicates -> == binarySearch point
    var low = math.max(nidx - k + 1, 0)
    var high = math.min(low + k, n)
    while (high < n && dist(high) < dist(low)) { low += 1; high += 1 }
    var sum = 0.0d
    var i = low
    while (i < high) { sum += biases(i); i += 1 }
    sum / (high - low)
  }

  /** Spark's actual aggregate, driven through the helper directly. */
  private def sparkEstimate(keys: Seq[Long]): Long = {
    val helper = new HyperLogLogPlusPlusHelper(rsd)
    val buffer = new SpecificInternalRow(Seq.fill(helper.numWords)(LongType))
    var i = 0
    while (i < helper.numWords) { buffer.setLong(i, 0L); i += 1 }
    keys.foreach(k => helper.update(buffer, 0, k, LongType))
    helper.query(buffer, 0)
  }

  test("model == Spark across every estimator regime (linear counting, " +
    "2.5m fallback, bias-corrected, raw E)") {
    // n spans the regimes: H-branch small, threshold edge, E<=2.5m,
    // bias subtraction (E in (2.5m, 5m)), and raw E (E >= 5m)
    for (n <- Seq(1, 100, 2000, 3000, 5000, 9000, 12000, 15000, 20000,
      25000, 30000, 50000)) {
      val keys = (1 to n).map(i => i.toLong * 2654435761L % (1L << 40))
      assert(modelEstimate(keys) === sparkEstimate(keys), s"n=$n")
    }
  }

  test("generated SQL embeds the full published tables and the 4.1.2 " +
    "parameterization") {
    val sql = HllSql.approxCountDistinctSql(
      "lineitem", "l_returnflag", "l_partkey", "approx_parts", rsd)
    assert(p === 12 && m === 4096) // rsd 0.02 -> p 12, the registry row
    val nEst = HyperLogLogPlusPlusHelper.RAW_ESTIMATE_DATA(p - 4).length
    assert(sql.split("::DOUBLE\\)").length - 1 >= nEst) // 201 VALUES rows
    assert(sql.contains(s"range(0, $m)")) // full-register fold
    assert(sql.contains("list_reduce")) // in-order IEEE fold, not sum()
    assert(sql.contains(HyperLogLogPlusPlusHelper.THRESHOLDS(p - 4).toString))
  }
}
