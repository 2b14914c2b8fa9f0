package graft

import org.apache.spark.sql.catalyst.util.HyperLogLogPlusPlusHelper

/** Spark's native HLL++ (`approx_count_distinct`) replayed bit-for-bit
  * in DuckDB SQL — the r17 sibling of [[XxhSql]]'s XXH64 replay.
  *
  * Everything in the aggregate is deterministic and order-insensitive
  * up to the registers: `register[idx] = max(rank)` over
  * `XXH64.hashLong(key, 42)` with `idx` the top `p` hash bits and
  * `rank = nlz((hash << p) | 2^(p-1)) + 1` — so registers rebuild
  * exactly from the DISTINCT keys via the [[XxhSql.hashLong]] closed
  * form (`rank = 65 - p - bitlen(hash mod 2^(64-p))`, `bin()` giving
  * the bit length). The estimator is floating-point but replayable
  * because every step is a fixed IEEE-754 op sequence (bytecode-read
  * from `HyperLogLogPlusPlusHelper.query`, Spark 4.1.2):
  *
  *  - `zInverse`: the harmonic sum is folded register-by-register in
  *    index order; each term `1/2^M` is an exact power of two but the
  *    RUNNING SUM rounds (4096 + 2^-53 needs 65 significand bits), so
  *    the oracle replays the same left fold via `list_reduce` over a
  *    `list(... ORDER BY idx)` — DuckDB's `+` is the same
  *    correctly-rounded IEEE add, so the fold is bit-identical.
  *  - linear counting `H = m * ln(m/V)`: one libm-vs-Math.log call —
  *    agreement is checked empirically (three estimator regimes
  *    validated against pyspark 4.1.2 at n = 2k/9k/15k/30k; the final
  *    `Math.round` gives ~1e-13 slack before a 1-ulp `ln` drift could
  *    flip a count).
  *  - bias correction: `E - estimateBias(E)` for `E < 5m`, where
  *    `estimateBias` is the K=6 nearest-neighbour average over the
  *    published HLL++ interpolation tables. The tables are read FROM
  *    SPARK'S OWN `HyperLogLogPlusPlusHelper` public accessors at
  *    SQL-generation time (no transcription to drift); the
  *    binary-search + window-slide is replayed as `count(raw < E)`
  *    (no duplicates in the tables) plus the first index where the
  *    slide's `dist(high) < dist(low)` invariant fails.
  *  - branch structure: `if (V > 0 && (H <= THRESHOLDS(p-4) ||
  *    E <= 2.5m)) H else EBiasCorrected`, then `Math.round` =
  *    `floor(x + 0.5)` — all replayed as the same CASE arms.
  *
  * Scale note: the oracle hashes DISTINCT keys only and touches
  * `m = 2^p` register slots per group — the register rebuild is one
  * hash-aggregate, the fold one `m`-element list per group.
  *
  * Generic-helper edges (r17 review): keys reach the mod-2^64 machine
  * in UNSIGNED form so negative longs hash like Spark's signed bit
  * pattern; groups enumerate from the SOURCE (not the hashed rows) so
  * an all-NULL-key group still emits estimate 0 the way Spark's groupBy
  * does; group joins are null-safe (`IS NOT DISTINCT FROM`) so a NULL
  * group key aggregates its rows instead of losing them. */
object HllSql {

  /** DuckDB SQL computing `approx_count_distinct(keyExpr, rsd)` per
    * `groupCol` of `table`, exactly as Spark 4.1.2 evaluates it.
    * Output columns: `groupCol`, `outCol` (BIGINT). */
  def approxCountDistinctSql(table: String, groupCol: String,
                             keyExpr: String, outCol: String,
                             rsd: Double): String = {
    // the helper's own parameterization (ctor bytecode): p from rsd,
    // m = 2^p, alphaM2 with the identical IEEE op order
    val p = Math.ceil(2.0d * Math.log(1.106d / rsd) / Math.log(2.0d)).toInt
    require(p >= 4 && p < 19, s"oracle replay needs 4 <= p < 19, got $p")
    val m = 1 << p
    val alphaM2 = (0.7213d / (1.0d + 1.079d / m)) * m * m
    val threshold = HyperLogLogPlusPlusHelper.THRESHOLDS(p - 4)
    val raws = HyperLogLogPlusPlusHelper.RAW_ESTIMATE_DATA(p - 4)
    val biases = HyperLogLogPlusPlusHelper.BIAS_DATA(p - 4)
    require(raws.length == biases.length)
    val nEst = raws.length
    val k = HyperLogLogPlusPlusHelper.K // 6
    val bt = raws.indices.map { i =>
      s"(${i}, ${raws(i)}::DOUBLE, ${biases(i)}::DOUBLE)"
    }.mkString(",\n    ")
    val pow64mp = BigInt(1) << (64 - p) // idx = h // 2^(64-p)
    val maxRank = 64 - p + 1

    // XXH64.hashLong(key, 42) over the distinct (group, key) pairs.
    // Spark hashes the signed two's-complement bit pattern, so negative
    // keys must reach the mod-2^64 arithmetic in UNSIGNED form
    // (XxhSql.unsigned); current registry keys are non-negative, but the
    // helper is the GENERIC approx_count_distinct replay.
    val hashed = XxhSql.hashLong(
      s"""(SELECT DISTINCT $groupCol AS g,
         |     ${XxhSql.unsigned(s"CAST(($keyExpr) AS BIGINT)")} AS k
         |   FROM $table WHERE ($keyExpr) IS NOT NULL)""".stripMargin,
      "k", "CAST(42 AS HUGEINT)", "h", "ad")

    s"""WITH hh AS ($hashed),
       |rg AS MATERIALIZED (
       |  SELECT g, CAST(h // $pow64mp AS BIGINT) AS idx,
       |    MAX(CASE WHEN h % $pow64mp = 0 THEN $maxRank
       |             ELSE $maxRank - length(bin(CAST(h % $pow64mp AS BIGINT)))
       |        END) AS mreg
       |  FROM hh GROUP BY 1, 2),
       |-- every group of the source, not just groups with non-null keys:
       |-- an all-NULL group keeps zero registers and must still emit
       |-- (V = m -> H = m*ln(1) = 0 -> estimate 0, Spark's behavior)
       |gs AS (SELECT DISTINCT $groupCol AS g FROM $table),
       |vv AS (
       |  SELECT gs.g, $m - count(rg.idx) AS v
       |  FROM gs LEFT JOIN rg ON rg.g IS NOT DISTINCT FROM gs.g
       |  GROUP BY 1),
       |zf AS (
       |  SELECT g, list_reduce(list(t ORDER BY i), (a, b) -> a + b) AS zinv
       |  FROM (
       |    SELECT gs.g, ii.i,
       |      COALESCE(1.0::DOUBLE / CAST(1::BIGINT << rg.mreg AS DOUBLE),
       |               1.0::DOUBLE) AS t
       |    FROM gs CROSS JOIN range(0, $m) ii(i)
       |    LEFT JOIN rg ON rg.g IS NOT DISTINCT FROM gs.g
       |      AND rg.idx = ii.i) s
       |  GROUP BY 1),
       |bt(i, raw, bias) AS (VALUES
       |    $bt),
       |ee AS (
       |  SELECT vv.g, CAST(vv.v AS DOUBLE) AS v, $alphaM2::DOUBLE / zf.zinv AS e
       |  FROM vv JOIN zf ON vv.g IS NOT DISTINCT FROM zf.g),
       |hc AS (
       |  SELECT g, v, e,
       |    CASE WHEN v > 0 THEN $m.0 * ln($m.0 / v) END AS hval
       |  FROM ee),
       |nn AS (
       |  SELECT hc.*, greatest(CAST(
       |      (SELECT count(*) FROM bt WHERE bt.raw < hc.e) AS BIGINT) - ${k - 1},
       |      0) AS low0 FROM hc),
       |sl AS (
       |  SELECT nn.*, (
       |    SELECT min(t.L) FROM range(0, $nEst) t(L)
       |    WHERE t.L >= nn.low0 AND (t.L + $k >= $nEst
       |       OR (SELECT (nn.e - raw)*(nn.e - raw) FROM bt WHERE i = t.L + $k) >=
       |          (SELECT (nn.e - raw)*(nn.e - raw) FROM bt WHERE i = t.L))
       |  ) AS lo FROM nn),
       |bb AS (
       |  SELECT sl.*, (
       |    SELECT list_reduce(list(bias ORDER BY i), (a, b) -> a + b)
       |    FROM bt WHERE i >= sl.lo AND i < least(sl.lo + $k, $nEst)
       |  ) / (least(sl.lo + $k, $nEst) - sl.lo) AS bias_avg FROM sl),
       |fin AS (
       |  SELECT g,
       |    CASE WHEN v > 0 AND (hval <= $threshold::DOUBLE
       |                         OR e <= 2.5 * $m.0) THEN hval
       |         WHEN e < 5.0 * $m.0 THEN e - bias_avg
       |         ELSE e END AS est
       |  FROM bb)
       |SELECT g AS $groupCol, CAST(floor(est + 0.5) AS BIGINT) AS $outCol
       |FROM fin""".stripMargin
  }
}
