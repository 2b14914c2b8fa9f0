package graft

/** DuckDB SQL generators replaying Spark's XXH64 BIT-FOR-BIT — the hash
  * behind `xxhash64(...)`, [[org.apache.spark.sql.graft.SimHash64]],
  * [[org.apache.spark.sql.graft.ShingleHashes]] and
  * [[org.apache.spark.sql.graft.MinHashSignature]]. Promoting those
  * operators' registry rows from rows-only to exact needs the oracle to
  * compute the SAME 64-bit values, so this object emits SQL that runs
  * XXH64 in HUGEINT arithmetic mod 2^64 (the house 64-bit-wrap
  * discipline: 128-bit-safe multiply decomposition, rotl as shift+carry,
  * DuckDB's native `xor` on HUGEINT, bytes from `hex(encode(s))`).
  *
  * Structure mirrors Spark's `XXH64.hashUnsafeBytes` exactly (validated
  * against pyspark's `xxhash64` on short, 8/4/1-byte-tail and >=32-byte
  * lane-path inputs before porting): phase 0 = 32-byte lane stripes
  * (inputs >= 32 bytes), phase 1 = 8-byte tail chunks, phase 2 = one
  * 4-byte chunk, phase 3 = single bytes, then the avalanche in the
  * output projection. Little-endian chunk assembly matches
  * `Platform.getLong` on this (and any production x86/ARM) platform.
  *
  * All emitted expressions keep each intermediate in [0, 2^64) and every
  * multiply operand decomposition below 2^96 — inside HUGEINT's signed
  * 128-bit range. Layered subselects keep each value computed ONCE (a
  * naive nested expansion is exponential in chain depth). */
object XxhSql {

  val U64 = "18446744073709551616"
  private val U32 = "4294967296"
  // XXH64 primes, as unsigned decimal literals
  val P1 = "11400714785074694791" // 0x9E3779B185EBCA87
  val P2 = "14029467366897019727" // 0xC2B2AE3D27D4EB4F
  val P3 = "1609587929392839161"  // 0x165667B19E3779F9
  val P4 = "9650029242287828579"  // 0x85EBCA77C2B2AE63
  val P5 = "2870177450012600261"  // 0x27D4EB2F165667C5

  /** (a * b) mod 2^64 without overflowing HUGEINT: 32-bit half products. */
  def mul(a: String, b: String): String =
    s"(((($a) % $U32) * (($b) % $U32)" +
      s" + (((($a) % $U32) * (($b) // $U32)" +
      s" + (($a) // $U32) * (($b) % $U32)) % $U32) * $U32)" +
      s" % $U64)"

  /** rotate-left by r on the 64-bit value (two disjoint-bit terms). */
  def rotl(x: String, r: Int): String =
    s"(((($x) * ${1L << r}) % $U64) + (($x) // ${BigInt(1) << (64 - r)}))"

  /** logical shift right by k. */
  def shr(x: String, k: Int): String = s"(($x) // ${BigInt(1) << k})"

  /** the signed-BIGINT reinterpretation of an unsigned HUGEINT value. */
  def signed(u: String): String =
    s"CAST(CASE WHEN ($u) >= 9223372036854775808 THEN ($u) - $U64" +
      s" ELSE ($u) END AS BIGINT)"

  /** the unsigned HUGEINT form of a signed BIGINT column. */
  def unsigned(s0: String): String =
    s"(CAST(($s0) AS HUGEINT) + CASE WHEN ($s0) < 0 THEN CAST($U64 AS HUGEINT) ELSE 0 END)"

  private def byte(hx: String, p: String): String =
    s"CAST(concat('0x', substr($hx, CAST(2*($p)+1 AS BIGINT), 2)) AS BIGINT)"

  /** little-endian n-byte chunk of the hex transcription at byte offset. */
  private def le(hx: String, off: String, nBytes: Int): String =
    (0 until nBytes).map { j =>
      s"CAST(${byte(hx, s"($off)+$j")} AS HUGEINT) * ${BigInt(1) << (8 * j)}"
    }.mkString("(", " + ", ")")

  /** XXH64 avalanche (fmix) applied to column `h` of `from`, emitted as
    * layered projections; result column `out`, other columns kept. */
  def fmix(from: String, h: String, out: String, tag: String): String =
    s"""(SELECT * EXCLUDE (_f2$tag), xor(_f2$tag, ${shr(s"_f2$tag", 32)}) AS $out FROM
       |(SELECT * EXCLUDE (_f1$tag), ${mul(s"xor(_f1$tag, ${shr(s"_f1$tag", 29)})", P3)} AS _f2$tag FROM
       |(SELECT *, ${mul(s"xor(($h), ${shr(h, 33)})", P2)} AS _f1$tag FROM $from af$tag) bf$tag) cf$tag)""".stripMargin

  /** `XXH64.hashLong(l, seed)` as layered projections over `from`:
    * result column `out` (unsigned HUGEINT), other columns kept. `tag`
    * disambiguates the internal column names when chained. */
  def hashLong(from: String, l: String, seed: String, out: String,
               tag: String): String = {
    val pre =
      s"""(SELECT * EXCLUDE (_h1$tag), (${mul(rotl(s"_h1$tag", 27), P1)} + $P4) % $U64 AS _h2$tag FROM
         |(SELECT * EXCLUDE (_k1$tag), xor((($seed) + $P5 + 8) % $U64, _k1$tag) AS _h1$tag FROM
         |(SELECT *, ${mul(rotl(mul(l, P2), 31), P1)} AS _k1$tag FROM $from al$tag) bl$tag) cl$tag)""".stripMargin
    fmix(pre, s"_h2$tag", out, tag) + s" /* hashLong $tag */"
  }

  /** `XXH64.hashInt(i, seed)` computed Scala-side — the ONE generator
    * that feeds both the MinHashSignature kernel's salts and the oracle
    * literals, so they can never drift. */
  def hashInt(i: Int, seed: Long): Long =
    org.apache.spark.sql.catalyst.expressions.XXH64.hashInt(i, seed)

  /** Recursive-CTE block computing `xxhash64(s, seed)` for every row of
    * `inp`(key, s): emits CTEs `{p}xb`, `{p}xx` and `{p}xxout`(key, h)
    * with h the UNSIGNED HUGEINT hash (wrap with [[signed]] for Spark's
    * long). `seed` may reference columns of `inp` (a per-row seed — the
    * LSH bucket hash and the rolling fold need one); `prefix` renames
    * the emitted CTEs so two hash blocks can share one WITH. Append
    * after a `WITH RECURSIVE` prefix. Recursion depth per row =
    * stripes + tail chunks + phase transitions (≤ len/8 + 4). */
  def stringHashCtes(inp: String,
                     seed: String = "CAST(42 AS HUGEINT)",
                     prefix: String = ""): String = {
    def mergeLayer(prev: String, v: String): String = {
      val inner = mul(rotl(mul(v, P2), 31), P1)
      s"(${mul(s"xor($prev, $inner)", P1)} + $P4) % $U64"
    }
    val p = prefix
    s"""${p}xb AS (SELECT key, s, ($seed) AS sd, hex(encode(s)) AS hx,
       |         CAST(octet_length(encode(s)) AS HUGEINT) AS n FROM $inp),
       |${p}xx AS (
       |  SELECT key, n, hx,
       |    CASE WHEN n >= 32 THEN 0 ELSE 1 END AS phase,
       |    CAST(0 AS HUGEINT) AS off,
       |    CASE WHEN n >= 32 THEN CAST(0 AS HUGEINT)
       |         ELSE (sd + $P5 + n) % $U64 END AS h,
       |    (sd + $P1 + $P2) % $U64 AS v1,
       |    (sd + $P2) % $U64 AS v2,
       |    sd % $U64 AS v3,
       |    (sd + $U64 - $P1) % $U64 AS v4
       |  FROM ${p}xb
       |  UNION ALL
       |  SELECT key, n, hx,
       |    CASE
       |      WHEN phase = 0 AND off + 64 <= n THEN 0
       |      WHEN phase = 0 THEN 1
       |      WHEN phase = 1 AND off + 8 <= n THEN 1
       |      WHEN phase = 1 THEN 2
       |      WHEN phase = 2 THEN 3
       |      WHEN phase = 3 AND off + 1 < n THEN 3
       |      ELSE 4
       |    END AS phase,
       |    CASE
       |      WHEN phase = 0 THEN off + 32
       |      WHEN phase = 1 AND off + 8 <= n THEN off + 8
       |      WHEN phase = 2 AND off + 4 <= n THEN off + 4
       |      WHEN phase = 3 THEN off + 1
       |      ELSE off
       |    END AS off,
       |    CASE
       |      WHEN phase = 0 AND off + 64 <= n THEN h
       |      WHEN phase = 0 THEN (hm4 + n) % $U64
       |      WHEN phase = 1 AND off + 8 <= n THEN h8
       |      WHEN phase = 2 AND off + 4 <= n THEN h4
       |      WHEN phase = 3 AND off < n THEN h1
       |      ELSE h
       |    END AS h,
       |    nv1 AS v1, nv2 AS v2, nv3 AS v3, nv4 AS v4
       |  FROM (
       |    SELECT *, ${mergeLayer("hm3", "nv4")} AS hm4 FROM (
       |    SELECT *, ${mergeLayer("hm2", "nv3")} AS hm3 FROM (
       |    SELECT *, ${mergeLayer("hm1", "nv2")} AS hm2 FROM (
       |    SELECT *, ${mergeLayer("hm0", "nv1")} AS hm1 FROM (
       |    SELECT *,
       |      (${rotl("nv1", 1)} + ${rotl("nv2", 7)} + ${rotl("nv3", 12)} + ${rotl("nv4", 18)}) % $U64 AS hm0
       |    FROM (
       |      SELECT *,
       |        CASE WHEN phase = 0 THEN ${mul(rotl(s"(v1 + ${mul("k0a", P2)}) % $U64", 31), P1)} ELSE v1 END AS nv1,
       |        CASE WHEN phase = 0 THEN ${mul(rotl(s"(v2 + ${mul("k0b", P2)}) % $U64", 31), P1)} ELSE v2 END AS nv2,
       |        CASE WHEN phase = 0 THEN ${mul(rotl(s"(v3 + ${mul("k0c", P2)}) % $U64", 31), P1)} ELSE v3 END AS nv3,
       |        CASE WHEN phase = 0 THEN ${mul(rotl(s"(v4 + ${mul("k0d", P2)}) % $U64", 31), P1)} ELSE v4 END AS nv4,
       |        (${mul(rotl("h8x", 27), P1)} + $P4) % $U64 AS h8,
       |        (${mul(rotl("h4x", 23), P2)} + $P3) % $U64 AS h4,
       |        ${mul(rotl("h1x", 11), P1)} AS h1
       |      FROM (
       |        SELECT *,
       |          CASE WHEN phase = 0 THEN ${le("hx", "off", 8)} ELSE CAST(0 AS HUGEINT) END AS k0a,
       |          CASE WHEN phase = 0 THEN ${le("hx", "off+8", 8)} ELSE CAST(0 AS HUGEINT) END AS k0b,
       |          CASE WHEN phase = 0 THEN ${le("hx", "off+16", 8)} ELSE CAST(0 AS HUGEINT) END AS k0c,
       |          CASE WHEN phase = 0 THEN ${le("hx", "off+24", 8)} ELSE CAST(0 AS HUGEINT) END AS k0d,
       |          CASE WHEN phase = 1 AND off + 8 <= n
       |               THEN xor(h, ${mul(rotl(mul(le("hx", "off", 8), P2), 31), P1)})
       |               ELSE CAST(0 AS HUGEINT) END AS h8x,
       |          CASE WHEN phase = 2 AND off + 4 <= n
       |               THEN xor(h, ${mul(le("hx", "off", 4), P1)})
       |               ELSE CAST(0 AS HUGEINT) END AS h4x,
       |          CASE WHEN phase = 3 AND off < n
       |               THEN xor(h, (CAST(${byte("hx", "off")} AS HUGEINT) * $P5) % $U64)
       |               ELSE CAST(0 AS HUGEINT) END AS h1x
       |        FROM ${p}xx WHERE phase < 4
       |      ) la
       |    ) lb
       |    ) lm0
       |    ) lm1
       |    ) lm2
       |    ) lm3
       |  ) lc
       |),
       |${p}xxout AS (
       |  SELECT key, h FROM ${fmix(s"(SELECT key, h AS h0 FROM ${p}xx WHERE phase = 4)", "h0", "h", "fz")} zz
       |)""".stripMargin
  }
}
