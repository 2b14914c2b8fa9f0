package graft.operators

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.{Column, DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** Runtime join filters: probe-side pre-filtering with a Bloom filter
  * built from the build side's join keys — the dynamic-filtering move of
  * every large-scale engine (Spark's own InjectRuntimeFilter, Trino's
  * dynamic filters) made available as an explicit operator.
  *
  * Why it matters at 100 TB: a shuffle join materializes and moves EVERY
  * probe-side row, including the ones no build-side key will ever match.
  * When the build side is selective (a filtered dimension), a Bloom
  * filter of its keys drops non-matching fact rows AT THE SCAN, before
  * they enter the exchange — the shuffle shrinks by the join's true
  * selectivity at the cost of kilobytes of broadcast state and one
  * codegen'd probe per row. False positives only waste a row's trip to
  * the join (correctness is untouched — the join still decides); false
  * negatives are impossible, so the filtered join equals the plain join
  * row for row.
  */
object RuntimeFilters {

  /** Serialized Bloom filter of `dim`'s `keyCol` values (integral keys).
    * One pass over the dim side; the sketch is sized by `expectedItems` /
    * `fpp` (1M keys at 1% FPP ≈ 1.2 MB — broadcast-class state). */
  def buildKeyBloom(dim: DataFrame, keyCol: String, expectedItems: Long,
                    fpp: Double): Array[Byte] = {
    val bf = dim.stat.bloomFilter(keyCol, expectedItems, fpp)
    val out = new ByteArrayOutputStream()
    bf.writeTo(out)
    out.toByteArray
  }

  /** `mightContain(filter, key)` as a codegen'd Catalyst predicate —
    * Spark's own [[BloomFilterMightContain]] over a binary literal, the
    * same expression its InjectRuntimeFilter rule plants, so the probe
    * participates in whole-stage codegen (the filter deserializes once
    * per task, not per row). */
  def bloomMightContain(filter: Array[Byte], key: Column): Column =
    GraftBridge.column(BloomFilterMightContain(
      Literal(filter), GraftBridge.expression(key.cast("long"))))

  /** Bit size of a serialized filter — for sizing assertions (a filter
    * meant for broadcast should stay megabyte-class). */
  def bloomBitSize(filter: Array[Byte]): Long =
    BloomFilter.readFrom(new ByteArrayInputStream(filter)).bitSize()

  /** Inner-join `fact` to `dim` with the probe side pre-filtered by a
    * Bloom filter of the dim keys. Column names must differ across the
    * two sides (TPC-H style `l_`/`o_` prefixes). The result is exactly
    * `fact JOIN dim` — the Bloom pass only removes rows the join would
    * drop anyway. */
  def bloomFilteredJoin(fact: DataFrame, dim: DataFrame, factKey: String,
                        dimKey: String, expectedItems: Long = 1000000L,
                        fpp: Double = 0.01): DataFrame = {
    val bytes = buildKeyBloom(dim, dimKey, expectedItems, fpp)
    fact.where(bloomMightContain(bytes, col(factKey)))
      .join(dim, col(factKey) === col(dimKey))
  }
}
