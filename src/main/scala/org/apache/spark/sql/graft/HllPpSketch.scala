package org.apache.spark.sql.graft

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, SpecificInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.HyperLogLogPlusPlusHelper
import org.apache.spark.sql.types._

/** At-rest mergeable HLL++ register state — Spark's OWN
  * `approx_count_distinct` internals (`HyperLogLogPlusPlusHelper`)
  * exposed as a persistable sketch column, the r17 completion of the
  * sketch tier: the DataSketches HLL table (`Sketches.sketchTable`)
  * carries the same one-fact-scan / kilobyte-rollup contract but its
  * coupon/HIP/KxQ estimators cannot be SQL-replayed (interpolated
  * non-integer estimates even at n=400; float accumulators updated in
  * merge order), so those registry rows are rows-only. Spark's native
  * HLL++ is the opposite on every count:
  *
  *  - registers are `max(rank)` per slot over `XXH64.hashLong(v, 42)` —
  *    a pure, order-insensitive function of the input SET, so the
  *    serialized words are RUN-IDENTICAL and the disjoint-batch merge
  *    law is EXACT BYTE EQUALITY (the CMS discipline, not just an
  *    estimate-level bound);
  *  - the estimator is a fixed IEEE op sequence replayed bit-for-bit in
  *    DuckDB by [[graft.HllSql]] — so the at-rest rollup row
  *    (`a_hllpp_rollup`) carries a FULL HASH ORACLE, which no
  *    DataSketches-backed sketch table can;
  *  - rolling up a subset of keys is the same `max` per slot, so
  *    merge-then-estimate over per-(k1,k2) sketches equals the direct
  *    `approx_count_distinct` over k1 alone (pinned in `SketchesSpec`).
  *
  * Buffer is the live packed-register row (`numWords` longs, 6-bit
  * registers, 10 per word — the helper's own layout), serialized only at
  * shuffle/spill boundaries as little-endian words. */
object HllPpWords {
  /** Helpers are tiny (p, alphaM2, table refs) — memoize per rsd. */
  private val cache = new java.util.concurrent.ConcurrentHashMap[
    java.lang.Double, HyperLogLogPlusPlusHelper]()
  def helper(rsd: Double): HyperLogLogPlusPlusHelper =
    cache.computeIfAbsent(rsd, r => new HyperLogLogPlusPlusHelper(r))

  def newBuffer(rsd: Double): SpecificInternalRow = {
    val h = helper(rsd)
    val row = new SpecificInternalRow(Seq.fill(h.numWords)(LongType))
    var i = 0
    while (i < h.numWords) { row.setLong(i, 0L); i += 1 }
    row
  }

  def serialize(rsd: Double, row: InternalRow): Array[Byte] = {
    val n = helper(rsd).numWords
    val bb = ByteBuffer.allocate(8 * n).order(ByteOrder.LITTLE_ENDIAN)
    var i = 0
    while (i < n) { bb.putLong(row.getLong(i)); i += 1 }
    bb.array()
  }

  def deserialize(rsd: Double, bytes: Array[Byte]): SpecificInternalRow = {
    val h = helper(rsd)
    require(bytes.length == 8 * h.numWords,
      s"hllpp sketch shape mismatch: ${bytes.length} bytes, " +
        s"want ${8 * h.numWords} (rsd $rsd)")
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val row = new SpecificInternalRow(Seq.fill(h.numWords)(LongType))
    var i = 0
    while (i < h.numWords) { row.setLong(i, bb.getLong()); i += 1 }
    row
  }
}

/** Per-group HLL++ register build over LONG keys (null keys skipped —
  * the `approx_count_distinct` convention). */
case class HllPpSketchAgg(
    child: Expression,
    relativeSD: Double,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SpecificInternalRow]
  with ImplicitCastInputTypes with UnaryLike[Expression] {

  override def prettyName: String = "hllpp_sketch_agg"
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  @transient private lazy val h = HllPpWords.helper(relativeSD)

  override def createAggregationBuffer(): SpecificInternalRow =
    HllPpWords.newBuffer(relativeSD)

  override def update(buffer: SpecificInternalRow,
                      input: InternalRow): SpecificInternalRow = {
    val v = child.eval(input)
    if (v != null) h.update(buffer, 0, v, LongType)
    buffer
  }

  override def merge(buffer: SpecificInternalRow,
                     other: SpecificInternalRow): SpecificInternalRow = {
    h.merge(buffer, other, 0, 0)
    buffer
  }

  override def eval(buffer: SpecificInternalRow): Any =
    HllPpWords.serialize(relativeSD, buffer)
  override def serialize(buffer: SpecificInternalRow): Array[Byte] =
    HllPpWords.serialize(relativeSD, buffer)
  override def deserialize(bytes: Array[Byte]): SpecificInternalRow =
    HllPpWords.deserialize(relativeSD, bytes)

  override def withNewMutableAggBufferOffset(offset: Int): HllPpSketchAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): HllPpSketchAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(c: Expression): HllPpSketchAgg =
    copy(child = c)
}

/** Register-wise max merge of serialized HLL++ sketches (the rollup
  * step): EXACT — merging disjoint batches yields byte-identical words
  * to one whole-input build (pinned in `SketchesSpec`). */
case class HllPpMergeAgg(
    child: Expression,
    relativeSD: Double,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SpecificInternalRow]
  with UnaryLike[Expression] {

  override def prettyName: String = "hllpp_merge_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hllpp_merge_agg needs a binary sketch column, got ${other.catalogString}")
  }

  @transient private lazy val h = HllPpWords.helper(relativeSD)

  override def createAggregationBuffer(): SpecificInternalRow =
    HllPpWords.newBuffer(relativeSD)

  override def update(buffer: SpecificInternalRow,
                      input: InternalRow): SpecificInternalRow = {
    val v = child.eval(input)
    if (v != null) h.merge(buffer,
      HllPpWords.deserialize(relativeSD, v.asInstanceOf[Array[Byte]]), 0, 0)
    buffer
  }

  override def merge(buffer: SpecificInternalRow,
                     other: SpecificInternalRow): SpecificInternalRow = {
    h.merge(buffer, other, 0, 0)
    buffer
  }

  override def eval(buffer: SpecificInternalRow): Any =
    HllPpWords.serialize(relativeSD, buffer)
  override def serialize(buffer: SpecificInternalRow): Array[Byte] =
    HllPpWords.serialize(relativeSD, buffer)
  override def deserialize(bytes: Array[Byte]): SpecificInternalRow =
    HllPpWords.deserialize(relativeSD, bytes)

  override def withNewMutableAggBufferOffset(offset: Int): HllPpMergeAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): HllPpMergeAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(c: Expression): HllPpMergeAgg =
    copy(child = c)
}

/** Cardinality estimate from a serialized HLL++ register sketch — the
  * exact `HyperLogLogPlusPlusHelper.query` evaluation (the one
  * [[graft.HllSql]] replays in DuckDB). Sketch readers touch kilobytes
  * off the hot path — interpreted eval is the right cost. */
case class HllPpEstimate(child: Expression, relativeSD: Double)
  extends UnaryExpression with CodegenFallback {

  override def prettyName: String = "hllpp_estimate"
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hllpp_estimate needs a binary sketch column, got ${other.catalogString}")
  }

  override def nullSafeEval(sketch: Any): Any = {
    val h = HllPpWords.helper(relativeSD)
    h.query(HllPpWords.deserialize(relativeSD,
      sketch.asInstanceOf[Array[Byte]]), 0)
  }

  override protected def withNewChildInternal(c: Expression): HllPpEstimate =
    copy(child = c)
}
