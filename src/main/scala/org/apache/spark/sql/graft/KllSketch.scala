package org.apache.spark.sql.graft

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** Mergeable QUANTILE sketch state (Apache DataSketches KLL, the
  * quantile sibling of Spark 4's built-in `hll_sketch_agg` family, which
  * covers only distinct counts): per-group `KllDoublesSketch` built as a
  * [[TypedImperativeAggregate]] — the buffer is the live heap sketch,
  * serialized only at shuffle/spill boundaries, so per-row cost is one
  * `update(double)`, never a deserialize.
  *
  * The 100 TB shape mirrors `graft.operators.Sketches`: scan the fact
  * table once at sketch-build time, persist kilobyte sketches per group,
  * then answer any percentile question over any SUBSET of the group keys
  * by merging sketches ([[KllMergeAgg]]) — no fact rescan. KLL guarantees
  * a normalized RANK error ε(k) (k=200 → ~1.65% at 99% confidence) that
  * is preserved under merge; `n` is preserved EXACTLY under merge (both
  * laws pinned in `SketchesSpec`). Compaction uses randomized offsets, so
  * serialized bytes are not run-deterministic — estimates stay inside ε
  * regardless; the exact twin for small scale is `percentile_cont`
  * (green as `a_exact_percentiles`). */
case class KllSketchAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch]
  with ImplicitCastInputTypes with UnaryLike[Expression] {

  override def prettyName: String = "kll_sketch_agg"
  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buffer: KllDoublesSketch,
                      input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.asInstanceOf[Double])
    buffer
  }

  override def merge(buffer: KllDoublesSketch,
                     other: KllDoublesSketch): KllDoublesSketch = {
    buffer.merge(other)
    buffer
  }

  /** Empty sketches serialize fine; scalar readers return null on them. */
  override def eval(buffer: KllDoublesSketch): Any = buffer.toByteArray

  override def serialize(buffer: KllDoublesSketch): Array[Byte] =
    buffer.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(offset: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KllSketchAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(c: Expression): KllSketchAgg =
    copy(child = c)
}

/** Union-merge of serialized KLL sketches (the rollup step): input is the
  * binary column [[KllSketchAgg]] wrote; output is one merged sketch.
  * The merge result's k is min(buffer k, inputs' k) — pass the same `k`
  * the sketches were built with to avoid silent precision loss. */
case class KllMergeAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch]
  with UnaryLike[Expression] {

  override def prettyName: String = "kll_merge_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"kll_merge_agg needs a binary sketch column, got ${other.catalogString}")
  }

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buffer: KllDoublesSketch,
                      input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) {
      buffer.merge(
        KllDoublesSketch.heapify(Memory.wrap(v.asInstanceOf[Array[Byte]])))
    }
    buffer
  }

  override def merge(buffer: KllDoublesSketch,
                     other: KllDoublesSketch): KllDoublesSketch = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: KllDoublesSketch): Any = buffer.toByteArray

  override def serialize(buffer: KllDoublesSketch): Array[Byte] =
    buffer.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(offset: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KllMergeAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(c: Expression): KllMergeAgg =
    copy(child = c)
}

private[graft] object KllScalar {
  def heap(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))
}

/** Quantile VALUE at normalized rank `rank` ∈ [0,1] from a serialized KLL
  * sketch (INCLUSIVE search, the DataSketches default). Null on an empty
  * sketch. Off the hot path by design — sketch readers touch kilobytes —
  * so interpreted eval ([[CodegenFallback]]) is the right cost. */
case class KllQuantile(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def prettyName: String = "kll_quantile"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, DoubleType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"kll_quantile needs (binary, double), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override def nullSafeEval(sketch: Any, rank: Any): Any = {
    val s = KllScalar.heap(sketch.asInstanceOf[Array[Byte]])
    if (s.isEmpty) null
    else s.getQuantile(rank.asInstanceOf[Double],
      QuantileSearchCriteria.INCLUSIVE)
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): KllQuantile = copy(left = l, right = r)
}

/** Normalized rank ∈ [0,1] of `value` in a serialized KLL sketch
  * (INCLUSIVE). Null on an empty sketch. */
case class KllRank(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def prettyName: String = "kll_rank"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, DoubleType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"kll_rank needs (binary, double), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override def nullSafeEval(sketch: Any, value: Any): Any = {
    val s = KllScalar.heap(sketch.asInstanceOf[Array[Byte]])
    if (s.isEmpty) null
    else s.getRank(value.asInstanceOf[Double],
      QuantileSearchCriteria.INCLUSIVE)
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): KllRank = copy(left = l, right = r)
}

/** Exact stream length `n` recorded by a serialized KLL sketch — exact
  * under any merge tree (the deterministic conservation law pinned in
  * `SketchesSpec`). */
case class KllSketchN(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def prettyName: String = "kll_sketch_n"
  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"kll_sketch_n needs a binary sketch column, got ${other.catalogString}")
  }

  override def nullSafeEval(sketch: Any): Any =
    KllScalar.heap(sketch.asInstanceOf[Array[Byte]]).getN

  override protected def withNewChildInternal(c: Expression): KllSketchN =
    copy(child = c)
}
