package org.apache.spark.sql.graft

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{CompactSketch, SetOperation, Sketch, Sketches, Union}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** Mergeable SET-OPERATION sketch state (Apache DataSketches Theta — the
  * set-algebra sibling of the HLL family): per-group theta sketches built
  * as a [[TypedImperativeAggregate]] whose buffer is a live heap `Union`,
  * serialized only at shuffle/spill boundaries.
  *
  * Why theta when `hll_sketch_agg` already exists: HLL sketches union but
  * CANNOT intersect or difference — "users who did A AND B" / "users who
  * did A but NOT B" over at-rest per-segment sketches is exactly what
  * theta's `Intersection`/`AnotB` set operators provide. The 100 TB
  * pattern mirrors `graft.operators.Sketches`: scan the fact table once,
  * persist one kilobyte sketch per segment, then answer any
  * union/intersection/difference cardinality over segments from sketches
  * alone — an overlap matrix over S segments costs S² kilobyte set-ops,
  * never S² fact-table semi-joins.
  *
  * Determinism contract: theta retains the k smallest hashes of the input
  * SET under a fixed seed — the retained set is order- and
  * duplicate-independent, so results are reproducible run-to-run (unlike
  * KLL's randomized compaction). Below k distinct values the sketch is in
  * EXACT mode: estimates (including intersection/difference results) are
  * exactly right, which `SketchesSpec` pins against `COUNT(DISTINCT)`;
  * above k the relative standard error is ~1/sqrt(k) (k=4096 → ~1.6%).
  * The exact-mode contract is strong enough to ORACLE: below k the
  * overlap matrix is hash-verified against the exact pair matrix in
  * DuckDB (r17); the estimation-mode error law stays spec-pinned. */
case class ThetaSketchAgg(
    child: Expression,
    lgK: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union]
  with ImplicitCastInputTypes with UnaryLike[Expression] {

  override def prettyName: String = "theta_sketch_agg"
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setNominalEntries(1 << lgK).buildUnion()

  override def update(buffer: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: Union, other: Union): Union = {
    buffer.union(other.getResult)
    buffer
  }

  /** Compact ordered form — canonical at-rest bytes. */
  override def eval(buffer: Union): Any = buffer.getResult.toByteArray

  override def serialize(buffer: Union): Array[Byte] =
    buffer.getResult.toByteArray
  override def deserialize(bytes: Array[Byte]): Union = {
    val u = SetOperation.builder().setNominalEntries(1 << lgK).buildUnion()
    u.union(Memory.wrap(bytes))
    u
  }

  override def withNewMutableAggBufferOffset(offset: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(c: Expression): ThetaSketchAgg =
    copy(child = c)
}

/** Union-merge of serialized theta sketches (the rollup step): input is
  * the binary column [[ThetaSketchAgg]] wrote; output is one merged
  * compact sketch. Theta unions adapt to the inputs' k — pass the same
  * `lgK` the sketches were built with. */
case class ThetaUnionAgg(
    child: Expression,
    lgK: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union]
  with UnaryLike[Expression] {

  override def prettyName: String = "theta_union_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"theta_union_agg needs a binary sketch column, got ${other.catalogString}")
  }

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setNominalEntries(1 << lgK).buildUnion()

  override def update(buffer: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) buffer.union(Memory.wrap(v.asInstanceOf[Array[Byte]]))
    buffer
  }

  override def merge(buffer: Union, other: Union): Union = {
    buffer.union(other.getResult)
    buffer
  }

  override def eval(buffer: Union): Any = buffer.getResult.toByteArray

  override def serialize(buffer: Union): Array[Byte] =
    buffer.getResult.toByteArray
  override def deserialize(bytes: Array[Byte]): Union = {
    val u = SetOperation.builder().setNominalEntries(1 << lgK).buildUnion()
    u.union(Memory.wrap(bytes))
    u
  }

  override def withNewMutableAggBufferOffset(offset: Int): ThetaUnionAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): ThetaUnionAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(c: Expression): ThetaUnionAgg =
    copy(child = c)
}

private[graft] object ThetaScalar {
  def heap(bytes: Array[Byte]): Sketch =
    Sketches.heapifySketch(Memory.wrap(bytes))
}

/** Distinct-count estimate from a serialized theta sketch. Exact while the
  * sketch is in exact mode (fewer than k distinct inputs — which includes
  * every `Intersection`/`AnotB` result of exact-mode operands). Sketch
  * readers are off the hot path (kilobytes per group), so interpreted
  * eval ([[CodegenFallback]]) is the right cost. */
case class ThetaEstimate(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def prettyName: String = "theta_estimate"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"theta_estimate needs a binary sketch column, got ${other.catalogString}")
  }

  override def nullSafeEval(sketch: Any): Any =
    ThetaScalar.heap(sketch.asInstanceOf[Array[Byte]]).getEstimate

  override protected def withNewChildInternal(c: Expression): ThetaEstimate =
    copy(child = c)
}

/** Intersection of two serialized theta sketches, as a serialized compact
  * sketch — composable (chain for 3-way overlaps) and readable via
  * [[ThetaEstimate]]. The set-algebra operation HLL cannot do. */
case class ThetaIntersectSketch(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def prettyName: String = "theta_intersect"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"theta_intersect needs (binary, binary), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val res: CompactSketch = SetOperation.builder().buildIntersection()
      .intersect(ThetaScalar.heap(a.asInstanceOf[Array[Byte]]),
        ThetaScalar.heap(b.asInstanceOf[Array[Byte]]))
    res.toByteArray
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): ThetaIntersectSketch =
    copy(left = l, right = r)
}

/** Set difference A \ B of two serialized theta sketches, as a serialized
  * compact sketch ("did A but never B"). */
case class ThetaAnotBSketch(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def prettyName: String = "theta_anotb"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"theta_anotb needs (binary, binary), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val res: CompactSketch = SetOperation.builder().buildANotB()
      .aNotB(ThetaScalar.heap(a.asInstanceOf[Array[Byte]]),
        ThetaScalar.heap(b.asInstanceOf[Array[Byte]]))
    res.toByteArray
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): ThetaAnotBSketch =
    copy(left = l, right = r)
}
