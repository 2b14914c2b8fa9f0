package org.apache.spark.sql.graft

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** Hand-rolled count-min sketch state over LONG keys: `depth` hash rows
  * of `width` counters (width forced to a power of two), multiply-shift
  * hashing with FIXED odd constants — fully deterministic, so serialized
  * bytes are run-identical and the disjoint-batch merge law is EXACT
  * (counter-wise sums), a stronger pin than the HLL/KLL families'
  * estimate-level laws. CMS guarantees estimates NEVER undercount
  * (every row's counter ≥ the true count; the min over rows is still ≥),
  * and overcount by ≤ ε·N with ε ≈ e/width at 1−(1/e)^depth confidence.
  *
  * The DataSketches frequency sketch (Misra-Gries) is already in the
  * engine as the heavy-hitter pass; CMS is its complement — point
  * FREQUENCY estimates for arbitrary keys, not just the heavy ones, in
  * depth·width·8 bytes regardless of cardinality. */
final class CmsState(val depth: Int, val width: Int) {
  require(depth >= 1 && depth <= 16, "cms depth in [1,16]")
  require(width >= 2 && Integer.bitCount(width) == 1,
    "cms width must be a power of two")
  val counters = new Array[Long](depth * width)
  var n: Long = 0L

  private val shift = 64 - Integer.numberOfTrailingZeros(width)

  @inline private def bucket(row: Int, x: Long): Int =
    (((CmsState.A(row) * x + CmsState.B(row)) >>> shift) &
      (width - 1).toLong).toInt

  def update(x: Long): Unit = {
    var r = 0
    while (r < depth) {
      counters(r * width + bucket(r, x)) += 1L
      r += 1
    }
    n += 1L
  }

  def estimate(x: Long): Long = {
    var est = Long.MaxValue
    var r = 0
    while (r < depth) {
      val c = counters(r * width + bucket(r, x))
      if (c < est) est = c
      r += 1
    }
    est
  }

  def mergeIn(o: CmsState): Unit = {
    require(o.depth == depth && o.width == width,
      s"cms shape mismatch: ($depth,$width) vs (${o.depth},${o.width})")
    var i = 0
    while (i < counters.length) { counters(i) += o.counters(i); i += 1 }
    n += o.n
  }

  def serialize: Array[Byte] = {
    val bb = ByteBuffer.allocate(16 + 8 * counters.length)
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(depth); bb.putInt(width); bb.putLong(n)
    var i = 0
    while (i < counters.length) { bb.putLong(counters(i)); i += 1 }
    bb.array()
  }
}

object CmsState {
  // fixed odd multiply-shift constants (splitmix64 stream of a fixed
  // seed, forced odd) — 16 rows max; determinism is the point
  private[graft] val A: Array[Long] = {
    var s = 0x9E3779B97F4A7C15L
    Array.fill(16) {
      s += 0x9E3779B97F4A7C15L
      var z = s
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      (z ^ (z >>> 31)) | 1L
    }
  }
  private[graft] val B: Array[Long] = {
    var s = 0xC2B2AE3D27D4EB4FL
    Array.fill(16) {
      s += 0x9E3779B97F4A7C15L
      var z = s
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
  }

  /** The first `rows` (a, b) multiply-shift constants as unsigned
    * BigInts — the ONE generator feeding both the engine's bucket math
    * and the DuckDB oracles' HUGEINT literals (the XxhSql.hashInt
    * discipline: oracle constants that cannot drift from the kernel). */
  def hashConstants(rows: Int): Seq[(BigInt, BigInt)] = {
    def u(v: Long): BigInt =
      BigInt(v) + (if (v < 0) BigInt(2).pow(64) else BigInt(0))
    (0 until rows).map(r => (u(A(r)), u(B(r))))
  }

  def deserialize(bytes: Array[Byte]): CmsState = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val s = new CmsState(bb.getInt, bb.getInt)
    s.n = bb.getLong
    var i = 0
    while (i < s.counters.length) { s.counters(i) = bb.getLong; i += 1 }
    s
  }
}

/** Per-group CMS build aggregate: buffer is the live counter array,
  * serialized only at shuffle boundaries; per-row cost is `depth`
  * multiply-shifts. */
case class CmsSketchAgg(
    child: Expression,
    depth: Int,
    width: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CmsState]
  with ImplicitCastInputTypes with UnaryLike[Expression] {

  override def prettyName: String = "cms_sketch_agg"
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): CmsState =
    new CmsState(depth, width)

  override def update(buffer: CmsState, input: InternalRow): CmsState = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: CmsState, other: CmsState): CmsState = {
    buffer.mergeIn(other)
    buffer
  }

  override def eval(buffer: CmsState): Any = buffer.serialize
  override def serialize(buffer: CmsState): Array[Byte] = buffer.serialize
  override def deserialize(bytes: Array[Byte]): CmsState =
    CmsState.deserialize(bytes)

  override def withNewMutableAggBufferOffset(offset: Int): CmsSketchAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): CmsSketchAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(c: Expression): CmsSketchAgg =
    copy(child = c)
}

/** Counter-wise merge of serialized CMS sketches (the rollup step):
  * EXACT — merging disjoint batches yields byte-identical state to one
  * whole-input build (pinned in `SketchesSpec`). */
case class CmsMergeAgg(
    child: Expression,
    depth: Int,
    width: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CmsState]
  with UnaryLike[Expression] {

  override def prettyName: String = "cms_merge_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"cms_merge_agg needs a binary sketch column, got ${other.catalogString}")
  }

  override def createAggregationBuffer(): CmsState =
    new CmsState(depth, width)

  override def update(buffer: CmsState, input: InternalRow): CmsState = {
    val v = child.eval(input)
    if (v != null) buffer.mergeIn(
      CmsState.deserialize(v.asInstanceOf[Array[Byte]]))
    buffer
  }

  override def merge(buffer: CmsState, other: CmsState): CmsState = {
    buffer.mergeIn(other)
    buffer
  }

  override def eval(buffer: CmsState): Any = buffer.serialize
  override def serialize(buffer: CmsState): Array[Byte] = buffer.serialize
  override def deserialize(bytes: Array[Byte]): CmsState =
    CmsState.deserialize(bytes)

  override def withNewMutableAggBufferOffset(offset: Int): CmsMergeAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): CmsMergeAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(c: Expression): CmsMergeAgg =
    copy(child = c)
}

/** Point-frequency estimate of `key` from a serialized CMS sketch.
  * Never undercounts. Sketch readers touch kilobytes off the hot path —
  * interpreted eval is the right cost. */
case class CmsEstimate(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def prettyName: String = "cms_estimate"
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"cms_estimate needs (binary, bigint), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override def nullSafeEval(sketch: Any, key: Any): Any =
    CmsState.deserialize(sketch.asInstanceOf[Array[Byte]])
      .estimate(key.asInstanceOf[Long])

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): CmsEstimate = copy(left = l, right = r)
}

/** Join-size estimate from two CMS sketches over the join keys: the
  * classic inner-product estimator — `|A ⋈ B| ≈ min over rows r of
  * Σ_w a[r][w]·b[r][w]`. NEVER undercounts (every colliding pair only
  * adds), overcounts by ≤ ε·Nₐ·N_b w.h.p. — a size check the engine can
  * run from two KILOBYTE at-rest sketches before committing to a join's
  * shuffle (the broadcast-vs-SMJ call, skew alarms). Arithmetic uses
  * `Math.multiplyExact`/`addExact`: past int64 the estimate fails loudly
  * rather than wrapping (the PrefixScan discipline). */
case class CmsInnerProduct(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def prettyName: String = "cms_inner_product"
  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"cms_inner_product needs (binary, binary), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val sa = CmsState.deserialize(a.asInstanceOf[Array[Byte]])
    val sb = CmsState.deserialize(b.asInstanceOf[Array[Byte]])
    require(sa.depth == sb.depth && sa.width == sb.width,
      s"cms shape mismatch: (${sa.depth},${sa.width}) vs " +
        s"(${sb.depth},${sb.width})")
    var est = Long.MaxValue
    var r = 0
    while (r < sa.depth) {
      var sum = 0L
      var w = 0
      while (w < sa.width) {
        sum = Math.addExact(sum, Math.multiplyExact(
          sa.counters(r * sa.width + w), sb.counters(r * sb.width + w)))
        w += 1
      }
      if (sum < est) est = sum
      r += 1
    }
    est
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): CmsInnerProduct =
    copy(left = l, right = r)
}

/** Exact stream length `n` recorded by a serialized CMS sketch —
  * conserved exactly under any merge tree. */
case class CmsSketchN(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def prettyName: String = "cms_sketch_n"
  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"cms_sketch_n needs a binary sketch column, got ${other.catalogString}")
  }

  override def nullSafeEval(sketch: Any): Any =
    CmsState.deserialize(sketch.asInstanceOf[Array[Byte]]).n

  override protected def withNewChildInternal(c: Expression): CmsSketchN =
    copy(child = c)
}
