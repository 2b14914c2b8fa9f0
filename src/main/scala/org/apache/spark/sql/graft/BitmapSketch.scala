package org.apache.spark.sql.graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.roaringbitmap.longlong.Roaring64NavigableMap

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** Mergeable EXACT distinct-count state: a Roaring64 bitmap per group
  * (RoaringBitmap ships in Spark's own jars — Spark uses it internally).
  * The at-rest contract mirrors the HLL tables (`Sketches.sketchTable`),
  * but the rollup answer is EXACT — OR-merging group bitmaps loses
  * nothing — so the registry query verifies under the DuckDB
  * `count(DISTINCT …)` oracle hash-exactly, where HLL is rows-only. The
  * tradeoff is honest: a bitmap's size grows with the DISTINCT key count
  * (compressed runs make dense ranges cheap; random sparse 64-bit keys
  * cost ~2 bytes each), where HLL is fixed kilobytes — bitmap tables are
  * the right at-rest structure when keys are dense-ish integers (user
  * ids, fact keys) and exactness is worth the space. */
private[graft] object BitmapCodec {
  def toBytes(m: Roaring64NavigableMap): Array[Byte] = {
    m.runOptimize()
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    m.serialize(out)
    out.flush()
    bos.toByteArray
  }

  def fromBytes(bytes: Array[Byte]): Roaring64NavigableMap = {
    val m = new Roaring64NavigableMap()
    m.deserialize(new DataInputStream(new ByteArrayInputStream(bytes)))
    m
  }
}

/** Per-group bitmap build aggregate over long keys. */
case class BitmapAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Roaring64NavigableMap]
  with ImplicitCastInputTypes with UnaryLike[Expression] {

  override def prettyName: String = "bitmap_agg"
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Roaring64NavigableMap =
    new Roaring64NavigableMap()

  override def update(buffer: Roaring64NavigableMap,
                      input: InternalRow): Roaring64NavigableMap = {
    val v = child.eval(input)
    if (v != null) buffer.addLong(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: Roaring64NavigableMap,
                     other: Roaring64NavigableMap): Roaring64NavigableMap = {
    buffer.or(other)
    buffer
  }

  override def eval(buffer: Roaring64NavigableMap): Any =
    BitmapCodec.toBytes(buffer)
  override def serialize(buffer: Roaring64NavigableMap): Array[Byte] =
    BitmapCodec.toBytes(buffer)
  override def deserialize(bytes: Array[Byte]): Roaring64NavigableMap =
    BitmapCodec.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(offset: Int): BitmapAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): BitmapAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(c: Expression): BitmapAgg =
    copy(child = c)
}

/** OR-merge of serialized bitmaps (the rollup step) — exact by
  * construction: set union loses nothing. */
case class BitmapOrAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Roaring64NavigableMap]
  with UnaryLike[Expression] {

  override def prettyName: String = "bitmap_or_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bitmap_or_agg needs a binary bitmap column, got ${other.catalogString}")
  }

  override def createAggregationBuffer(): Roaring64NavigableMap =
    new Roaring64NavigableMap()

  override def update(buffer: Roaring64NavigableMap,
                      input: InternalRow): Roaring64NavigableMap = {
    val v = child.eval(input)
    if (v != null) buffer.or(BitmapCodec.fromBytes(v.asInstanceOf[Array[Byte]]))
    buffer
  }

  override def merge(buffer: Roaring64NavigableMap,
                     other: Roaring64NavigableMap): Roaring64NavigableMap = {
    buffer.or(other)
    buffer
  }

  override def eval(buffer: Roaring64NavigableMap): Any =
    BitmapCodec.toBytes(buffer)
  override def serialize(buffer: Roaring64NavigableMap): Array[Byte] =
    BitmapCodec.toBytes(buffer)
  override def deserialize(bytes: Array[Byte]): Roaring64NavigableMap =
    BitmapCodec.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(offset: Int): BitmapOrAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): BitmapOrAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(c: Expression): BitmapOrAgg =
    copy(child = c)
}

/** Exact cardinality of a serialized bitmap. */
case class BitmapCount(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def prettyName: String = "bitmap_count"
  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bitmap_count needs a binary bitmap column, got ${other.catalogString}")
  }

  override def nullSafeEval(bitmap: Any): Any =
    BitmapCodec.fromBytes(bitmap.asInstanceOf[Array[Byte]])
      .getLongCardinality

  override protected def withNewChildInternal(c: Expression): BitmapCount =
    copy(child = c)
}
