package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Second-moment (Gram) accumulator over an embedding column, as ONE
  * custom [[TypedImperativeAggregate]]: the buffer is the flat integer
  * array `[n, s_0..s_{d-1}, p_00, p_01, .., p_{d-1 d-1}]` — row count,
  * per-dimension sums, and the upper-triangle cross-product sums of the
  * components quantized to `floor(x * scale)`.
  *
  * This is the covariance/PCA front door, and the shape matters at
  * 100 TB: the naive formulation explodes every row into d(d+1)/2
  * (i, j, product) records before aggregating — a d²/2 row blowup
  * through the hash-aggregate — while this buffer does the d²/2 work
  * per row IN PLACE and ships exactly ONE array per partition to a
  * single-row final merge (no per-pair shuffle keys at all). The oracle
  * twin replays the explode form in SQL; results are identical exact
  * integers because quantization precedes every sum.
  *
  * Overflow: components bound |q| ≤ scale (unit-ish embedding values),
  * so each product is ≤ scale² and a long holds ~9.2e18/scale² rows
  * (scale=1000: ~9e12 rows) — `Math.addExact` fails loudly rather than
  * wrapping silently if that budget is ever exceeded. Vectors shorter
  * than `dim` raise; null rows and null components are skipped (a null
  * component skips the whole row — a half-counted vector would skew
  * every moment it touches). */
case class VectorGramAgg(
    child: Expression,
    dim: Int,
    scale: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] {

  require(dim >= 1 && scale >= 1)

  override def prettyName: String = "vector_gram_agg"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vector_gram_agg needs array<float|double>, got ${other.catalogString}")
  }

  private def isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  private val len = 1 + dim + dim * (dim + 1) / 2

  override def createAggregationBuffer(): Array[Long] = new Array[Long](len)

  override def update(buffer: Array[Long],
                      input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      require(arr.numElements() >= dim,
        s"vector_gram_agg: vector has ${arr.numElements()} < $dim components")
      var anyNull = false
      var i = 0
      while (i < dim && !anyNull) { anyNull = arr.isNullAt(i); i += 1 }
      if (!anyNull) {
        val q = new Array[Long](dim)
        i = 0
        while (i < dim) {
          val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
          q(i) = math.floor(x * scale).toLong
          i += 1
        }
        buffer(0) = Math.addExact(buffer(0), 1L)
        i = 0
        var at = 1 + dim
        while (i < dim) {
          buffer(1 + i) = Math.addExact(buffer(1 + i), q(i))
          var j = i
          while (j < dim) {
            // multiplyExact too: a component past ~3e6 (scale 1000) would
            // wrap the PRODUCT before addExact ever saw it
            buffer(at) = Math.addExact(buffer(at),
              Math.multiplyExact(q(i), q(j)))
            at += 1; j += 1
          }
          i += 1
        }
      }
    }
    buffer
  }

  override def merge(buffer: Array[Long],
                     other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < len) {
      buffer(i) = Math.addExact(buffer(i), other(i)); i += 1
    }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(len * 8)
    bb.asLongBuffer().put(buffer)
    bb.array()
  }
  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](len)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(offset: Int): VectorGramAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): VectorGramAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(c: Expression): VectorGramAgg =
    copy(child = c)
}
