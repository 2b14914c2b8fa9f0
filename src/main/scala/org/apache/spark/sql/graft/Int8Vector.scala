package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType, FloatType}

/** Symmetric int8 codes of a float vector as a BINARY column — the
  * memory-bandwidth form of an embedding corpus: 1 byte per component
  * (fp32 is 4), so a quantized ANN scan reads a quarter of the bytes.
  * Component i maps to round(x_i * 127 / max_abs) in [-127, 127]; an
  * all-zero vector maps to all-zero codes. The per-vector scale is NOT
  * stored: [[Int8Cosine]] ranks by a ratio in which it cancels. */
case class Int8Codes(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = BinaryType

  override def prettyName: String = "int8_codes"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"int8_codes needs array<float>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    Int8Codes.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = Int8Codes.getClass.getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, s => s"$cls.compute($s)")
  }

  override protected def withNewChildInternal(newChild: Expression): Int8Codes =
    copy(child = newChild)
}

object Int8Codes {
  /** Shared by interpreted eval and generated code. */
  def compute(arr: ArrayData): Array[Byte] = {
    val n = arr.numElements()
    var maxAbs = 0.0
    var i = 0
    while (i < n) {
      val a = math.abs(arr.getFloat(i).toDouble)
      if (a > maxAbs) maxAbs = a
      i += 1
    }
    val out = new Array[Byte](n)
    if (maxAbs > 0) {
      i = 0
      while (i < n) {
        val x = arr.getFloat(i).toDouble * 127 / maxAbs
        // round half AWAY FROM ZERO, matching Spark round()/the DuckDB
        // oracle of emb_quantize_int8 (math.round is half-toward-+inf:
        // it would map -63.5 to -63 where the oracle contract says -64)
        out(i) = (if (x >= 0) math.floor(x + 0.5) else math.ceil(x - 0.5)).toByte
        i += 1
      }
    }
    out
  }
}

/** Approximate cosine similarity straight from two int8 code vectors:
  * dot(a, b) / (|a| * |b|) computed in integer space. The per-vector
  * quantization scales divide out of the ratio, so no scale column is
  * needed — this is the scoring half of scalar-quantized (SQ8) search:
  * rank candidates on codes alone, then re-rank the survivors in fp32
  * ([[graft.operators.Similarity.knnInt8Rerank]]). Zero-norm inputs
  * score 0.0. Mismatched lengths are a data error and throw. */
case class Int8Cosine(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def prettyName: String = "int8_cosine"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"int8_cosine needs (binary, binary), got (${l.catalogString}, ${r.catalogString})")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    Int8Cosine.compute(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = Int8Cosine.getClass.getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, (a, b) => s"$cls.compute($a, $b)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Int8Cosine =
    copy(left = newLeft, right = newRight)
}

object Int8Cosine {
  /** Shared by interpreted eval and generated code. */
  def compute(a: Array[Byte], b: Array[Byte]): Double = {
    require(a.length == b.length,
      s"int8_cosine: length mismatch ${a.length} vs ${b.length}")
    var dot = 0L
    var na = 0L
    var nb = 0L
    var i = 0
    while (i < a.length) {
      val x = a(i).toLong
      val y = b(i).toLong
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    if (na == 0L || nb == 0L) 0.0
    else dot / math.sqrt(na.toDouble * nb.toDouble)
  }
}
