package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Integer ADC lookup table of a milli-quantized query vector against the
  * TRAINED-exact PQ sub-codebooks, as ONE flat `array<long>` of length
  * m·ksub: `lut[j·ksub + c] = −2·(q_j · book_{j,c}) + ‖book_{j,c}‖²` —
  * so that `lut[j·ksub + code_j]` sums to the exact squared-L2 distance
  * up to the per-query constant Σ‖q_j‖² (which cannot change a ranking).
  *
  * The Column formulation (m per-subspace `array(...)` columns of ksub
  * `dot_long` calls each — m·ksub inlined kernels) generated a >10,000
  * line whole-stage-codegen fragment that FAILED Janino compilation:
  * every execution of the r17 exact PQ tiers paid a ~1 s doomed compile
  * attempt and then ran the monster projection interpreted (r18
  * measurement; the ERROR CodeGenerator lines in any verify/bench log of
  * that round). This kernel is the same integers as a flat three-level
  * loop — one compact codegen call, identical output values.
  */
case class PqAdcLutLong(child: Expression, books: Array[Long],
                        m: Int, ksub: Int, dsub: Int)
    extends UnaryExpression {

  require(m > 0 && ksub > 0 && dsub > 0, "m, ksub, dsub must be positive")
  require(books.length == m * ksub * dsub,
    s"books length ${books.length} != m*ksub*dsub = ${m * ksub * dsub}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "pq_adc_lut_long"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_adc_lut_long needs array<bigint>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    PqAdcLutLong.compute(input.asInstanceOf[ArrayData], books, m, ksub, dsub)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val cls = PqAdcLutLong.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val b = ctx.addReferenceObj("adcBooksLong", books, "long[]")
    defineCodeGen(ctx, ev, a => s"$cls.compute($a, $b, $m, $ksub, $dsub)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): PqAdcLutLong = copy(child = newChild)
}

object PqAdcLutLong {

  /** Shared by interpreted eval and generated code. Elements past the
    * vector's length read as 0, matching [[PqCodesLong.compute]]. */
  def compute(vec: ArrayData, books: Array[Long],
              m: Int, ksub: Int, dsub: Int): ArrayData = {
    val dims = m * dsub
    val x = new Array[Long](dims)
    val n = math.min(vec.numElements(), dims)
    var i = 0
    while (i < n) { x(i) = vec.getLong(i); i += 1 }
    val out = new Array[Long](m * ksub)
    var j = 0
    while (j < m) {
      val base = j * dsub
      var c = 0
      while (c < ksub) {
        var off = (j * ksub + c) * dsub
        var dot = 0L
        var nrm2 = 0L
        var d = 0
        while (d < dsub) {
          val b = books(off)
          dot += x(base + d) * b
          nrm2 += b * b
          d += 1; off += 1
        }
        out(j * ksub + c) = -2L * dot + nrm2
        c += 1
      }
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}
