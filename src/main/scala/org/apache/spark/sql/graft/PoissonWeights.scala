package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All `reps` Poisson(1) bootstrap weights of one row in a single fused
  * pass — the generation kernel of `EvalMetrics.poissonBootstrapCI`.
  *
  * Semantics are BIT-IDENTICAL to the composed form it replaces (which
  * the DuckDB oracle still replays): weight r reads the 24-bit slot
  * (r−1)%5 of digest md5(prefix ++ digits(⌊(r−1)/5⌋)) — `prefix` is the
  * "salt:id:" string — and inverts the pinned ⌊CDF_{Poisson(1)}·16⁶⌋
  * thresholds (lexicographic 6-hex compare ≡ this integer compare at
  * fixed width), capping at 7. The composed form materialized the
  * digest as a hex STRING per block and exploded twice (blocks × 5
  * slots — 100 wide rows per input row carrying strings through two
  * Generates); this expression walks the raw digest bytes and emits one
  * int array, so the only explode is the final skinny (rep, w)
  * posexplode. Measured ~2x on the registry's most expensive query.
  *
  * The CDF literals are pinned verbatim to
  * `EvalMetrics.poissonCdfHex6` (law-tested in EvalMetricsSpec) so the
  * Spark kernel and the SQL twin cannot drift. */
case class PoissonWeights(child: Expression, reps: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(reps > 0, "reps must be positive")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "poisson_weights"

  override def nullSafeEval(input: Any): Any =
    PoissonWeights.compute(input.asInstanceOf[UTF8String], reps)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = PoissonWeights.getClass.getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, s => s"$cls.compute($s, $reps)")
  }

  override protected def withNewChildInternal(newChild: Expression): PoissonWeights =
    copy(child = newChild)
}

object PoissonWeights {
  /** ⌊CDF_{Poisson(1)}(k)·16⁶⌋, k = 0..6, as 24-bit ints — the integer
    * reading of `EvalMetrics.poissonCdfHex6`'s 6-hex literals. */
  val cdf24: Array[Int] = Array(
    0x5e2d58, 0xbc5ab1, 0xeb715e, 0xfb2397, 0xff1025, 0xffd90f, 0xfffa8b)

  /** Shared by interpreted eval and generated code. */
  def compute(prefix: UTF8String, reps: Int): ArrayData = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val pre = prefix.getBytes
    val out = new Array[Int](reps)
    var rep = 0
    var blk = 0
    while (rep < reps) {
      md.reset()
      md.update(pre)
      // ASCII digits of blk — the bytes CAST(blk AS STRING) contributes
      md.update(java.lang.Integer.toString(blk)
        .getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      val dg = md.digest()
      var s = 0
      while (s < 5 && rep < reps) {
        val u = ((dg(3 * s) & 0xff) << 16) |
          ((dg(3 * s + 1) & 0xff) << 8) | (dg(3 * s + 2) & 0xff)
        var k = 0
        while (k < 7 && u >= cdf24(k)) k += 1
        out(rep) = k
        rep += 1
        s += 1
      }
      blk += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}
