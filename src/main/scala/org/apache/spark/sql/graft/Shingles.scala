package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Word k-shingle STRINGS of a token array ("tok_i … tok_{i+k-1}" joined
  * with single spaces), in order, duplicates kept — the string twin of
  * [[ShingleHashes]] for passes whose output must stay replayable in ANSI
  * SQL (benchmark decontamination joins grams as text). The higher-order
  * formulation (`transform` + `slice` + `array_join`) allocates a slice
  * array and an interpreted join per position; this is one loop with one
  * UTF8String concat per shingle (measured on the decontaminate query:
  * the string-gram probe ran 7x slower than the hashed twin almost
  * entirely in that HOF).
  */
case class Shingles(child: Expression, k: Int) extends UnaryExpression {

  require(k > 0, "k must be positive")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingles"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingles needs array<string>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    Shingles.compute(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = Shingles.getClass.getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, a => s"$cls.compute($a, $k)")
  }

  override protected def withNewChildInternal(newChild: Expression): Shingles =
    copy(child = newChild)
}

object Shingles {
  private val Space = UTF8String.fromString(" ")

  /** Shared by interpreted eval and generated code. */
  def compute(toks: ArrayData, k: Int): ArrayData = {
    val n = toks.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val tok = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      val s = toks.getUTF8String(i)
      tok(i) = if (s == null) UTF8String.EMPTY_UTF8 else s
      i += 1
    }
    val m = n - k + 1
    val out = new Array[Any](m)
    val parts = new Array[UTF8String](k)
    i = 0
    while (i < m) {
      var j = 0
      while (j < k) { parts(j) = tok(i + j); j += 1 }
      out(i) = UTF8String.concatWs(Space, parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }
}
