package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, BooleanType, DataType, LongType}

/** `|A ∩ B| ≥ need` of two SORTED `array<long>` columns by a merge walk
  * with TWO-SIDED early exit — the threshold pre-filter of the dedup
  * verify joins (r18 optimization).
  *
  * [[SortedIntersectCount]] must walk both arrays to the end to return
  * the exact count; but every verify join immediately compares that
  * count against a threshold, and at sf0.1 ~6 million candidate pairs
  * feed a ~500-row survivor set — 99.99% of the walks are wasted past
  * the point where the verdict is already decided. This predicate exits
  *
  *  - `true` the moment the running count reaches `need`, and
  *  - `false` the moment `count + min(remaining_a, remaining_b) < need`
  *    (the best-case bound cannot reach the threshold),
  *
  * so dissimilar pairs abandon after a handful of comparisons. Exactly
  * equivalent to `sorted_intersect_count(a, b) >= need` — a pure
  * short-circuit, never a different verdict; survivors then pay the one
  * full count that the output schema actually needs.
  *
  * PRECONDITION: both arrays sorted ascending and null-free (the dedup
  * pipeline's set tables), same as [[SortedIntersectCount]].
  * `need <= 0` is vacuously true. */
case class SortedIntersectAtLeast(first: Expression, second: Expression,
                                  third: Expression)
    extends TernaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType), LongType)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "sorted_intersect_at_least"

  override def nullSafeEval(a: Any, b: Any, n: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val need = n.asInstanceOf[Long]
    if (need <= 0L) return true
    val nx = x.numElements(); val ny = y.numElements()
    var i = 0; var j = 0; var c = 0L
    while (c < need && c + math.min(nx - i, ny - j) >= need) {
      val xi = x.getLong(i); val yj = y.getLong(j)
      if (xi == yj) { c += 1L; i += 1; j += 1 }
      else if (xi < yj) i += 1
      else j += 1
    }
    c >= need
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, n) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val c = ctx.freshName("c")
      val xi = ctx.freshName("xi")
      val yj = ctx.freshName("yj")
      s"""
         |if ($n <= 0L) { ${ev.value} = true; } else {
         |  int $nx = $a.numElements(); int $ny = $b.numElements();
         |  int $i = 0; int $j = 0; long $c = 0L;
         |  while ($c < $n && $c + Math.min($nx - $i, $ny - $j) >= $n) {
         |    long $xi = $a.getLong($i); long $yj = $b.getLong($j);
         |    if ($xi == $yj) { $c++; $i++; $j++; }
         |    else if ($xi < $yj) { $i++; } else { $j++; }
         |  }
         |  ${ev.value} = $c >= $n;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): SortedIntersectAtLeast =
    copy(first = newFirst, second = newSecond, third = newThird)
}
