package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, DataType}

/** Identity pass-through that narrows an array type's `containsNull` to
  * false — the element-level sibling of Spark's own `KnownNotNull`.
  *
  * Why it exists: `transform(vec, λ)` always infers
  * `containsNull = true` from the lambda (λ(null) is null), even when
  * the producer can PROVE its elements are never null (the quantization
  * paths: every element is `floor(x·1000)` of a present float). That
  * spurious nullability makes consumers like [[DotProductLong]] compile
  * a per-element `isNullAt` guard into their hottest loop (~17%
  * measured on `knn_ivf_pq_fixed`). Wrapping the producer restores the
  * tight loop while nullable inputs keep full null propagation.
  *
  * CONTRACT: the caller asserts elements are non-null. If the promise
  * is broken, downstream primitive reads return unspecified values
  * (Spark's own behavior for mis-declared schemas) — only wrap arrays
  * you construct yourself. */
case class KnownNoNullElements(child: Expression) extends UnaryExpression {

  override def dataType: DataType = child.dataType match {
    case ArrayType(et, _) => ArrayType(et, containsNull = false)
    case dt => dt
  }

  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(input: Any): Any = input

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => c)

  override protected def withNewChildInternal(
      newChild: Expression): KnownNoNullElements = copy(child = newChild)
}
