package org.apache.spark.sql.graft

import java.text.Normalizer

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFKC normalization as a native Catalyst expression.
  *
  * The reference engine's one genuinely custom scalar function is its text
  * normalizer, whose first step is NFKC compatibility normalization (full
  * width → half-width, e.g. `Ｐｏｌｏ` → `Polo`; see the normalization pipeline
  * at reference `src/batch_train.py:21-52`). Spark has no NFKC built-in, so
  * this is implemented as a codegen-capable `UnaryExpression` over
  * `java.text.Normalizer` — it participates in whole-stage codegen rather
  * than falling out of it the way a Scala UDF would, which matters when the
  * normalizer sits in the hot path of a 100 TB text-dedup scan.
  */
case class NfkcNormalize(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "nfkc_normalize"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    UTF8String.fromString(Normalizer.normalize(s, Normalizer.Form.NFKC))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"UTF8String.fromString(java.text.Normalizer.normalize($c.toString(), " +
        "java.text.Normalizer.Form.NFKC))")

  override protected def withNewChildInternal(newChild: Expression): NfkcNormalize =
    copy(child = newChild)
}
