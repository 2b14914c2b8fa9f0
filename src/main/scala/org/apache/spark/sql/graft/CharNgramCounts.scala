package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct character n-grams (lengths 1..maxN) of space-padded lowercased
  * text WITH their per-document counts, as one codegen-called primitive
  * loop — the feature extractor of the profile language classifier.
  *
  * Emitting (gram, count) pairs instead of the raw gram stream moves the
  * per-document aggregation into the row itself: the downstream plan
  * explodes distinct grams (bounded by document vocabulary), never one row
  * per occurrence. The higher-order-function formulation (`transform` +
  * `substr` + explode + groupBy) allocates a slice per gram, runs
  * interpreted, and shuffles occurrences (measured 2x slower end-to-end on
  * the bench corpus even after a pre-aggregation fix).
  *
  * Grams consisting only of spaces are skipped (they would match any
  * language's profile). Multi-byte characters are handled by indexing
  * UTF-8 char boundaries once per document — every gram slice is O(1). */
case class CharNgramCounts(child: Expression, maxN: Int)
    extends UnaryExpression {

  require(maxN > 0, "maxN must be positive")

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("g", StringType, nullable = false),
      StructField("cnt", IntegerType, nullable = false))),
    containsNull = false)

  override def prettyName: String = "char_ngram_counts"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"char_ngram_counts needs string, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    CharNgramCounts.compute(input.asInstanceOf[UTF8String], maxN)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = CharNgramCounts.getClass.getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, s => s"$cls.compute($s, $maxN)")
  }

  override protected def withNewChildInternal(newChild: Expression): CharNgramCounts =
    copy(child = newChild)
}

/** TOTAL n-gram occurrences (lengths 1..maxN, all-space grams skipped)
  * of the same padded/lowercased text [[CharNgramCounts]] emits — by
  * construction equal to `sum(cnt)` over its output, but computed as one
  * allocation-free scan-side pass. The language classifier needs this
  * total per document for its unmatched-gram floor penalty; deriving it
  * from the exploded pairs cost a second scan + aggregation + join
  * (measured ~15% of `text_language_profile`). A codegen'd primitive,
  * unlike the HOF formulation that dropped the projection out of
  * whole-stage codegen (see the 12x note in TextAnalysis). */
case class CharNgramTotal(child: Expression, maxN: Int)
    extends UnaryExpression {

  require(maxN > 0, "maxN must be positive")

  override def dataType: DataType =
    org.apache.spark.sql.types.LongType

  override def prettyName: String = "char_ngram_total"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"char_ngram_total needs string, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    CharNgramCounts.computeTotal(input.asInstanceOf[UTF8String], maxN)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = CharNgramCounts.getClass.getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, s => s"$cls.computeTotal($s, $maxN)")
  }

  override protected def withNewChildInternal(newChild: Expression): CharNgramTotal =
    copy(child = newChild)
}

object CharNgramCounts {
  private val Space = UTF8String.fromString(" ")

  /** Shared by interpreted eval and generated code. */
  def compute(s: UTF8String, maxN: Int): ArrayData = {
    val padded = UTF8String.concat(Space, s.toLowerCase, Space)
    val b = padded.getBytes
    // char-boundary byte offsets (UTF-8 continuation bytes are 10xxxxxx)
    var chars = 0
    var i = 0
    while (i < b.length) {
      if ((b(i) & 0xC0) != 0x80) chars += 1
      i += 1
    }
    val bounds = new Array[Int](chars + 1)
    var c = 0
    i = 0
    while (i < b.length) {
      if ((b(i) & 0xC0) != 0x80) { bounds(c) = i; c += 1 }
      i += 1
    }
    bounds(chars) = b.length

    val counts = new java.util.LinkedHashMap[UTF8String, Integer]()
    var k = 1
    while (k <= maxN) {
      var p = 0
      while (p + k <= chars) {
        val from = bounds(p)
        val until = bounds(p + k)
        // skip all-space grams: they'd match any profile
        var q = from
        var allSpace = true
        while (allSpace && q < until) {
          if (b(q) != ' ') allSpace = false
          q += 1
        }
        if (!allSpace) {
          val g = UTF8String.fromBytes(b, from, until - from)
          val prev = counts.get(g)
          counts.put(g, if (prev == null) 1 else prev + 1)
        }
        p += 1
      }
      k += 1
    }
    val out = new Array[Any](counts.size)
    val it = counts.entrySet().iterator()
    var w = 0
    while (it.hasNext) {
      val e = it.next()
      out(w) = InternalRow(e.getKey, e.getValue.intValue())
      w += 1
    }
    new GenericArrayData(out)
  }

  /** `Σ cnt` over [[compute]]'s output, allocation-free: the same
    * pad/boundary/all-space-skip walk, counting positions instead of
    * building gram strings. Kept adjacent so the two loops can only
    * drift together. */
  def computeTotal(s: UTF8String, maxN: Int): Long = {
    val padded = UTF8String.concat(Space, s.toLowerCase, Space)
    val b = padded.getBytes
    var chars = 0
    var i = 0
    while (i < b.length) {
      if ((b(i) & 0xC0) != 0x80) chars += 1
      i += 1
    }
    val bounds = new Array[Int](chars + 1)
    var c = 0
    i = 0
    while (i < b.length) {
      if ((b(i) & 0xC0) != 0x80) { bounds(c) = i; c += 1 }
      i += 1
    }
    bounds(chars) = b.length
    var total = 0L
    var k = 1
    while (k <= maxN) {
      var p = 0
      while (p + k <= chars) {
        val from = bounds(p)
        val until = bounds(p + k)
        var q = from
        var allSpace = true
        while (allSpace && q < until) {
          if (b(q) != ' ') allSpace = false
          q += 1
        }
        if (!allSpace) total += 1L
        p += 1
      }
      k += 1
    }
    total
  }
}
