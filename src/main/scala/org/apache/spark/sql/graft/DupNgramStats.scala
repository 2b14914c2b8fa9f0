package org.apache.spark.sql.graft

import java.util.{HashMap => JHashMap}

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** All Gopher duplicate-n-gram statistics (Rae et al. 2021 §A1.1) of a
  * token array in ONE compiled pass — the per-document kernel behind
  * `text_dup_ngrams`. For n = 2..4 the packed argmax of the most frequent
  * word n-gram (count · 1e9 + count · charLen, ties by magnitude — the
  * registry's packed-long idiom), for n = 5..8 the summed character mass
  * of every n-gram occurring at least twice.
  *
  * Mechanics: the tokens are joined into one space-separated byte buffer,
  * so every n-gram is a CONTIGUOUS byte slice — counting uses zero-copy
  * `UTF8String` wrappers over that buffer as exact hash-map keys (byte
  * equality, no collision risk, no per-gram string building). Cost is
  * O(total gram bytes) per document with no allocation beyond the map.
  *
  * The declarative forms both lose badly: explode + (doc, n, gram) hash
  * aggs shuffles 7x-token-count string-keyed rows (7.1 s at sf0.1), and
  * the sort + `aggregate` run-length fold stays scan-side but pays
  * interpreted-lambda struct churn per element (4.6 s); this kernel does
  * the same arithmetic in ~0.4 s. Output: array<bigint> of 10 —
  * [top2_cnt, top2_mass, top3_cnt, top3_mass, top4_cnt, top4_mass,
  * dup5_mass, dup6_mass, dup7_mass, dup8_mass]; ppm normalization stays
  * in SQL where the document char count lives.
  */
case class DupNgramStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "dup_ngram_stats"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"dup_ngram_stats needs array<string>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    DupNgramStats.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = DupNgramStats.getClass.getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, a => s"$cls.compute($a)")
  }

  override protected def withNewChildInternal(newChild: Expression): DupNgramStats =
    copy(child = newChild)
}

object DupNgramStats {
  private final val Pack = 1000000000L

  /** Shared by interpreted eval and generated code. */
  def compute(toks: ArrayData): ArrayData = {
    val out = new Array[Long](10)
    val n = toks.numElements()
    if (n >= 2) {
      // one space-joined buffer; starts(i) = byte offset of token i, and
      // the n-gram starting at token i is bytes [starts(i), ends(i+n-1))
      val starts = new Array[Int](n)
      val ends = new Array[Int](n)
      var total = n - 1 // the joining spaces
      var i = 0
      while (i < n) {
        val t = toks.getUTF8String(i)
        if (t != null) total += t.numBytes()
        i += 1
      }
      val buf = new Array[Byte](total)
      var pos = 0
      i = 0
      while (i < n) {
        if (i > 0) { buf(pos) = ' '; pos += 1 }
        starts(i) = pos
        val t = toks.getUTF8String(i)
        if (t != null) {
          t.writeToMemory(buf, Platform.BYTE_ARRAY_OFFSET + pos)
          pos += t.numBytes()
        }
        ends(i) = pos
        i += 1
      }
      val counts = new JHashMap[UTF8String, Counter]()
      var g = 2
      while (g <= 8) {
        if (n >= g) {
          counts.clear()
          var j = 0
          val last = n - g
          while (j <= last) {
            val gram = UTF8String.fromAddress(buf,
              Platform.BYTE_ARRAY_OFFSET + starts(j), ends(j + g - 1) - starts(j))
            val c = counts.get(gram)
            if (c == null) counts.put(gram, new Counter) else c.n += 1
            j += 1
          }
          var top = 0L
          var dup = 0L
          val it = counts.entrySet().iterator()
          while (it.hasNext) {
            val e = it.next()
            val cnt = e.getValue.n
            val mass = cnt * e.getKey.numChars().toLong
            if (g <= 4) {
              val packed = cnt * Pack + mass
              if (packed > top) top = packed
            } else if (cnt >= 2) {
              dup += mass
            }
          }
          if (g <= 4) {
            out((g - 2) * 2) = top / Pack
            out((g - 2) * 2 + 1) = top % Pack
          } else {
            out(6 + (g - 5)) = dup
          }
        }
        g += 1
      }
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  private final class Counter { var n: Long = 1L }
}
