package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Mojibake detection + repair in ONE compiled pass — the kernel behind
  * `text_fix_encoding`, replacing the 25-replace cascade (which scans
  * the string once PER dictionary key, three times over for
  * count/fix/recount: 64 s at the 100× corpus; this kernel does the
  * same work in one scan per call).
  *
  * Equivalence to the cascade is STRUCTURAL, not hoped-for: dictionary
  * keys never overlap in any input (the â-family keys are exactly 3
  * chars whose tails contain no key-starting character, the Ã/Â
  * families exactly 2 — no key is a prefix of another and no match can
  * start inside another match) and no replacement character starts or
  * completes a key, so sequential per-key replacement and a single
  * leftmost scan produce identical output and identical counts — and
  * the equivalence is additionally property-pinned against the
  * declarative cascade in `GraftFunctionsSpec`.
  *
  * Output: struct<fixed: string, n_bad: bigint>. */
case class MojibakeRepair(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("fixed", StringType, nullable = false),
    StructField("n_bad", LongType, nullable = false)))
  override def prettyName: String = "mojibake_repair"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"mojibake_repair needs string, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    MojibakeRepair.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = MojibakeRepair.getClass.getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, a => s"$cls.compute($a)")
  }

  override protected def withNewChildInternal(newChild: Expression): MojibakeRepair =
    copy(child = newChild)
}

object MojibakeRepair {

  /** UTF-8 bytes of `s` decoded as Windows-1252 — the exact damage
    * model (Java's cp1252 maps the five undefined byte positions to C1
    * controls, matching lenient real-world decoders). */
  def mojibake(s: String): String =
    new String(s.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      java.nio.charset.Charset.forName("windows-1252"))

  /** The repair dictionary, keyed by COMPUTED damage forms (longest
    * first). Every intended character is a single char, which the
    * kernel's lookup tables below rely on. */
  val Pairs: Seq[(String, String)] =
    Seq("\u2019", "\u2018", "\u201C", "\u201D", "\u2013", "\u2014",
      "\u2026", "\u2022",
      "\u00E9", "\u00E8", "\u00E1", "\u00E0", "\u00F3", "\u00F1",
      "\u00FC", "\u00F6", "\u00E4", "\u00E7", "\u00ED", "\u00FA",
      "\u00C9", "\u00AB", "\u00BB", "\u00B0", "\u00A0")
      .map(g => mojibake(g) -> g)
      .sortBy(-_._1.length)

  // per-family tables: the â-family keys are "â€" + tail char; the
  // Ã/Â families are first char + tail char. Tail char -> replacement.
  private val threeTail: java.util.HashMap[Character, Character] = {
    val m = new java.util.HashMap[Character, Character]()
    Pairs.foreach { case (bad, good) =>
      if (bad.length == 3) {
        require(bad.charAt(0) == '\u00E2' && bad.charAt(1) == '\u20AC',
          s"unexpected 3-char key $bad")
        m.put(bad.charAt(2), good.charAt(0))
      }
    }
    m
  }
  private val twoTailA: java.util.HashMap[Character, Character] = {
    val m = new java.util.HashMap[Character, Character]()
    Pairs.foreach { case (bad, good) =>
      if (bad.length == 2 && bad.charAt(0) == '\u00C3')
        m.put(bad.charAt(1), good.charAt(0))
    }
    m
  }
  private val twoTailB: java.util.HashMap[Character, Character] = {
    val m = new java.util.HashMap[Character, Character]()
    Pairs.foreach { case (bad, good) =>
      if (bad.length == 2 && bad.charAt(0) == '\u00C2')
        m.put(bad.charAt(1), good.charAt(0))
    }
    m
  }

  /** Shared by interpreted eval and generated code. */
  def compute(s: UTF8String): InternalRow = {
    val raw = s.toString
    val len = raw.length
    var i = 0
    var nBad = 0L
    var sb: java.lang.StringBuilder = null // allocated on FIRST hit only
    var copied = 0 // chars [0, copied) already appended to sb
    while (i < len) {
      val c = raw.charAt(i)
      var rep: Character = null
      var klen = 0
      if (c == '\u00E2' && i + 2 < len && raw.charAt(i + 1) == '\u20AC') {
        rep = threeTail.get(raw.charAt(i + 2))
        klen = 3
      } else if (c == '\u00C3' && i + 1 < len) {
        rep = twoTailA.get(raw.charAt(i + 1))
        klen = 2
      } else if (c == '\u00C2' && i + 1 < len) {
        rep = twoTailB.get(raw.charAt(i + 1))
        klen = 2
      }
      if (rep != null) {
        if (sb == null) sb = new java.lang.StringBuilder(len)
        sb.append(raw, copied, i).append(rep.charValue())
        copied = i + klen
        i += klen
        nBad += 1L
      } else i += 1
    }
    val fixed =
      if (sb == null) s // untouched: no copy at all
      else UTF8String.fromString(sb.append(raw, copied, len).toString)
    new GenericInternalRow(Array[Any](fixed, nBad))
  }
}
