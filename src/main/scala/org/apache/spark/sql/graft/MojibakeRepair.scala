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
  * Equivalence to the cascade is STRUCTURAL, not hoped-for. Two facts
  * carry it: (1) dictionary keys never overlap in any input (the
  * â-family keys are exactly 3 chars whose tails contain no
  * key-starting character, the Ã/Â families exactly 2 — no key is a
  * prefix of another and no match can start inside another match), and
  * (2) no replacement character STARTS a key, and every replacement
  * that can COMPLETE a key (NBSP, «, », ° are all key tails) is
  * produced at-or-after the key it could complete in `Pairs` order —
  * e.g. the `Ã`+NBSP→à pass runs before the `Â`+NBSP→NBSP pass that
  * could manufacture its match, so the cascade never consumes a
  * replacement-formed match, matching the kernel's single leftmost
  * scan (which never rescans replaced output). Fact (2) is ORDER-
  * dependent: a new dictionary pair could silently break it, so it is
  * asserted at class-load in [[MojibakeRepair.Pairs]]'s companion
  * check below, and the kernel==cascade equivalence is additionally
  * property-pinned against the declarative cascade in
  * `GraftFunctionsSpec`.
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
    // \u2013 and \u2014 BEFORE " and ": the \u2013/\u2014 damage forms end in "/" (cp1252
    // of 0x93/0x94), which are themselves replacements \u2014 the consuming
    // pass must run before the pass that could manufacture its match
    // (class-load guard below; see the ordering argument in the
    // class scaladoc)
    Seq("\u2019", "\u2018", "\u2013", "\u2014", "\u201C", "\u201D",
      "\u2026", "\u2022",
      "\u00E9", "\u00E8", "\u00E1", "\u00E0", "\u00F3", "\u00F1",
      "\u00FC", "\u00F6", "\u00E4", "\u00E7", "\u00ED", "\u00FA",
      "\u00C9", "\u00AB", "\u00BB", "\u00B0", "\u00A0")
      .map(g => mojibake(g) -> g)
      .sortBy(-_._1.length)

  // Class-load guard for the ordering fact the kernel==cascade proof
  // rests on (see the class scaladoc): a replacement char must never
  // START a key or sit in a key's interior, and any key a replacement
  // could COMPLETE must be processed at-or-before the pass that
  // produces that replacement — otherwise the cascade would consume a
  // replacement-formed match the single scan never sees.
  locally {
    Pairs.zipWithIndex.foreach { case ((_, rep), j) =>
      require(rep.length == 1, s"multi-char replacement $rep")
      val r = rep.charAt(0)
      Pairs.zipWithIndex.foreach { case ((key, _), i) =>
        require(!key.dropRight(1).contains(r),
          s"replacement $rep starts/continues key $key")
        if (key.last == r)
          require(i <= j,
            s"replacement of pair $j could form key $key (pair $i) " +
              "for a later cascade pass — reorder Pairs")
      }
    }
  }

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
