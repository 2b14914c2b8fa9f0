package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared scan helpers for the compiled web-corpus filter kernels
  * ([[GopherStats]], [[C4Stats]]). All counting reproduces the exact
  * semantics of the Spark SQL expressions the kernels replace, so the
  * DuckDB hash oracles are unchanged:
  *
  *  - whitespace = Java regex `\s` without UNICODE_CHARACTER_CLASS:
  *    space, \t, \n, \x0B, \f, \r (what `split(_, "\\s+")` matches);
  *  - `trim`/`ltrim`/`rtrim` strip ASCII space 0x20 only (Spark's
  *    single-argument StringTrim family);
  *  - character counts are CODE POINTS (what `length()` returns), so a
  *    supplementary-plane pair counts once.
  */
private[graft] object TextScan {
  @inline def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' ||
      c == '\r'

  /** Code points in [a, b) — chars minus low-surrogate halves. */
  def codePoints(s: String, a: Int, b: Int): Long = {
    var n = 0L
    var i = a
    while (i < b) {
      if (!Character.isLowSurrogate(s.charAt(i))) n += 1
      i += 1
    }
    n
  }

  /** Count of maximal non-whitespace runs in [a, b) — exactly the
    * nonempty elements of a `\s+` split of the slice. */
  def wordRuns(s: String, a: Int, b: Int): Long = {
    var n = 0L
    var inWord = false
    var i = a
    while (i < b) {
      val ws = isWs(s.charAt(i))
      if (!ws && !inWord) { n += 1; inWord = true }
      else if (ws) inWord = false
      i += 1
    }
    n
  }
}

/** All Gopher rule evidence counts (Rae et al. 2021 §A1.1) of a document
  * in ONE compiled pass — the kernel behind `text_gopher_rules` (and the
  * `pipeline_gopher` capstone). Replaces the interpreted line/word
  * higher-order-function battery with two linear scans (raw text for the
  * line/symbol stats, `lower(trim(text))` for the word stats), same
  * `DupNgramStats` precedent: identical counts, no lambda interpretation
  * in the hot path. The threshold flags stay in SQL where they replay.
  *
  * Output array<bigint> of 9: [n_words, sum_chars, n_hash, n_ellipsis,
  * n_lines, n_bullet_lines, n_ellipsis_lines, n_alpha_words,
  * n_stopword_hits].
  */
case class GopherStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "gopher_stats"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"gopher_stats needs string, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    GopherStats.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = GopherStats.getClass.getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, a => s"$cls.compute($a)")
  }

  override protected def withNewChildInternal(newChild: Expression): GopherStats =
    copy(child = newChild)
}

object GopherStats {
  import TextScan._

  // the paper's 8 English stop words, matched against lowercased tokens
  private val Stops =
    Array("the", "be", "to", "of", "and", "that", "have", "with")

  /** Shared by interpreted eval and generated code. */
  def compute(s: UTF8String): ArrayData = {
    val out = new Array[Long](9)
    val raw = s.toString
    val len = raw.length

    // ---- raw-text scan: '#', non-overlapping '...', '…' ----
    var nHash = 0L
    var nEll = 0L
    var i = 0
    while (i < len) {
      val c = raw.charAt(i)
      if (c == '#') { nHash += 1; i += 1 }
      else if (c == '…') { nEll += 1; i += 1 }
      else if (c == '.' && i + 2 < len && raw.charAt(i + 1) == '.' &&
        raw.charAt(i + 2) == '.') { nEll += 1; i += 3 }
      else i += 1
    }

    // ---- line scan: split on '\n' (trailing empties kept, so lines =
    // newline count + 1); bullet = first non-space char in {-, *, •};
    // ellipsis end = rtrim(' ') suffix '…' or '...' ----
    var nLines = 1L
    var nBullet = 0L
    var nEllLines = 0L
    var lineStart = 0
    i = 0
    while (i <= len) {
      if (i == len || raw.charAt(i) == '\n') {
        var a = lineStart
        while (a < i && raw.charAt(a) == ' ') a += 1
        if (a < i) {
          val c = raw.charAt(a)
          if (c == '-' || c == '*' || c == '•') nBullet += 1
        }
        var b = i - 1
        while (b >= lineStart && raw.charAt(b) == ' ') b -= 1
        if (b >= lineStart) {
          if (raw.charAt(b) == '…') nEllLines += 1
          else if (b - 2 >= lineStart && raw.charAt(b) == '.' &&
            raw.charAt(b - 1) == '.' && raw.charAt(b - 2) == '.')
            nEllLines += 1
        }
        if (i < len) nLines += 1
        lineStart = i + 1
      }
      i += 1
    }

    // ---- word scan over lower(trim(text)) — the UTF8String ops the
    // Lower/StringTrim expressions call, so case folding is identical ----
    val low = s.trim().toLowerCase().toString
    val llen = low.length
    var nWords = 0L
    var sumChars = 0L
    var nAlpha = 0L
    var stopMask = 0
    var wStart = -1
    var hasAlpha = false
    var j = 0
    while (j <= llen) {
      val atEnd = j == llen || isWs(low.charAt(j))
      if (atEnd) {
        if (wStart >= 0) {
          nWords += 1
          if (hasAlpha) nAlpha += 1
          stopMask |= stopBit(low, wStart, j)
          wStart = -1
          hasAlpha = false
        }
      } else {
        if (wStart < 0) wStart = j
        val c = low.charAt(j)
        if (c >= 'a' && c <= 'z') hasAlpha = true
        if (!Character.isLowSurrogate(c)) sumChars += 1
      }
      j += 1
    }

    out(0) = nWords
    out(1) = sumChars
    out(2) = nHash
    out(3) = nEll
    out(4) = nLines
    out(5) = nBullet
    out(6) = nEllLines
    out(7) = nAlpha
    out(8) = java.lang.Integer.bitCount(stopMask).toLong
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  private def stopBit(s: String, a: Int, b: Int): Int = {
    val wl = b - a
    var k = 0
    while (k < Stops.length) {
      val sw = Stops(k)
      if (sw.length == wl && s.regionMatches(a, sw, 0, wl)) return 1 << k
      k += 1
    }
    0
  }
}

/** All C4 cleaning counts (Raffel et al. 2020 §2.2) of a document in ONE
  * compiled pass — the kernel behind `text_c4_filters`. Line keep rule:
  * `rtrim(' ')` suffix in {., !, ?, "} AND ≥ 5 whitespace words; page
  * signals: terminal-mark count and the lorem/brace/javascript substring
  * gates over `lower(text)`. Same counts as the interpreted HOF form,
  * flags stay in SQL.
  *
  * Output array<bigint> of 7: [n_lines, n_kept_lines, kept_chars,
  * n_sentences, f_lorem, f_brace, f_javascript].
  */
case class C4Stats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "c4_stats"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"c4_stats needs string, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    C4Stats.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = C4Stats.getClass.getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, a => s"$cls.compute($a)")
  }

  override protected def withNewChildInternal(newChild: Expression): C4Stats =
    copy(child = newChild)
}

object C4Stats {
  import TextScan._

  /** Shared by interpreted eval and generated code. */
  def compute(s: UTF8String): ArrayData = {
    val out = new Array[Long](7)
    val raw = s.toString
    val len = raw.length

    var nSent = 0L
    var i = 0
    while (i < len) {
      val c = raw.charAt(i)
      if (c == '.' || c == '!' || c == '?') nSent += 1
      i += 1
    }

    var nLines = 1L
    var nKept = 0L
    var keptChars = 0L
    var lineStart = 0
    i = 0
    while (i <= len) {
      if (i == len || raw.charAt(i) == '\n') {
        var b = i - 1
        while (b >= lineStart && raw.charAt(b) == ' ') b -= 1
        val terminal = b >= lineStart && {
          val c = raw.charAt(b)
          c == '.' || c == '!' || c == '?' || c == '"'
        }
        if (terminal && wordRuns(raw, lineStart, i) >= 5L) {
          nKept += 1
          keptChars += codePoints(raw, lineStart, i) // RAW line length
        }
        if (i < len) nLines += 1
        lineStart = i + 1
      }
      i += 1
    }

    // page gates over lower(text) — UTF8String.toLowerCase, the code
    // path the Lower expression takes, then plain substring containment
    val low = s.toLowerCase().toString
    out(0) = nLines
    out(1) = nKept
    out(2) = keptChars
    out(3) = nSent
    out(4) = if (low.contains("lorem ipsum")) 1L else 0L
    out(5) = if (low.contains("{")) 1L else 0L
    out(6) = if (low.contains("javascript")) 1L else 0L
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}
