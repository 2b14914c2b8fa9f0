package org.apache.spark.sql.graft

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The winnowing fingerprint set (Schleimer, Wilkerson & Aiken 2003 — the
  * MOSS algorithm) of a document in ONE compiled pass: canonicalize to the
  * [a-z0-9] character stream, hash every char k-gram (the first 16 hex
  * chars of its md5 — string order over the hex IS unsigned order over the
  * top-64-bit value, so the window minimum runs on primitive longs), take
  * the minimum of every w-wide sliding window, return the DISTINCT minima
  * sorted ascending. Winnowing guarantees any shared canonical substring
  * of length >= k+w-1 leaves a shared fingerprint while sampling only
  * ~2/(w+1) of gram positions.
  *
  * Why a kernel: the declarative form (regexp_replace + a `transform` of
  * md5(substring) grams + a `transform` of array_min(slice) windows) runs
  * interpreted — HOFs are CodegenFallback, and the lambda body re-evaluates
  * every non-lambda subtree per element, so the canonicalizing REGEX runs
  * once per gram: O(L²) regex work per document (measured ~20 s per query
  * at sf0.1; this kernel does the same arithmetic in milliseconds). Here:
  * one byte pass to canonicalize, one md5 per gram into a reused digest
  * buffer, an O(L) monotonic-deque window minimum on longs, a hash-set
  * distinct — no per-gram allocation beyond the set boxes.
  *
  * Canonicalization is byte-level ASCII (A-Z folds to a-z; a-z and 0-9
  * kept; every other byte — including each byte of a multi-byte UTF-8
  * char — dropped), exactly `regexp_replace(lower(s),'[^a-z0-9]','')` on
  * ASCII text. The two differ only on exotic case folds whose lower-case
  * form re-enters ASCII (U+0130, U+212A); the corpus is audited pure
  * ASCII and the DuckDB twin pins the parity at the gate.
  *
  * Output: array<string> of distinct 16-hex-char fingerprints, sorted
  * ascending (callers digest the set without re-sorting); empty when the
  * canonical stream is shorter than k or has fewer than w grams. */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  require(k > 0 && w > 0, "k and w must be positive")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "winnow_fingerprints"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"winnow_fingerprints needs string, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    WinnowFingerprints.compute(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = WinnowFingerprints.getClass.getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, s => s"$cls.compute($s, $k, $w)")
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
}

object WinnowFingerprints {

  // one shared zero-length result is safe to return from every row and
  // thread: GenericArrayData is never mutated by consumers, and there is
  // nothing to mutate at length 0
  private val empty = new GenericArrayData(Array.empty[Any])

  // MessageDigest is stateful; codegen calls this from every task thread
  private val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  private val hex = "0123456789abcdef".getBytes

  /** Shared by interpreted eval and generated code. */
  def compute(text: UTF8String, k: Int, w: Int): ArrayData = {
    val nb = text.numBytes()
    val canon = new Array[Byte](nb)
    var len = 0
    var i = 0
    while (i < nb) {
      val b = text.getByte(i)
      if ((b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')) {
        canon(len) = b; len += 1
      } else if (b >= 'A' && b <= 'Z') {
        canon(len) = (b + 32).toByte; len += 1
      }
      i += 1
    }
    if (len < k) return empty
    val nGrams = len - k + 1
    if (nGrams < w) return empty

    // top 64 bits of md5 per gram; hex-string order == unsigned long order
    val md = md5.get()
    val dig = new Array[Byte](16)
    val hashes = new Array[Long](nGrams)
    var j = 0
    while (j < nGrams) {
      md.reset()
      md.update(canon, j, k)
      md.digest(dig, 0, 16)
      hashes(j) =
        ((dig(0) & 0xffL) << 56) | ((dig(1) & 0xffL) << 48) |
        ((dig(2) & 0xffL) << 40) | ((dig(3) & 0xffL) << 32) |
        ((dig(4) & 0xffL) << 24) | ((dig(5) & 0xffL) << 16) |
        ((dig(6) & 0xffL) << 8) | (dig(7) & 0xffL)
      j += 1
    }

    // O(nGrams) sliding-window minimum: monotonic deque of indices whose
    // hash values strictly increase front to back (unsigned compare)
    val deque = new Array[Int](nGrams)
    var head = 0
    var tail = 0
    val distinct = new java.util.HashSet[java.lang.Long]()
    j = 0
    while (j < nGrams) {
      while (tail > head &&
        java.lang.Long.compareUnsigned(hashes(deque(tail - 1)), hashes(j)) >= 0) {
        tail -= 1
      }
      deque(tail) = j; tail += 1
      if (deque(head) <= j - w) head += 1
      if (j >= w - 1) distinct.add(hashes(deque(head)))
      j += 1
    }

    // unsigned ascending sort (flip the sign bit, signed sort), hex-encode
    val mins = new Array[Long](distinct.size())
    val it = distinct.iterator()
    i = 0
    while (it.hasNext) { mins(i) = it.next() ^ Long.MinValue; i += 1 }
    java.util.Arrays.sort(mins)
    val out = new Array[Any](mins.length)
    i = 0
    while (i < mins.length) {
      val v = mins(i) ^ Long.MinValue
      val s = new Array[Byte](16)
      var p = 15
      var x = v
      while (p >= 0) { s(p) = hex((x & 0xf).toInt); x >>>= 4; p -= 1 }
      out(i) = UTF8String.fromBytes(s)
      i += 1
    }
    new GenericArrayData(out)
  }
}
