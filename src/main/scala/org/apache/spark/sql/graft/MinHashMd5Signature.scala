package org.apache.spark.sql.graft

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** PORTABLE-hash MinHash signature of a shingle-string array as ONE
  * codegen-called kernel: per shingle, the 28-bit md5-prefix integer
  * (`conv(substring(md5(s),1,7),16,10)` — read straight off the first
  * four digest bytes, no hex string ever materialized), then the running
  * minimum of every `(a_i·h + b_i) mod p` in a tight loop.
  *
  * This is the md5 twin of [[MinHashSignature]] (the xxhash64 form): the
  * md5 prefix is what an ANSI-SQL oracle can replay, and the dataflow it
  * replaces — explode(distinct shingles) → md5 hex → string→int conv →
  * a numHashes-column min AGGREGATION — paid a row blowup plus a shuffle
  * for arithmetic that is row-local by nature. Duplicate shingles cannot
  * change a minimum, so the explode-side `array_distinct` is dropped
  * rather than re-implemented.
  *
  * Returns NULL for an empty shingle array — the explode form emitted no
  * row for such documents, and the caller filters the NULLs to match.
  * All arithmetic stays below 2^59 (28-bit base × 31-bit a), exact in
  * int64 on both engines.
  */
case class MinHashMd5Signature(child: Expression, numHashes: Int)
    extends UnaryExpression {

  require(numHashes > 0, "numHashes must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_md5_signature"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_md5_signature needs array<string>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    MinHashMd5Signature.compute(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = MinHashMd5Signature.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, a => s"""
      |${ev.value} = $cls.compute($a, $numHashes);
      |${ev.isNull} = ${ev.value} == null;
      |""".stripMargin)
  }

  override protected def withNewChildInternal(
      newChild: Expression): MinHashMd5Signature = copy(child = newChild)
}

object MinHashMd5Signature {
  private final val P = 2147483647L // 2^31 − 1

  /** (a_i, b_i) for h_i(x) = (a_i·x + b_i) mod p — THE single generator
    * behind the Spark plan, this kernel and the SQL oracle's literals
    * (`Dedup.minhashMd5Consts` delegates here), so they can never
    * drift. a_i is forced nonzero. */
  def consts(n: Int): Seq[(Long, Long)] =
    (0 until n).map { i =>
      val a = ((2L * i + 1L) * 2654435761L) % P
      val b = (i.toLong * 40503L * 65537L + 17L) % P
      (if (a == 0L) 1L else a, b)
    }

  private val constCache =
    new java.util.concurrent.ConcurrentHashMap[Int, (Array[Long], Array[Long])]()

  private def constArrays(n: Int): (Array[Long], Array[Long]) =
    constCache.computeIfAbsent(n, { k =>
      val cs = consts(k)
      (cs.map(_._1).toArray, cs.map(_._2).toArray)
    })

  private val md5Local = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  /** Shared by interpreted eval and generated code; null for an empty
    * (or all-null-element) shingle set — the no-row case of the explode
    * formulation. */
  def compute(shingles: ArrayData, n: Int): ArrayData = {
    val m = shingles.numElements()
    if (m == 0) return null
    val (as, bs) = constArrays(n)
    val out = Array.fill(n)(Long.MaxValue)
    val md = md5Local.get()
    var any = false
    var j = 0
    while (j < m) {
      val s = shingles.getUTF8String(j)
      if (s != null) {
        any = true
        val d = md.digest(s.getBytes)
        // first 7 hex chars of the digest == top 28 bits of bytes 0..3
        val h = ((d(0) & 0xffL) << 20) | ((d(1) & 0xffL) << 12) |
          ((d(2) & 0xffL) << 4) | ((d(3) & 0xffL) >>> 4)
        var i = 0
        while (i < n) {
          val v = (h * as(i) + bs(i)) % P
          if (v < out(i)) out(i) = v
          i += 1
        }
      }
      j += 1
    }
    if (!any) return null
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}
