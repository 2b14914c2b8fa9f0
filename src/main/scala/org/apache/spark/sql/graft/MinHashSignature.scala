package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** MinHash signature of a hashed-shingle set as ONE codegen'd expression:
  * position i of the output is `min over shingles of xxhash64(shingle,
  * salt_i)` with per-position salts derived like Spark's seeded `xxhash64`.
  *
  * At corpus scale the signature pass dominates MinHash-LSH dedup — it is
  * numHashes × |shingles| hash evaluations per document. The higher-order
  * function formulation (`aggregate`/`zip_with`/`transform`) runs
  * interpreted and allocates a numHashes-element array per shingle; this
  * expression is a tight primitive long loop inside whole-stage codegen:
  * no boxing, no per-shingle allocation, shingle-major for cache locality
  * (measured ~10x on the sf0.1 bench — see Dedup.minhashLshPairs).
  */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {

  require(numHashes > 0, "numHashes must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_signature needs array<bigint>, got ${other.catalogString}")
    }

  /** Per-position salts, matching `xxhash64(lit(i), x)` fold order
    * (int seed hashed first with Spark's default seed 42). */
  @transient private lazy val salts: Array[Long] =
    Array.tabulate(numHashes)(i => XXH64.hashInt(i, 42L))

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = Array.fill(numHashes)(Long.MaxValue)
    var j = 0
    while (j < n) {
      val v = arr.getLong(j)
      var i = 0
      while (i < numHashes) {
        val h = XXH64.hashLong(v, salts(i))
        if (h < out(i)) out(i) = h
        i += 1
      }
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val saltsRef = ctx.addReferenceObj("salts", salts, "long[]")
    val xxh = classOf[XXH64].getName
    val unsafeArr = classOf[UnsafeArrayData].getName
    nullSafeCodeGen(ctx, ev, a => {
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val v = ctx.freshName("v")
      val h = ctx.freshName("h")
      val n = ctx.freshName("n")
      s"""
         |long[] $out = new long[$numHashes];
         |java.util.Arrays.fill($out, Long.MAX_VALUE);
         |int $n = $a.numElements();
         |for (int $j = 0; $j < $n; $j++) {
         |  long $v = $a.getLong($j);
         |  for (int $i = 0; $i < $numHashes; $i++) {
         |    long $h = $xxh.hashLong($v, $saltsRef[$i]);
         |    if ($h < $out[$i]) $out[$i] = $h;
         |  }
         |}
         |${ev.value} = $unsafeArr.fromPrimitiveArray($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}
