package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys (the manual fallback when AQE's
  * runtime skew splitting isn't enough — e.g. a single consolidated bill
  * with millions of line items landing on one reducer).
  *
  * The fact table's key is salted into `saltBuckets` shards
  * (deterministically, by hashing the whole row's join-irrelevant ordinal
  * via `rand(seed)`-free `pmod(xxhash64(monotonic id), n)` would be
  * nondeterministic under retries — instead the salt hashes the row's own
  * columns); the dimension side is replicated once per salt value. Join
  * cardinality and results are IDENTICAL to the plain join — only the
  * shuffle distribution changes, every shard key now bounded by
  * |partition|/saltBuckets.
  *
  * Use when one side is small enough to replicate x saltBuckets but too
  * big (or too mid-sized) to broadcast outright.
  */
object SkewJoin {

  /** Inner equi-join of `big` (skewed) with `dim` on `key`, salted into
    * `saltBuckets` shards. `saltCols` picks the big-side columns whose hash
    * spreads a hot key's rows across shards (default: all of them). */
  def saltedJoin(big: DataFrame, dim: DataFrame, key: String,
                 saltBuckets: Int,
                 saltCols: Seq[Column] = Seq.empty): DataFrame = {
    require(saltBuckets > 0, "saltBuckets must be positive")
    val spread =
      if (saltCols.nonEmpty) saltCols
      else big.columns.map(col).toSeq
    val salted = big.withColumn("_salt",
      pmod(xxhash64(spread: _*), lit(saltBuckets.toLong)).cast("int"))
    val replicated = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }
}
