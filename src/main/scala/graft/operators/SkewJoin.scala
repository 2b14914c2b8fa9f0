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

  /** [[saltedJoin]] applied ONLY to detected hot keys; the cold mass
    * takes the plain equi-join. Blanket salting replicates the WHOLE
    * dimension × saltBuckets through the shuffle — at a 100 TB fact with
    * a 100 GB dimension that is the dominant cost, paid for every key
    * when only a handful are hot. Here a cheap deterministic sample of
    * the fact side estimates key frequencies; keys whose sampled count
    * reaches `hotSampleMin` split off into the salted path (dim rows
    * replicated only for THEM), everything else joins plainly, and the
    * two paths union.
    *
    * The classification CANNOT change the result — hot ∪ cold partitions
    * the key space, and each route computes the exact inner join for its
    * keys — so the sample only steers the plan: a missed hot key falls
    * back to AQE's runtime skew split; a false positive costs a few
    * replicated dim rows. The hot-key set is bounded by construction
    * (≤ sampled rows / hotSampleMin keys) and broadcast.
    *
    * ONE pass over the fact table beyond the sample: each side takes a
    * broadcast left-outer flag join against the hot set, cold rows route
    * to salt 0 on both sides (dim replicates a cold key exactly once),
    * hot fact rows spread across all `saltBuckets` shards with the dim
    * key replicated once per shard — a single salted equi-join computes
    * both routes. The earlier semi/anti + union form scanned `big` twice
    * more than this; at a 100 TB fact those extra scans dominate. */
  def saltedJoinHot(big: DataFrame, dim: DataFrame, key: String,
                    saltBuckets: Int,
                    saltCols: Seq[Column] = Seq.empty,
                    sampleFraction: Double = 1e-3,
                    hotSampleMin: Int = 8): DataFrame = {
    require(saltBuckets > 0, "saltBuckets must be positive")
    require(sampleFraction > 0 && sampleFraction <= 1, "bad sampleFraction")
    require(hotSampleMin >= 2, "hotSampleMin >= 2")
    import graft.Checkpoints.PinOps
    // internal helper columns must not shadow (or ambiguate with) user
    // columns on EITHER side — derive names outside both schemas.
    // Lower-cased comparison: Spark resolves column names
    // case-INsensitively by default, so a user column `_HOT` would
    // ambiguate with a generated `_hot` even though the strings differ
    val taken = (big.columns ++ dim.columns).map(_.toLowerCase).toSet
    def fresh(base: String): String =
      if (!taken(base.toLowerCase)) base
      else Iterator.from(1).map(base + _)
        .filterNot(n => taken(n.toLowerCase)).next()
    val hotCol = fresh("_hot")
    val saltCol = fresh("_salt")
    val cntCol = fresh("_cnt")
    val hot = big.select(col(key))
      .sample(withReplacement = false, sampleFraction, seed = 42)
      .groupBy(col(key)).agg(count(lit(1)).as(cntCol))
      .where(col(cntCol) >= hotSampleMin)
      .select(col(key), lit(true).as(hotCol))
      .pinLazy() // bounded table, two consumers — never recomputed
    val spread =
      if (saltCols.nonEmpty) saltCols
      else big.columns.map(col).toSeq
    // _hot is true or null after the outer join; when(null, …) takes the
    // otherwise branch, so cold keys land on salt 0 on both sides
    val salted = big.join(broadcast(hot), Seq(key), "left_outer")
      .withColumn(saltCol,
        when(col(hotCol),
          pmod(xxhash64(spread: _*), lit(saltBuckets.toLong)))
          .otherwise(lit(0L)).cast("int"))
      .drop(hotCol)
    val replicated = dim.join(broadcast(hot), Seq(key), "left_outer")
      .withColumn(saltCol, explode(
        when(col(hotCol), sequence(lit(0), lit(saltBuckets - 1)))
          .otherwise(sequence(lit(0), lit(0)))))
      .drop(hotCol)
    salted.join(replicated, Seq(key, saltCol)).drop(saltCol)
  }
}
