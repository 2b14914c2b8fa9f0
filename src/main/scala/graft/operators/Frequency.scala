package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Frequent-item (heavy-hitter) analysis — the "which values dominate this
  * column" question every corpus audit asks (dominant domains, boilerplate
  * tokens, hot join keys to salt).
  *
  * Two tiers, same contract as the dedup/ANN families: an EXACT pass
  * (one hash-aggregation shuffle — at 100 TB this is a map-side-combined
  * count per distinct value, fine whenever the distinct count fits a
  * shuffle) and a Misra–Gries SKETCH for columns whose distinct count
  * doesn't (bounded memory per partition, one narrow merge, superset
  * guarantee spec-pinned).
  */
object Frequency {

  /** Exact heavy hitters: values of `valueCol` whose count >= ceil(support
    * × total rows), with an integer parts-per-million share (combine-order
    * free, oracle-exact). One aggregation plus a broadcast scalar total —
    * the map-side partial combine does the heavy lifting, so the shuffle
    * carries one row per distinct value. */
  def heavyHitters(df: DataFrame, valueCol: String,
                   support: Double): DataFrame = {
    require(support > 0 && support <= 1, "support in (0,1]")
    val total = df.agg(count(lit(1)).as("_total"))
    df.groupBy(col(valueCol).as("value"))
      .agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(total))
      .where(col("n") >= ceil(lit(support) * col("_total")))
      .select(col("value"), col("n"),
        (col("n") * lit(1000000L) / col("_total")).cast("long")
          .as("share_ppm"))
  }

  /** Equi-width histogram of an integer column: `buckets` equal cells over
    * the observed [lo, hi], assignment `floor((x − lo)·buckets / (hi − lo))`
    * (last cell closed) — exact whenever `(x − lo)·buckets` stays below
    * 2^53, so the layout is engine-replayable bit for bit. One bounded
    * stats pass + one aggregation; empty cells are absent (sparse
    * output). */
  def histogram(df: DataFrame, valueCol: String, buckets: Int): DataFrame = {
    require(buckets >= 1, "buckets >= 1")
    val stats = df.agg(min(col(valueCol)).cast("long").as("_lo"),
      max(col(valueCol)).cast("long").as("_hi"))
    df.select(col(valueCol).cast("long").as("_x"))
      .crossJoin(broadcast(stats))
      .select(when(col("_hi") === col("_lo"), lit(0L))
        .otherwise(least(lit(buckets - 1L),
          floor(((col("_x") - col("_lo")) * buckets).cast("double") /
            (col("_hi") - col("_lo"))).cast("long"))).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("n"))
  }

  /** Misra–Gries heavy-hitter sketch: every value with true frequency
    * > total/k is guaranteed present (superset; no false negatives), and
    * each reported estimate undercounts its true count by at most
    * total/k — the classic bounds, spec-pinned. `est` is that
    * (under-)estimate, never above the true count.
    *
    * Scale shape: one `mapPartitions` pass holding at most k−1 counters
    * per partition (constant memory regardless of distinct count), then a
    * per-value sum of the bounded per-partition summaries. The merged
    * estimate of a value undercounts by at most the sum of per-partition
    * bounds — within the global total/k — so every true heavy hitter has
    * a POSITIVE merged estimate and the full candidate set (at most
    * P·(k−1) rows for P partitions) is the guaranteed superset. No
    * further cut happens here: trimming the merge to k−1 rows could drop
    * a true heavy hitter outranked by over-estimated cold values, so
    * callers wanting exactly the hitters confirm candidates with one
    * exact pass ([[heavyHitters]]) — the standard two-phase shape. */
  def heavyHittersSketch(df: DataFrame, valueCol: String, k: Int): DataFrame = {
    require(k >= 2, "k >= 2")
    import df.sparkSession.implicits._
    val summaries = df.select(col(valueCol).cast("string"))
      .as[String]
      .mapPartitions { it =>
        val counters = scala.collection.mutable.HashMap.empty[String, Long]
        it.foreach { v =>
          if (counters.contains(v)) counters(v) += 1L
          else if (counters.size < k - 1) counters(v) = 1L
          else {
            // decrement-all step; drop zeros (the MG eviction)
            val dead = scala.collection.mutable.ArrayBuffer.empty[String]
            counters.keysIterator.foreach { key =>
              val c = counters(key) - 1L
              if (c == 0L) dead += key else counters(key) = c
            }
            dead.foreach(counters.remove)
          }
        }
        counters.iterator.map { case (v, c) => (v, c) }
      }
      .toDF("value", "est")
    // merge: per-value sum of the bounded summaries — the whole candidate
    // set IS the superset guarantee (see scaladoc); no k-1 cut
    summaries.groupBy("value").agg(sum(col("est")).as("est"))
  }
}
