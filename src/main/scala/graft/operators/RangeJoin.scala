package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyed point-in-interval range join without a cross product.
  *
  * Spark plans `a.ts BETWEEN b.start AND b.end` (plus an equi-key) as an
  * equi-join on the key with the range as a post-filter — correct, but one
  * hot key degenerates to |points| x |intervals|. This operator adds TIME
  * BUCKETING as a second equi-dimension: points land in one fixed-width
  * bucket, intervals explode to every bucket they overlap, and the join
  * runs on (key, bucket) with the exact BETWEEN as a residual filter. Each
  * qualifying pair is produced exactly once (a point lives in exactly one
  * bucket), so no dedup pass. Shuffle volume scales with interval-width /
  * bucket-width, and `bucketSec` tunes the classic width trade: narrow
  * buckets replicate intervals, wide buckets admit more false candidates.
  */
object RangeJoin {

  /** Join `points` rows to `intervals` rows sharing `key` with
    * `point.ts in [start, end]` (inclusive). Column sets must be disjoint
    * apart from `key`; timestamps are compared at second precision. */
  def pointInInterval(points: DataFrame, intervals: DataFrame, key: String,
                      tsCol: String, startCol: String, endCol: String,
                      bucketSec: Long): DataFrame = {
    require(bucketSec > 0, "bucketSec must be positive")
    val overlap = points.columns.toSet.intersect(intervals.columns.toSet) - key
    require(overlap.isEmpty, s"column collision: $overlap")
    val p = points.withColumn("_bucket",
      floor(col(tsCol).cast("long") / bucketSec))
    val iv = intervals.withColumn("_bucket",
      explode(sequence(
        floor(col(startCol).cast("long") / bucketSec),
        floor(col(endCol).cast("long") / bucketSec))))
    p.join(iv, Seq(key, "_bucket"))
      .where(col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol))
      .drop("_bucket")
  }

  /** Interval x interval overlap join (inclusive endpoints) sharing `key`,
    * without a cross product and without a dedup pass.
    *
    * Both sides explode to every fixed-width bucket their interval
    * touches and the join runs on (key, bucket) with the exact overlap
    * predicate (`aStart <= bEnd && bStart <= aEnd`) as a residual filter.
    * Overlapping pairs share MANY buckets, so the naive plan emits
    * duplicates; instead of a `distinct` (a second shuffle over the full
    * result), each pair is kept only in the canonical bucket containing
    * `greatest(aStart, bStart)` — a point that lies inside both intervals
    * whenever they overlap, so exactly one copy survives, filtered before
    * anything downstream sees the row. Shuffle volume scales with
    * interval-width / bucket-width per side (same trade as
    * [[pointInInterval]]); at 100 TB the bucket width is tuned so the
    * per-(key,bucket) group fits an executor and no key degenerates to
    * |A| x |B|.
    *
    * Start/end columns must be LONG (callers cast dates to epoch days or
    * timestamps to epoch seconds — keeps the bucket arithmetic exact and
    * the operator agnostic to the time unit). Column sets must be
    * disjoint apart from `key`. */
  def intervalOverlap(left: DataFrame, right: DataFrame, key: String,
                      lStart: String, lEnd: String,
                      rStart: String, rEnd: String,
                      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val overlap = left.columns.toSet.intersect(right.columns.toSet) - key
    require(overlap.isEmpty, s"column collision: $overlap")
    val a = left.withColumn("_bucket",
      explode(sequence(floor(col(lStart) / bucketWidth),
        floor(col(lEnd) / bucketWidth))))
    val b = right.withColumn("_bucket",
      explode(sequence(floor(col(rStart) / bucketWidth),
        floor(col(rEnd) / bucketWidth))))
    a.join(b, Seq(key, "_bucket"))
      .where(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd) &&
        col("_bucket") === floor(greatest(col(lStart), col(rStart)) / bucketWidth))
      .drop("_bucket")
  }
}
