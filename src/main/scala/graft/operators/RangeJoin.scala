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
}
