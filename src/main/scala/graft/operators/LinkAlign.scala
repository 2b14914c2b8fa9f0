package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Count-matched ordinal alignment — the reference engine's core linkage
  * semantic (SURVEY §2.3 J1-J4, ref `src/batch_train.py:91-126`).
  *
  * Two tables describe the same shipments at line-item grain but share no
  * line-item key — only a bill-of-lading key plus a per-bill item order. The
  * reference links them by (1) keeping only bills whose item COUNTS match on
  * both sides, then (2) pairing items positionally. In pandas that is
  * implicit row order + `zip`; the Spark translation makes the order explicit
  * and shuffle-safe: `row_number()` over (key, declared ordering) on each
  * side, then an equi-join on (key, rank).
  *
  * Scale shape: two partial+final hash aggregations (counts), one equi-join
  * of the count tables, two left-semi joins (AQE will broadcast the valid-key
  * set when small), one window + shuffle per side partitioned by key, and a
  * final equi-join on (key, rank) — every shuffle is on the link key, so AQE
  * reuses co-partitioning between the window and the final join. Key skew
  * (one consolidated bill with thousands of items) is handled by AQE skew
  * join; the window itself is bounded by the largest single bill, which the
  * count-equality gate keeps to physical-shipment size.
  */
object LinkAlign {

  /** Keys whose row counts match in `a` and `b` (J1 + J2). */
  def countMatchedKeys(a: DataFrame, b: DataFrame, key: String): DataFrame = {
    val ca = a.groupBy(key).agg(count(lit(1)).as("cnt_a"))
    val cb = b.groupBy(key).agg(count(lit(1)).as("cnt_b"))
    ca.join(cb, key).where(col("cnt_a") === col("cnt_b")).select(key)
  }

  /** Full alignment: restrict both sides to count-matched keys (J3), rank
    * within key by each side's declared order (W1/W2), pair by (key, rank)
    * (J4). Column sets of `a` and `b` must be disjoint apart from `key`.
    */
  def alignByOrdinal(
      a: DataFrame, b: DataFrame, key: String,
      orderA: Seq[Column], orderB: Seq[Column]): DataFrame = {
    val valid = countMatchedKeys(a, b, key)
    val av = a.join(valid, Seq(key), "left_semi")
      .withColumn("_rn", row_number().over(
        Window.partitionBy(key).orderBy(orderA: _*)))
    val bv = b.join(valid, Seq(key), "left_semi")
      .withColumn("_rn", row_number().over(
        Window.partitionBy(key).orderBy(orderB: _*)))
    av.join(bv, Seq(key, "_rn")).drop("_rn")
  }
}
