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

  /** Full alignment: restrict both sides to count-matched keys (J1-J3),
    * rank within key by each side's declared order (W1/W2), pair by
    * (key, rank) (J4). Column sets of `a` and `b` must be disjoint apart
    * from `key`.
    *
    * The count gate is folded INTO each side's ranking window: `count(*)
    * over (partition by key)` shares the window's hash partitioning, so the
    * per-key counts cost no extra shuffle or scan, and the gate becomes a
    * post-join filter `cnt_a = cnt_b`. Equivalent to semi-joining against a
    * separately-computed count-matched key set — the inner (key, rank) join
    * already limits pairs to min(cnt_a, cnt_b), and the filter kills every
    * pair of a mismatched key — but the separate formulation materialized
    * the valid-key subplan TWICE (once per semi-join side), re-scanning
    * both inputs; this shape scans each input exactly once. */
  def alignByOrdinal(
      a: DataFrame, b: DataFrame, key: String,
      orderA: Seq[Column], orderB: Seq[Column]): DataFrame = {
    def rank(df: DataFrame, order: Seq[Column], cnt: String): DataFrame = {
      val part = Window.partitionBy(key)
      df.withColumn("_rn", row_number().over(part.orderBy(order: _*)))
        .withColumn(cnt, count(lit(1)).over(part))
    }
    rank(a, orderA, "_cnt_a")
      .join(rank(b, orderB, "_cnt_b"), Seq(key, "_rn"))
      .where(col("_cnt_a") === col("_cnt_b"))
      .drop("_rn", "_cnt_a", "_cnt_b")
  }
}
