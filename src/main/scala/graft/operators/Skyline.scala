package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed 2-D skyline (Pareto frontier): the rows not DOMINATED by
  * any other row, where `o` dominates `s` iff `o.x ≥ s.x ∧ o.y ≥ s.y`
  * and at least one inequality is strict — multi-objective top-k's
  * cousin ("best customers by spend AND frequency" with no weighting).
  *
  * The naive form is an all-pairs NOT EXISTS (the SQL oracle replays
  * exactly that at test scale). The engine's form is O(n log n) and
  * never all-pairs, by the classic sweep decomposition:
  *
  *   1. within each x-group only the max-y rows can survive (anything
  *      lower is dominated by its own group) — one hash aggregate;
  *   2. across groups, a survivor needs `y` STRICTLY above every y at
  *      strictly greater x — an EXCLUSIVE running max of y in x-DESC
  *      order, which is [[PrefixScan]]'s distributed carry-in scan (the
  *      skyline case its scaladoc names), never a one-partition window;
  *   3. tied duplicates of a frontier point all survive: the scan runs
  *      on the DISTINCT (x, max-y) set — x unique makes the scan order
  *      total, hence deterministic — and a final semi-join fans the
  *      frontier back out to every tied input row.
  *
  * Scale shape: one aggregate + one range shuffle + one broadcast-able
  * semi-join (the frontier is small — ~O(log n) points under any
  * independence of the two dims; worst case it is the anti-chain the
  * data actually contains). Driver state = one long per partition
  * (PrefixScan's carries). Maximization only: negate a column upstream
  * to minimize it. */
object Skyline {

  /** Skyline of `df` maximizing LONG columns (`xCol`, `yCol`); all other
    * columns ride along. Tied duplicates of a frontier point are all
    * kept (no row is an arbitrary pick — same determinism contract as
    * the rest of the registry). */
  def pareto2d(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val x = col(xCol)
    val y = col(yCol)
    // (1) per-x candidate: the max y at each distinct x — one row per x,
    // so the x-desc scan order below is TOTAL (deterministic carries)
    val perX = df.groupBy(x).agg(max(y).as(yCol))
    // (2) exclusive running max of y while sweeping x downward: a
    // candidate survives iff its y strictly beats every y seen at
    // strictly greater x (first row's exclusive prefix is the neutral
    // Long.MinValue — it always survives)
    val swept = PrefixScan.runningLong(
      perX.withColumn("_neg_x", -x), Seq("_neg_x"), yCol,
      PrefixScan.Max, exclCol = "_y_before", inclCol = "_y_incl")
    val frontier = swept.where(y > col("_y_before")).select(x, y)
    // (3) fan the frontier back out to every tied input row
    df.join(frontier.hint("broadcast"), Seq(xCol, yCol), "left_semi")
  }
}
