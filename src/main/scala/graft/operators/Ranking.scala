package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, JoinedRow}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.InternalRows
import org.apache.spark.sql.types.LongType

/** Global sequence numbers WITHOUT a global-sort-on-one-reducer: the
  * scale-correct alternative to `row_number() OVER (ORDER BY ...)` with
  * no partition, whose single-partition window funnels the whole table
  * through one task. Here the table is RANGE-partitioned and sorted on
  * the order key (a distributed sort), then each partition's row count
  * rolls up into per-partition offsets (driver state = one long per
  * partition) and every row gets offset + local index — two passes, all
  * of them distributed. This is the `zipWithIndex` pattern; it is also
  * why `buildVocab`-style post-limit rankers are the ONLY sanctioned
  * unpartitioned windows in this codebase (they rank ≤ k rows).
  */
object Ranking {

  /** Append a 0-based `seqCol` following the total order of `orderCols`.
    * Deterministic iff `orderCols` is a unique key (ties would leave
    * peer order partition-dependent — same contract as any total-order
    * ranking). One of the genuinely imperative per-partition cases where
    * the RDD layer is the right tool (SURVEY §4) — on the `InternalRow`
    * bridge ([[org.apache.spark.sql.graft.InternalRows]]): the old
    * `df.rdd`/`createDataFrame` hop paid a full external-row decode AND
    * re-encode of every row just to append one long. */
  def globalRowNumbers(df: DataFrame, orderCols: Seq[String],
                       seqCol: String = "seq"): DataFrame = {
    require(orderCols.nonEmpty, "at least one order column")
    require(!df.columns.contains(seqCol), s"column $seqCol already exists")
    val sorted = df
      .repartitionByRange(orderCols.map(col): _*)
      .sortWithinPartitions(orderCols.map(col): _*)
    val withSeq = InternalRows.toRdd(sorted).zipWithIndex()
      .mapPartitions { it =>
        // reused buffers, per the scan-node row contract (the downstream
        // scan projects each row to unsafe before any buffering)
        val extra = new GenericInternalRow(1)
        val joined = new JoinedRow
        it.map { case (r, i) =>
          extra.update(0, i); joined(r, extra): InternalRow }
      }
    InternalRows.toDataFrame(df, withSeq,
      sorted.schema.add(seqCol, LongType, nullable = false))
  }

  /** Per-group percentile rank of EVERY row in ppm:
    * `(rank−1)·1e6 div (n−1)` — 0 for the group minimum, 1,000,000 for
    * the maximum, single-row groups pin to 0. Rank-based normalization
    * makes quality scores from heterogeneous sources mixable on one
    * scale (the full-table analog of [[TextAnalysis.rrfFuse]]'s top-k
    * reciprocal ranks), in pure integer math so the normalized column
    * is SQL-replayable hash-exactly.
    *
    * One group-partitioned sort window (`row_number` + the group count
    * share the partitioning — a single shuffle). `tiebreakCols` must
    * complete a total order so equal values get deterministic distinct
    * ranks (ties get adjacent ppm values, not equal ones — by design:
    * the output is a total ordering, not a distribution estimate).
    * Output: the input columns + `pct_ppm`. */
  def percentileRanks(df: DataFrame, valueCol: String,
                      groupCols: Seq[String],
                      tiebreakCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty, "at least one group column")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy((col(valueCol) +: tiebreakCols.map(col)).map(_.asc): _*)
    val wg = Window.partitionBy(groupCols.map(col): _*)
    df.withColumn("_rn", row_number().over(w).cast("long"))
      .withColumn("_n", count(lit(1)).over(wg))
      .withColumn("pct_ppm",
        when(col("_n") === 1L, lit(0L)).otherwise(
          // decimal(38,0): rank·10⁶ passes int64 in trillion-row groups
          expr("cast((cast(_rn - 1 as decimal(38,0)) * 1000000) " +
            "div (_n - 1) as bigint)")))
      .drop("_rn", "_n")
  }

  /** Exact per-group percentiles by integer rank selection: percentile
    * `p` (percent) of a group of `n` ordered values is the value at
    * 1-based rank `max(1, ceil(p·n/100))` — the nearest-rank definition.
    * All integer math, no interpolation doubles, so the result is
    * SQL-replayable hash-exactly; the generalization of the lower-median
    * selection (`a_exact_median`) to arbitrary percentile lists.
    *
    * Scale shape: ONE shuffle — `row_number` and the group count share
    * the group partitioning; the per-group sort is the unavoidable cost
    * of exact order statistics (the approximate-quantile sketch is the
    * at-scale alternative when a per-group sort won't fit). Rows are
    * first filtered to the |ps| selected ranks (an OR of rank tests,
    * row-local), and only the ≤ groups·|ps| survivors explode to attach
    * their percentile label — the explode never multiplies the full
    * table.
    *
    * `tiebreakCols` must make the order total for a deterministic plan,
    * but any tie order selects the same VALUE at a given rank, so the
    * output is tie-order-independent. Output: groupCols…, p, value, n. */
  def exactPercentiles(df: DataFrame, valueCol: String,
                       groupCols: Seq[String], tiebreakCols: Seq[String],
                       ps: Seq[Int]): DataFrame = {
    require(groupCols.nonEmpty, "at least one group column")
    require(ps.nonEmpty && ps.forall(p => p >= 1 && p <= 100),
      "percentiles must be in 1..100")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy((col(valueCol) +: tiebreakCols.map(col)).map(_.asc): _*)
    val wg = Window.partitionBy(groupCols.map(col): _*)
    val ranked = df
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(wg))
    val anyRank = ps.map(p =>
      col("rn") === greatest(lit(1L), expr(s"($p * n + 99) div 100")))
      .reduce(_ || _)
    ranked
      .where(anyRank)
      .withColumn("p", explode(array(ps.map(p => lit(p.toLong)): _*)))
      .where(col("rn") === greatest(lit(1L), expr("(p * n + 99) div 100")))
      .select((groupCols.map(col) :+ col("p") :+
        col(valueCol).as("value") :+ col("n")): _*)
  }

  /** Distributed n-tile scores WITHOUT `NTILE() OVER (ORDER BY …)`'s
    * single-partition window: rows are sequenced by [[globalRowNumbers]]
    * (range-partitioned sort, all distributed) and scored
    * `seq·k div n + 1` ∈ 1..k. Bucket sizes differ from SQL NTILE by at
    * most one row at the boundaries (NTILE front-loads the remainder;
    * this formula spreads it evenly) — a documented, deterministic
    * convention the SQL twin replays with the same row_number formula.
    * `orderCols` must be a unique total order (ascending). Output: the
    * input columns + `scoreCol`. */
  def ntileScores(df: DataFrame, orderCols: Seq[String], k: Int,
                  scoreCol: String): DataFrame = {
    require(k >= 1, "k >= 1")
    val withSeq = globalRowNumbers(df, orderCols)
    val tot = withSeq.agg(count(lit(1)).as("_n"))
    withSeq.crossJoin(broadcast(tot))
      .withColumn(scoreCol, expr(s"(seq * $k) div _n + 1"))
      .drop("seq", "_n")
  }

  /** Exact weighted median per group: the smallest value whose
    * cumulative weight (in value order) reaches half the group's total
    * weight — `min v : 2·cumw(v) ≥ totw`. Tie order among equal values
    * cannot change the answer (a value qualifies iff the cumulative
    * weight at the END of its run qualifies, which is order-free), so
    * the result is deterministic without tiebreak columns and replays
    * hash-exactly in SQL. The weighted generalization of the exact
    * median — "the price at which half the shipped quantity is cheaper".
    *
    * Scale shape: ONE shuffle — the cumulative and total windows and the
    * final agg all key on the group columns; per-group cost is the sort.
    * Output: (groupCols*, weighted_median, total_weight). */
  def weightedMedian(df: DataFrame, valueCol: String, weightCol: String,
                     groupCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty, "at least one group column")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col("_v").asc)
    val wg = Window.partitionBy(groupCols.map(col): _*)
    df
      .withColumn("_v", col(valueCol).cast("long"))
      .withColumn("_w", col(weightCol).cast("long"))
      .withColumn("_cumw", sum(col("_w")).over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("_totw", sum(col("_w")).over(wg))
      .where(col("_cumw") * 2 >= col("_totw"))
      .groupBy(groupCols.map(col): _*)
      .agg(min(col("_v")).as("weighted_median"),
        max(col("_totw")).as("total_weight"))
  }

  /** Winsorized mean per group: values are clamped to the [loP, hiP]
    * nearest-rank percentile cuts (the same `max(1, ceil(p·n/100))` rank
    * selection as [[exactPercentiles]]) before summing — the
    * outlier-robust mean that, unlike trimming, keeps n constant. All
    * integer: the clamped sum is exact, the mean is ppm-scaled
    * truncating division.
    *
    * Scale shape: ONE shuffle on the group key feeding a rank window and
    * the group-max windows that broadcast the two cut values to every
    * row (no self-join back), then a hash aggregation. `tiebreakCols`
    * extend the value order to a total order so rank selection is
    * deterministic. Output: (groupCols*, n, lo_cut, hi_cut, wsum,
    * wmean_ppm). */
  def winsorizedMean(df: DataFrame, valueCol: String,
                     groupCols: Seq[String], tiebreakCols: Seq[String],
                     loP: Int, hiP: Int): DataFrame = {
    require(1 <= loP && loP < hiP && hiP <= 100, "need 1 <= loP < hiP <= 100")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy((col("_v") +: tiebreakCols.map(col)).map(_.asc): _*)
    val wg = Window.partitionBy(groupCols.map(col): _*)
    def cut(p: Int) = greatest(lit(1L), expr(s"($p * n + 99) div 100"))
    df
      .withColumn("_v", col(valueCol).cast("long"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(wg))
      .withColumn("_lo", max(when(col("rn") === cut(loP), col("_v"))).over(wg))
      .withColumn("_hi", max(when(col("rn") === cut(hiP), col("_v"))).over(wg))
      .groupBy(groupCols.map(col): _*)
      .agg(max(col("n")).as("n"), max(col("_lo")).as("lo_cut"),
        max(col("_hi")).as("hi_cut"),
        sum(greatest(col("_lo"), least(col("_hi"), col("_v")))).as("wsum"))
      .select(groupCols.map(col) :+ col("n") :+ col("lo_cut") :+
        col("hi_cut") :+ col("wsum") :+
        expr("cast(cast(wsum as decimal(38,0)) * 1000000 div n as bigint)")
          .as("wmean_ppm"): _*)
  }
}
