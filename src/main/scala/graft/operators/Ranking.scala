package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, JoinedRow}
import org.apache.spark.sql.expressions.Window
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
  *
  * The same discipline extends to PER-GROUP order statistics: a
  * `Window.partitionBy(group).orderBy(value)` funnels each group through
  * ONE task, which is fine for many small groups but dies when a handful
  * of giant groups hold the table (3 return flags × 2 G rows each). The
  * exact order-statistic operators here therefore never sort raw rows
  * per group; they collapse to distinct (group, value) runs first (a
  * map-side-combining aggregation) and cumulate the run weights with
  * [[PrefixScan]]'s distributed carry-in scan ([[groupedRuns]]), or —
  * when every row needs its own rank ([[percentileRanks]]) — rebase a
  * tie-run-local row_number onto the run's prefix base. No path sorts
  * a whole group inside a single task.
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

  /** Collapsed value runs with per-group cumulative weights, computed
    * WITHOUT a per-group window: one map-side-combining aggregation to
    * distinct (group, value) runs (each carrying its total `weight` as
    * `_c`), then [[PrefixScan.groupedRunningLong]]'s SEGMENTED running
    * sum over the GLOBAL (group, value) order — group-local `_cum` and
    * the group total `n` fall out of the same two-pass scan.
    * Every pass is distributed; the per-group "sort" happens
    * inside the range shuffle across ALL tasks, so three 2-billion-row
    * groups cost the same as six million small ones.
    *
    * r18 shipped this as a GLOBAL prefix scan rebased per group through
    * a per-group statistics aggregation joined back by an explicit
    * broadcast. r19 replaced that with the segmented scan: the stats
    * branch re-sorted the run table, paid two aggregate stages and a
    * broadcast build per call — and the broadcast was unbounded in the
    * group count (a near-unique grouping could blow the 8 GB broadcast
    * cap, the r18 advice risk). Now there is no join at all.
    *
    * Output: groupCols…, `valueCol`, `_c` (run weight), `n` (group
    * total), `_cum` (inclusive cumulative weight at the END of this
    * value's run, in ascending value order). NULL values collapse into
    * one run that sorts first — identical to a window's asc-nulls-first.
    */
  private[operators] def groupedRuns(df: DataFrame, groupCols: Seq[String],
                                     valueCol: String,
                                     weight: Column): DataFrame =
    groupedRunsFromCounts(
      runCounts(df, groupCols, valueCol, weight), groupCols, valueCol)

  /** The run-collapse half of [[groupedRuns]]: one map-side-combining
    * aggregation to distinct (group, value) rows carrying their total
    * weight as `_c`. Exposed within the package so operators that need
    * TWO selections over related value columns (MAD) can derive the
    * second run table from the first instead of re-aggregating the
    * input. */
  private[operators] def runCounts(df: DataFrame, groupCols: Seq[String],
                                   valueCol: String,
                                   weight: Column): DataFrame = {
    val gv = groupCols :+ valueCol
    // coalesce(0): a NULL weight contributes nothing to any cumulative
    // (the window form's sum-skips-nulls behavior); without it a run of
    // only-null weights would reach PrefixScan's loud null check
    val w = coalesce(weight.cast("long"), lit(0L))
    df
      // NON-NEGATIVE weight contract, enforced loudly: the segmented
      // scan's carry stitching is only valid when prefix sums are
      // monotone — a negative weight would silently corrupt cumulative
      // weights for every run sorting after it. For the internal
      // lit(1L) callers the branch constant-folds away.
      .select(gv.map(col) :+
        when(w < 0, raise_error(concat(
          lit("groupedRuns: negative weight "), w.cast("string"),
          lit(" — weights must be non-negative"))))
          .otherwise(w).as("_c"): _*)
      .groupBy(gv.map(col): _*)
      .agg(sum(col("_c")).as("_c"))
  }

  /** [[groupedRuns]] over a pre-collapsed run table (`groupCols…,
    * valueCol, _c` with `_c` the non-negative run weight): the segmented
    * prefix scan appends `_cum` and `n`. */
  private[operators] def groupedRunsFromCounts(counts: DataFrame,
                                               groupCols: Seq[String],
                                               valueCol: String): DataFrame =
    PrefixScan.groupedRunningLong(counts, groupCols, Seq(valueCol), "_c",
      cumCol = "_cum", totCol = "n")
      .select((groupCols :+ valueCol :+ "_c" :+ "n" :+ "_cum").map(col): _*)

  /** Inner equi-join on `keys` that MATCHES null keys (`<=>`), keeping
    * the left side's key columns — a grouped-statistics join must not
    * silently drop NULL groups the way a plain equi-join would (a window
    * form keeps them, so must the join form). */
  private def nullSafeEquiJoin(left: DataFrame, right: DataFrame,
                               keys: Seq[String]): DataFrame = {
    val renamed = keys.zipWithIndex.foldLeft(right) { case (r, (k, i)) =>
      r.withColumnRenamed(k, s"_rk$i")
    }
    val cond = keys.zipWithIndex
      .map { case (k, i) => left(k) <=> renamed(s"_rk$i") }
      .reduce(_ && _)
    keys.indices.foldLeft(left.join(renamed, cond)) { (d, i) =>
      d.drop(s"_rk$i")
    }
  }

  /** 1-based nearest-rank cut for percentile `p` (a SQL fragment — a
    * literal or a column name) of `n` rows: `max(1, ceil(p·n/100))`,
    * in exact integer `div` over a column named `n`. */
  private def cutRank(p: String): Column =
    greatest(lit(1L), expr(s"(($p) * n + 99) div 100"))

  /** Does this run (cumulative `_cum`, weight `_c`) contain rank
    * `cutRank(p)`? */
  private def runHas(p: String): Column = {
    val r = cutRank(p)
    col("_cum") >= r && (col("_cum") - col("_c")) < r
  }

  /** Per-group percentile rank of EVERY row in ppm:
    * `(rank−1)·1e6 div (n−1)` — 0 for the group minimum, 1,000,000 for
    * the maximum, single-row groups pin to 0. Rank-based normalization
    * makes quality scores from heterogeneous sources mixable on one
    * scale (the full-table analog of [[TextAnalysis.rrfFuse]]'s top-k
    * reciprocal ranks), in pure integer math so the normalized column
    * is SQL-replayable hash-exactly.
    *
    * Scale shape: the rank splits into a run base + a tie offset. The
    * base (`_cum − _c`, rows of the group strictly below this value)
    * comes from [[groupedRuns]] — collapse + distributed prefix scan —
    * and joins back on (group, value), which also PARTITIONS the table
    * by (group, value) for the only window here: a `row_number` over the
    * TIE RUN (same partitioning — no extra exchange). The single-task
    * unit is therefore a tie run, never a group: fine as long as no
    * single (group, value) pair dominates the table — the natural state
    * of a score column (ties are collisions, not mass). A constant
    * column is the degenerate case; rank-normalizing a constant is
    * meaningless, so the contract is documented rather than defended.
    * `tiebreakCols` must complete a total order so equal values get
    * deterministic distinct ranks (ties get adjacent ppm values, not
    * equal ones — by design: the output is a total ordering, not a
    * distribution estimate).
    * Output: the input columns + `pct_ppm`. */
  def percentileRanks(df: DataFrame, valueCol: String,
                      groupCols: Seq[String],
                      tiebreakCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty, "at least one group column")
    require(tiebreakCols.nonEmpty, "tiebreakCols must complete a total order")
    Seq("_rn", "_c", "_cum", "n").foreach(c =>
      require(!df.columns.contains(c), s"column $c already exists"))
    import org.apache.spark.sql.expressions.Window
    val gv = groupCols :+ valueCol
    val runs = groupedRuns(df, groupCols, valueCol, lit(1L))
    val wt = Window.partitionBy(gv.map(col): _*)
      .orderBy(tiebreakCols.map(col(_).asc): _*)
    nullSafeEquiJoin(df, runs, gv)
      .withColumn("_rn",
        col("_cum") - col("_c") + row_number().over(wt).cast("long"))
      .withColumn("pct_ppm",
        when(col("n") === 1L, lit(0L)).otherwise(
          // decimal(38,0): rank·10⁶ passes int64 in trillion-row groups
          expr("cast((cast(_rn - 1 as decimal(38,0)) * 1000000) " +
            "div (n - 1) as bigint)")))
      .select(df.columns.map(col) :+ col("pct_ppm"): _*)
  }

  /** Exact per-group percentiles by integer rank selection: percentile
    * `p` (percent) of a group of `n` ordered values is the value at
    * 1-based rank `max(1, ceil(p·n/100))` — the nearest-rank definition.
    * All integer math, no interpolation doubles, so the result is
    * SQL-replayable hash-exactly; the generalization of the lower-median
    * selection (`a_exact_median`) to arbitrary percentile lists.
    *
    * Scale shape: [[groupedRuns]] — collapse to distinct (group, value)
    * runs, distributed prefix-scan the run counts, and pick the runs
    * containing the selected ranks (a row-local test). Rows explode to
    * attach percentile labels only AFTER the rank filter, so the explode
    * touches ≤ groups·|ps| rows. Tie order cannot exist (runs are
    * distinct values), so the output needs no tiebreak contract at all.
    * Output: groupCols…, p, value, n. */
  def exactPercentiles(df: DataFrame, valueCol: String,
                       groupCols: Seq[String], ps: Seq[Int]): DataFrame = {
    require(groupCols.nonEmpty, "at least one group column")
    require(ps.nonEmpty && ps.forall(p => p >= 1 && p <= 100),
      "percentiles must be in 1..100")
    val runs = groupedRuns(df, groupCols, valueCol, lit(1L))
    val anyHit = ps.map(p => runHas(p.toString)).reduce(_ || _)
    runs
      .where(anyHit)
      .withColumn("p", explode(array(ps.map(p => lit(p.toLong)): _*)))
      .where(runHas("p"))
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
    // count the INPUT, not the sequenced table: globalRowNumbers preserves
    // cardinality, and counting its output re-ran the whole range-sort +
    // zipWithIndex lineage (a full extra pass) for a number the un-sorted
    // scan yields with column pruning (r19)
    val tot = df.agg(count(lit(1)).as("_n"))
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
    * Weights must be NON-NEGATIVE (nulls count as zero): the run-collapse
    * derivation needs monotone prefix sums, and a negative weight raises
    * a loud runtime error rather than corrupting downstream groups.
    *
    * Scale shape: [[groupedRuns]] with the row weight as the run weight
    * — collapse, distributed prefix scan, then one bounded aggregation
    * over the qualifying runs. Output: (groupCols*, weighted_median,
    * total_weight). */
  def weightedMedian(df: DataFrame, valueCol: String, weightCol: String,
                     groupCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty, "at least one group column")
    val slim = df.select(groupCols.map(col) :+
      col(valueCol).cast("long").as("_v") :+
      col(weightCol).cast("long").as("_w"): _*)
    groupedRuns(slim, groupCols, "_v", col("_w"))
      .where(col("_cum") * 2 >= col("n"))
      .groupBy(groupCols.map(col): _*)
      .agg(min(col("_v")).as("weighted_median"),
        max(col("n")).as("total_weight"))
  }

  /** Winsorized mean per group: values are clamped to the [loP, hiP]
    * nearest-rank percentile cuts (the same `max(1, ceil(p·n/100))` rank
    * selection as [[exactPercentiles]]) before summing — the
    * outlier-robust mean that, unlike trimming, keeps n constant. All
    * integer: the clamped sum is exact, the mean is ppm-scaled
    * truncating division.
    *
    * Scale shape: [[groupedRuns]] — the cuts fall out of the run table
    * with a row-local rank test + a per-group aggregation (one row per
    * group, broadcast back), and the clamped sum is `Σ run_count ·
    * clamp(value)` over the SAME run table, so no pass ever revisits raw
    * rows after the initial collapse. The per-run product accumulates in
    * decimal(38,0) (run_count · value can pass int64 where the per-row
    * sum never could). Output: (groupCols*, n, lo_cut, hi_cut, wsum,
    * wmean_ppm). */
  def winsorizedMean(df: DataFrame, valueCol: String,
                     groupCols: Seq[String],
                     loP: Int, hiP: Int): DataFrame = {
    require(1 <= loP && loP < hiP && hiP <= 100, "need 1 <= loP < hiP <= 100")
    val slim = df.select(groupCols.map(col) :+
      col(valueCol).cast("long").as("_v"): _*)
    val runs = groupedRuns(slim, groupCols, "_v", lit(1L))
    val cuts = runs
      .groupBy(groupCols.map(col): _*)
      .agg(max(col("n")).as("n"),
        max(when(runHas(loP.toString), col("_v"))).as("lo_cut"),
        max(when(runHas(hiP.toString), col("_v"))).as("hi_cut"))
    nullSafeEquiJoin(runs.drop("n"), broadcast(cuts), groupCols) // 1 row/group
      .groupBy(groupCols.map(col): _*)
      .agg(max(col("n")).as("n"), max(col("lo_cut")).as("lo_cut"),
        max(col("hi_cut")).as("hi_cut"),
        sum(expr("cast(_c as decimal(38,0))") *
          greatest(col("lo_cut"), least(col("hi_cut"), col("_v"))))
          .cast("long").as("wsum"))
      .select(groupCols.map(col) :+ col("n") :+ col("lo_cut") :+
        col("hi_cut") :+ col("wsum") :+
        expr("cast(cast(wsum as decimal(38,0)) * 1000000 div n as bigint)")
          .as("wmean_ppm"): _*)
  }
}
