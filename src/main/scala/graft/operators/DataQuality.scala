package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.Checkpoints.PinOps

/** Declarative data-quality report over a table — the pre-training audit
  * pass of a data pipeline (completeness, uniqueness, domain/range
  * conformance), computed as ONE aggregation pass regardless of how many
  * rules are declared: every rule compiles to a conditional-count
  * expression in a single `agg`, so adding rules never adds scans or
  * shuffles. Output is long format (rule, n_violations, n_rows) so reports
  * from many tables union cleanly.
  */
object DataQuality {

  sealed trait Rule { def name: String; def violation: Column }

  /** Column must be non-null (and non-blank for strings). */
  case class Complete(colName: String) extends Rule {
    val name = s"complete($colName)"
    def violation: Column =
      col(colName).isNull || trim(col(colName).cast("string")) === ""
  }

  /** Predicate must hold on every row. */
  case class Satisfies(name: String, predicate: Column) extends Rule {
    def violation: Column = !coalesce(predicate, lit(false))
  }

  /** Value must fall in [lo, hi]. */
  case class InRange(colName: String, lo: Double, hi: Double) extends Rule {
    val name = s"in_range($colName,$lo,$hi)"
    def violation: Column =
      col(colName).isNull || col(colName) < lo || col(colName) > hi
  }

  /** Report: one row per rule with its violation count. */
  def report(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "at least one rule")
    require(rules.map(_.name).distinct.size == rules.size,
      "rule names must be distinct: " +
        rules.map(_.name).diff(rules.map(_.name).distinct).distinct.mkString(", "))
    val aggs = count(lit(1)).as("n_rows") +:
      rules.zipWithIndex.map { case (r, i) =>
        sum(when(r.violation, 1L).otherwise(0L)).as(s"_v_$i")
      }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val pairs = rules.zipWithIndex.flatMap { case (r, i) =>
      Seq(lit(r.name), col(s"_v_$i"))
    }
    wide.select(col("n_rows"),
      explode(map(pairs: _*)).as(Seq("rule", "n_violations")))
      .select("rule", "n_violations", "n_rows")
  }

  /** Uniqueness is the one check needing its own aggregation (a distinct
    * count can't ride in the conditional-count pass): number of key tuples
    * occurring more than once. */
  def duplicateKeys(df: DataFrame, keyCols: Seq[String]): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n_occurrences"))
      .where(col("n_occurrences") > 1)

  /** Distribution DRIFT report between two snapshots of a table (old
    * release vs new crawl, yesterday vs today): per column, row counts,
    * null counts and distinct counts on each side, plus an integer-exact
    * drift verdict — null rates compared in ppm (cross-multiplied, no
    * float ratio), distinct counts compared as a >`tolPct`% relative
    * change in either direction. One aggregation pass per side no matter
    * how many columns (multiple distinct aggregates ride Spark's Expand),
    * long-format output so reports from many tables union cleanly.
    *
    * The verdict flags WHERE to look, deliberately from cheap whole-column
    * aggregates — at 100 TB this is the triage pass before any expensive
    * per-value histogram diff. */
  def driftReport(a: DataFrame, b: DataFrame, cols: Seq[String],
                  tolPct: Int = 10): DataFrame = {
    require(cols.nonEmpty, "at least one column")
    def side(df: DataFrame, suffix: String) = {
      // coalesce: sum over an EMPTY side is null, and a null would turn
      // the drift verdicts null right when drift is maximal (a snapshot
      // vanished) — zero is the correct empty-side count
      val aggs = count(lit(1)).as(s"n$suffix") +: cols.zipWithIndex.flatMap {
        case (c, i) => Seq(
          coalesce(sum(col(c).isNull.cast("long")), lit(0L)).as(s"_nu_$i"),
          countDistinct(col(c)).as(s"_nd_$i"))
      }
      val wide = df.agg(aggs.head, aggs.tail: _*)
      val pairs = cols.zipWithIndex.flatMap { case (c, i) =>
        Seq(lit(c), struct(col(s"_nu_$i").as("nu"), col(s"_nd_$i").as("nd")))
      }
      wide.select(col(s"n$suffix"),
        explode(map(pairs: _*)).as(Seq("column", "s")))
        .select(col("column"), col(s"n$suffix"),
          col("s.nu").as(s"n_null$suffix"), col("s.nd").as(s"n_distinct$suffix"))
    }
    side(a, "_a").join(side(b, "_b"), "column")
      .withColumn("null_drift",
        // cross-multiplied in decimal(38,0): row-count products overflow
        // a long once both sides pass ~10^9 rows
        (abs(col("n_null_a").cast("decimal(38,0)") * col("n_b") -
          col("n_null_b").cast("decimal(38,0)") * col("n_a")) * 100 >
          col("n_a").cast("decimal(38,0)") * col("n_b") * tolPct)
          .cast("long"))
      .withColumn("distinct_drift",
        (col("n_distinct_a") * 100 > col("n_distinct_b") * (100 + tolPct) ||
          col("n_distinct_b") * 100 > col("n_distinct_a") * (100 + tolPct))
          .cast("long"))
  }

  /** MAD-based outlier flags per group: a value is an outlier when its
    * absolute deviation from the group's (lower) median exceeds
    * `k` × the group's median absolute deviation. The ROBUST complement
    * to the z-score gate (`events_anomaly`): extreme values inflate a
    * mean/std-dev and mask themselves, while medians are unmoved by any
    * minority of outliers — the standard robust-statistics filter for
    * data curation. All math is exact integer (rank-selected medians via
    * [[Ranking.exactPercentiles]] at p=50 — nearest-rank == the lower
    * median — and an integer threshold compare), so the verdict is
    * SQL-replayable hash-exactly.
    *
    * Scale shape: two run-collapsed distributed median selections
    * ([[Ranking.exactPercentiles]] — no per-group sort task) and two
    * joins of the per-group statistics back to the rows. The statistic
    * tables have |groups| rows and are explicitly broadcast — the
    * contract is a bounded group dimension (flags, priorities,
    * languages); for per-entity groups at extreme cardinality,
    * reformulate with windows instead of joins.
    *
    * `valueCol` must be integral. Output: the input columns + `med`,
    * `mad`, `is_outlier` (0/1 long). */
  def madOutliers(df: DataFrame, valueCol: String, groupCols: Seq[String],
                  k: Int = 3): DataFrame = {
    require(k >= 1, "k >= 1")
    val slim = (groupCols :+ valueCol).distinct
    val medTab = Ranking.exactPercentiles(
      df.select(slim.map(col): _*), valueCol, groupCols, ps = Seq(50))
      .select((groupCols.map(col) :+ col("value").as("med")): _*)
    val withMed = df.join(broadcast(medTab), groupCols)
      .withColumn("_absdev", abs(col(valueCol) - col("med")))
    val madTab = Ranking.exactPercentiles(
      withMed.select((groupCols :+ "_absdev").map(col): _*), "_absdev",
      groupCols, ps = Seq(50))
      .select((groupCols.map(col) :+ col("value").as("mad")): _*)
    withMed.join(broadcast(madTab), groupCols)
      .withColumn("is_outlier",
        (col("_absdev") > lit(k.toLong) * col("mad")).cast("long"))
      .drop("_absdev")
  }

  /** Chi-squared contingency audit between two categorical columns, in
    * EXACT integer math: per cell, the observed count, the expected count
    * in milli-units (row·col·1000 div n — the independence hypothesis),
    * and the cell's scaled chi-squared term ((n·obs − row·col)²·10⁶ div
    * (n·row·col) — the (o−e)²/e statistic multiplied by n·10⁶ so every
    * quantity stays an integer; per-cell terms sum to the scaled
    * statistic). decimal(38,0) arithmetic keeps the squared numerator
    * exact while |n·obs − r·c| < ~3.1·10¹⁶ (squared ×10⁶ must fit 38
    * digits) — 3,000× past int64's reach, covering marginal products
    * through ~10¹⁵; beyond that envelope Spark's non-ANSI decimal
    * overflow yields NULL terms rather than wrong ones. The
    * distribution-shift tripwire for "did this source's language mix
    * change".
    *
    * Scale shape: ONE hash aggregation over the fact (cells), two tiny
    * marginal re-aggregations of the cell table, broadcast back — the
    * fact is scanned once. Output: (colA, colB, n_obs, expected_milli,
    * chi2_term_ppm) per non-empty cell. */
  def chi2Contingency(df: DataFrame, colA: String, colB: String): DataFrame = {
    val cells = df.groupBy(col(colA), col(colB))
      .agg(count(lit(1)).as("n_obs"))
    val rowTot = cells.groupBy(col(colA))
      .agg(sum(col("n_obs")).as("_r"))
    val colTot = cells.groupBy(col(colB))
      .agg(sum(col("n_obs")).as("_c"))
    val grand = cells.agg(sum(col("n_obs")).as("_n"))
    cells
      .join(broadcast(rowTot), Seq(colA))
      .join(broadcast(colTot), Seq(colB))
      .crossJoin(broadcast(grand))
      .select(col(colA), col(colB), col("n_obs"),
        // decimal(38,0): r·c·1000 overflows int64 once both marginals
        // pass ~3e9 rows — the 100 TB regime, not a theoretical one
        expr("""cast((cast(_r as decimal(38,0)) * _c * 1000) div _n
              |as bigint)""".stripMargin).as("expected_milli"),
        expr("""cast((cast(_n as decimal(38,0)) * n_obs - _r * _c) *
              |  (cast(_n as decimal(38,0)) * n_obs - _r * _c) * 1000000
              |div (cast(_n as decimal(38,0)) * _r * _c) as bigint)"""
          .stripMargin).as("chi2_term_ppm"))
  }

  /** Join-key skew diagnostics: the per-key count distribution reduced to
    * the numbers that predict shuffle behavior — key cardinality, max and
    * median per-key counts, the hottest key's share of all rows in ppm,
    * and the max/median ratio in ppm (the skew factor AQE's skew-join
    * split keys off of). Median is nearest-rank on the (count, key) total
    * order — exact, no sketch.
    *
    * Scale shape: one hash aggregation fact→(key, cnt), then rank
    * selection over the KEY table (|keys| ≪ |fact|) — a single window
    * sort of the key table, never the fact. Output: one row (n_keys,
    * n_rows, max_cnt, median_cnt, top_share_ppm, skew_ppm). */
  def keySkew(df: DataFrame, keyCol: String): DataFrame = {
    // the per-key count table is consumed twice (stats + the median's
    // range-sort) and the median path crosses an RDD boundary
    // (globalRowNumbers' zipWithIndex) that can never exchange-reuse the
    // SQL-side aggregation — materialize it ONCE so the fact is scanned
    // once, and both consumers read the keys-sized table
    val counts = df.groupBy(col(keyCol).as("_k"))
      .agg(count(lit(1)).as("_cnt"))
      .pin()
    val stats = counts
      .agg(count(lit(1)).as("n_keys"), sum(col("_cnt")).as("n_rows"),
        max(col("_cnt")).as("max_cnt"))
    // nearest-rank median over the KEY table via the distributed
    // range-sort sequence (no single-partition window, no warning noise)
    val median = Ranking.globalRowNumbers(counts, Seq("_cnt", "_k"))
      .crossJoin(broadcast(stats.select(col("n_keys"))))
      .where(col("seq") + 1 === expr("(n_keys + 1) div 2"))
      .select(col("_cnt").as("median_cnt"))
    stats
      .crossJoin(broadcast(median))
      .select(col("n_keys"), col("n_rows"), col("max_cnt"),
        col("median_cnt"),
        // decimal guards: cnt·10⁶ passes int64 above ~9e12-row keys
        expr("cast(cast(max_cnt as decimal(38,0)) * 1000000 div n_rows " +
          "as bigint)").as("top_share_ppm"),
        expr("cast(cast(max_cnt as decimal(38,0)) * 1000000 " +
          "div median_cnt as bigint)").as("skew_ppm"))
  }

  /** k-anonymity audit over quasi-identifier columns — the privacy gate a
    * curation pipeline runs before releasing a dataset: every row must be
    * indistinguishable from at least k-1 others on the quasi-identifiers
    * (Sweeney, k-anonymity; the standard re-identification risk measure).
    *
    * Output is the equivalence-class SIZE HISTOGRAM — one row per
    * distinct class size with how many classes and rows sit at that size
    * and whether it violates k — rather than the class list itself: the
    * histogram is what the release decision reads, it's tiny (≤ distinct
    * sizes), and it never echoes the quasi-identifier values of the
    * small, most-identifying classes into the report.
    *
    * Scale shape: fact → hash-agg to equivalence classes (|classes| ≪
    * |rows|), then a second hash-agg over the CLASS table — two map-side-
    * combining aggregations, no window, no join; the fact is scanned
    * once. */
  /** Functional-dependency strength audit: does `lhsCols → rhsCol` hold,
    * and how badly is it violated? Reports the exact g3 measure — the
    * minimum fraction of rows to delete for the FD to hold exactly
    * (Kivinen–Mannila; the error measure TANE-style FD discovery ranks
    * by): g3 = (N − Σ_g max-RHS-frequency-in-g) / N, in ppm.
    *
    * Output is ONE summary row (group counts, violating-group count,
    * g3_ppm) — never the violating values themselves, so the report is
    * bounded at any corpus size. Two shrinking map-side-combining hash
    * aggs ((lhs, rhs) cells → per-lhs max/sum → one row); the fact is
    * scanned once, no window, no join. */
  def fdStrength(df: DataFrame, lhsCols: Seq[String],
                 rhsCol: String): DataFrame = {
    require(lhsCols.nonEmpty, "need at least one determinant column")
    df.groupBy((lhsCols :+ rhsCol).map(col): _*)
      .agg(count(lit(1)).as("c"))
      .groupBy(lhsCols.map(col): _*)
      .agg(sum(col("c")).as("ng"), max(col("c")).as("keep"),
        count(lit(1)).as("nrhs"))
      .groupBy()
      .agg(count(lit(1)).as("n_groups"),
        sum(when(col("nrhs") > 1, 1L).otherwise(0L)).as("n_violating_groups"),
        sum(col("ng")).as("n_rows"),
        sum(col("ng") - col("keep")).as("n_rows_to_delete"))
      .withColumn("g3_ppm", expr(
        """cast((cast(n_rows_to_delete as decimal(38,0)) * 1000000)
          | div nullif(n_rows, 0) as bigint)""".stripMargin))
  }

  /** Gap ranges in an integer id sequence — "which ids are missing"
    * (dropped batches, lost messages, broken sequence generators). Emits
    * one row per maximal missing run: (gap_start, gap_end, gap_len).
    *
    * Scale shape: the classic windowed lead() needs a GLOBAL order — a
    * single-partition window at corpus scale. Instead: distributed
    * range-sort sequence numbers ([[Ranking.globalRowNumbers]]), then
    * successor pairing as a plain EQUI-JOIN on seq = seq+1 — every step
    * hash/range-partitions; no window anywhere. */
  def idGaps(df: DataFrame, idCol: String): DataFrame = {
    val ids = df.select(col(idCol).cast("long").as("id")).distinct()
    val seqd = Ranking.globalRowNumbers(ids, Seq("id"))
    val nxt = seqd.select((col("seq") - 1L).as("seq"),
      col("id").as("next_id"))
    seqd.join(nxt, "seq")
      .where(col("next_id") > col("id") + 1L)
      .select((col("id") + 1L).as("gap_start"),
        (col("next_id") - 1L).as("gap_end"),
        (col("next_id") - col("id") - 1L).as("gap_len"))
  }

  def kAnonymity(df: DataFrame, quasiIdCols: Seq[String], k: Long): DataFrame = {
    require(quasiIdCols.nonEmpty, "need at least one quasi-identifier")
    require(k >= 1, "k must be >= 1")
    df.groupBy(quasiIdCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"))
      .groupBy(col("class_size"))
      .agg(count(lit(1)).as("n_classes"),
        sum(col("class_size")).as("n_rows"))
      .withColumn("violates_k", (col("class_size") < k).cast("long"))
  }

  /** Embedding-table quality report per label — the multimodal-side
    * sibling of the text quality reports (a broken encoder ships
    * null/zero/truncated vectors; norm drift flags a re-embed): vector
    * count, null-vector / wrong-dimension / zero-vector counts, and the
    * min / max / exact lower-MEDIAN of the milli-quantized squared norm.
    * All integer — n2 = |q(v)|² is exact and the median is rank-selected
    * (lower median under the (n2, id) total order), so the whole report
    * is hash-oracled.
    *
    * Scale shape: one scan + one label-keyed shuffle; the rank window
    * partitions per label, so a single giant label carries the
    * `a_exact_median` caveat (exact/oracle-checkable form here; the
    * at-scale swap is per-label `approx_percentile`). */
  def embeddingReport(emb: DataFrame, idCol: String, vecCol: String,
                      labelCol: String, dims: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.GraftFunctions.dotLong
    // Element-level nulls are counted explicitly (n_null_elem) and
    // excluded from the norm path: quantizeMilli's dot product assumes
    // no-null elements, so feeding it a vector with a NULL element would
    // produce an unspecified n2 instead of flagging the dirty row — the
    // one thing a DQ report must never do.
    val base = emb.select(col(idCol).as("_id"), col(labelCol).as("label"),
        col(vecCol).as("_v"))
      .withColumn("_null_elem", col("_v").isNotNull &&
        exists(col("_v"), x => x.isNull))
      .withColumn("_iq", when(col("_v").isNotNull && !col("_null_elem"),
        Similarity.quantizeMilli(col("_v"))))
      .withColumn("_n2", when(col("_iq").isNotNull,
        dotLong(col("_iq"), col("_iq"))))
      .withColumn("_dim", when(col("_v").isNotNull,
        size(col("_v")).cast("long")))
    // lower-median rank r satisfies 2r == n or 2r == n + 1 — exactly one
    // row per label either way
    val ranked = base.where(col("_n2").isNotNull)
      .withColumn("_rn", row_number().over(Window.partitionBy("label")
        .orderBy(col("_n2").asc, col("_id").asc)))
      .withColumn("_n", count(lit(1)).over(Window.partitionBy("label")))
    val medians = ranked
      .where(col("_rn") * 2 === col("_n") ||
        col("_rn") * 2 === col("_n") + 1)
      .select(col("label"), col("_n2").as("median_n2"))
    base.groupBy("label").agg(
        count(lit(1)).as("n_vectors"),
        sum(when(col("_v").isNull, 1L).otherwise(0L)).as("n_null_vec"),
        sum(when(col("_null_elem"), 1L).otherwise(0L)).as("n_null_elem"),
        sum(when(col("_dim").isNotNull && col("_dim") =!= dims, 1L)
          .otherwise(0L)).as("n_wrong_dim"),
        sum(when(col("_n2") === 0, 1L).otherwise(0L)).as("n_zero_vec"),
        min(col("_n2")).as("min_n2"),
        max(col("_n2")).as("max_n2"))
      .join(medians, Seq("label"), "left_outer")
  }
}
