package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact-integer model-evaluation metrics — the eval side of a training-data
  * pipeline (scoring a quality classifier, auditing a filter threshold,
  * measuring concentration of a sampling weight). Every metric is computed
  * in integer / decimal(38,0) arithmetic and reported in ppm, so DuckDB
  * hash-verifies each one exactly; no float accumulation anywhere.
  *
  * The recurring scale shape: aggregate raw rows to per-(group, score) tie
  * CELLS first (one hash aggregate, map-side combined), then run the rank
  * window over the CELL table — its partition size is the number of
  * distinct scores per group, never the raw row count. A billion-row group
  * with a quantized score axis (any real classifier emits bounded-precision
  * scores) windows over thousands of cells.
  */
object EvalMetrics {

  /** Mann–Whitney AUC per group, ppm, exact under ties via midranks.
    *
    * For a tie cell with `c` rows of which `p` are positive, sitting after
    * `C` lower-scored rows, every row's midrank is `C + (c+1)/2`; summing
    * 2×midrank over positives keeps everything integral:
    * `AUC = (Σ⁺2·mid − n⁺(n⁺+1)) / (2·n⁺·n⁻)`.
    *
    * Laws pinned in `EvalMetricsSpec`: perfect separation = 1e6 exactly,
    * constant score = 500000 exactly, strictly-monotone score transforms
    * are invariants, and auc(label, s) + auc(label, −s) = 1e6.
    *
    * Degenerate groups (no positives or no negatives) yield NULL — there
    * is no ranking question to answer — via a nullif'd denominator.
    *
    * `labelCol` must be a 0/1 long; `scoreCol` an integral score.
    */
  def aucByGroup(df: DataFrame, groupCol: String, labelCol: String,
                 scoreCol: String): DataFrame = {
    val cum = Window.partitionBy(groupCol).orderBy(col(scoreCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.groupBy(col(groupCol), col(scoreCol))
      .agg(count(lit(1)).as("c"), sum(col(labelCol)).as("p"))
      .withColumn("cum", sum(col("c")).over(cum))
      // 2×midrank of every row in this tie cell = 2·C_< + c + 1
      .withColumn("s2_cell",
        col("p").cast("decimal(38,0)") *
          (lit(2L) * (col("cum") - col("c")) + col("c") + lit(1L))
            .cast("decimal(38,0)"))
      .groupBy(groupCol)
      .agg(sum("p").as("np"), (sum("c") - sum("p")).as("nn"),
        sum("s2_cell").as("s2"))
      .select(col(groupCol),
        col("np").cast("long").as("n_pos"),
        col("nn").cast("long").as("n_neg"),
        expr("""cast(((s2 - cast(np as decimal(38,0)) * (np + 1)) * 1000000)
               | div nullif(2 * cast(np as decimal(38,0)) * nn, 0)
               | as bigint)""".stripMargin).as("auc_ppm"))
  }

  /** Precision / recall / F1 per group at a fixed decision, ppm. One hash
    * aggregate; the four confusion cells are sums of 0/1 products, so the
    * whole matrix map-side combines. `labelCol`/`predCol` are 0/1 longs.
    * Counts pass through decimal(38,0) before the ×1e6 so trillion-row
    * cells cannot wrap int64. Empty denominators (no predicted positives /
    * no actual positives) yield NULL, not a fake 0. */
  def confusionByGroup(df: DataFrame, groupCol: String, labelCol: String,
                       predCol: String): DataFrame =
    df.groupBy(col(groupCol))
      .agg(
        sum(col(labelCol) * col(predCol)).as("tp"),
        sum((lit(1L) - col(labelCol)) * col(predCol)).as("fp"),
        sum(col(labelCol) * (lit(1L) - col(predCol))).as("fn"),
        sum((lit(1L) - col(labelCol)) * (lit(1L) - col(predCol))).as("tn"))
      .select(col(groupCol), col("tp"), col("fp"), col("fn"), col("tn"),
        expr("cast((cast(tp as decimal(38,0)) * 1000000) " +
          "div nullif(tp + fp, 0) as bigint)").as("precision_ppm"),
        expr("cast((cast(tp as decimal(38,0)) * 1000000) " +
          "div nullif(tp + fn, 0) as bigint)").as("recall_ppm"),
        expr("cast((cast(tp as decimal(38,0)) * 2000000) " +
          "div nullif(2 * tp + fp + fn, 0) as bigint)").as("f1_ppm"))

  /** Equal-width calibration bins over `[lo, hi)`: per bin the observed
    * positive rate vs the bin's mean normalized score (the "predicted
    * probability" proxy), both ppm. Out-of-range scores clamp into the
    * edge bins so every row is accounted for (Σn = total, pinned). One
    * hash aggregate over ≤ `nBins` groups. */
  def calibrationBins(df: DataFrame, labelCol: String, scoreCol: String,
                      lo: Long, hi: Long, nBins: Int): DataFrame = {
    require(nBins > 0 && hi > lo, "need a nonempty range and ≥1 bin")
    // integral bin index — `div` truncates toward zero where floor would
    // round down, but the only disagreement zone is score < lo, which the
    // greatest(0, _) clamp sends to bin 0 either way
    val bin = least(lit(nBins - 1L), greatest(lit(0L),
      expr(s"(($scoreCol - $lo) * $nBins) div ${hi - lo}")))
    df.select(bin.as("bin"), col(labelCol).as("y"), col(scoreCol).as("s"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), sum(col("y")).as("n_pos"),
        sum(col("s")).as("ss"))
      .select(col("bin"), col("n"), col("n_pos"),
        expr("cast((cast(n_pos as decimal(38,0)) * 1000000) div n as bigint)")
          .as("pos_ppm"),
        // mean normalized score of the bin: (Σs − n·lo)·1e6 / (n·(hi−lo))
        expr(s"""cast(((cast(ss as decimal(38,0)) - cast(n as decimal(38,0))
               |   * $lo) * 1000000)
               | div (cast(n as decimal(38,0)) * ${hi - lo}) as bigint)"""
          .stripMargin).as("pred_ppm"))
  }

  /** Cohen's kappa between two 0/1 raters, ppm. One aggregate for the four
    * agreement cells; chance agreement `pe·n² = (a+b)(a+c) + (c+d)(b+d)`
    * in decimal(38,0) (n² wraps int64 past ~3e9 rows). Kappa can be
    * NEGATIVE (worse than chance), and Spark's `div` truncates toward zero
    * while DuckDB's `//` floors — so the division is spelled
    * `(x − x % y) / y`, which both engines evaluate identically (`%`
    * follows the dividend's sign in both). Constant raters (pe = 1) yield
    * NULL. */
  def cohensKappa(df: DataFrame, r1Col: String, r2Col: String): DataFrame =
    df.groupBy()
      .agg(count(lit(1)).as("n"),
        sum(col(r1Col) * col(r2Col)).as("a"),
        sum(col(r1Col) * (lit(1L) - col(r2Col))).as("b"),
        sum((lit(1L) - col(r1Col)) * col(r2Col)).as("cc"),
        sum((lit(1L) - col(r1Col)) * (lit(1L) - col(r2Col))).as("d"))
      .select(col("n"), (col("a") + col("d")).as("n_agree"),
        expr("""cast((cast(a + d as decimal(38,0)) * 1000000) div n
               | as bigint)""".stripMargin).as("po_ppm"),
        expr("""cast(((cast(a as decimal(38,0)) + b) * (a + cc)
               |  + (cast(cc as decimal(38,0)) + d) * (b + d)) * 1000000
               | div (cast(n as decimal(38,0)) * n) as bigint)"""
          .stripMargin).as("pe_ppm"),
        expr(kappaExpr).as("kappa_ppm"))

  // truncating-toward-zero division of the kappa rational, spelled so
  // Spark and DuckDB agree on negatives: x − x%y is exactly divisible by
  // y, so flooring (DuckDB //) and truncating (Spark div) integral
  // division coincide on it — and both stay in exact integer arithmetic
  // (DuckDB's plain / on integers returns DOUBLE and would round past 2⁵³)
  private val kappaExpr: String = {
    val pe2 = "((cast(a as decimal(38,0)) + b) * (a + cc) " +
      "+ (cast(cc as decimal(38,0)) + d) * (b + d))"
    val num = s"((cast(n as decimal(38,0)) * (a + d) - $pe2) * 1000000)"
    val den = s"nullif(cast(n as decimal(38,0)) * n - $pe2, 0)"
    s"cast(($num - $num % $den) div $den as bigint)"
  }

  /** Gini concentration coefficient of `valueCol` mass across `keyCol`
    * holders, ppm — "how unevenly is revenue / token count / sampling
    * weight spread". Exact integer form over ascending 1-based ranks:
    * `G = (2·Σ i·xᵢ − (n+1)·Σx) / (n·Σx)`.
    *
    * The global ascending rank comes from [[Ranking.globalRowNumbers]]
    * (range-sort + zipWithIndex offsets) — never a single-partition
    * window; `Σ i·xᵢ` then reduces in decimal(38,0). Holder count, not
    * row count, bounds the sort. */
  def giniConcentration(df: DataFrame, keyCol: String,
                        valueCol: String): DataFrame = {
    val per = df.groupBy(col(keyCol))
      .agg(sum(col(valueCol)).as("x"))
    Ranking.globalRowNumbers(per, Seq("x", keyCol), "seq")
      .groupBy()
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum((col("seq") + 1L).cast("decimal(38,0)") *
          col("x").cast("decimal(38,0)")).as("six"))
      .select(col("n"), col("sx").cast("long").as("total"),
        expr("""cast(((2 * six - (cast(n as decimal(38,0)) + 1) * sx)
               |  * 1000000)
               | div nullif(cast(n as decimal(38,0)) * sx, 0) as bigint)"""
          .stripMargin).as("gini_ppm"))
  }

  /** Precision/recall curve: one row per distinct score threshold,
    * descending — precision and recall of the rule `score ≥ t`, ppm,
    * exact. Aggregates to tie cells first; the running window is over the
    * DISTINCT-score cell table (bounded by the quantized score axis — any
    * deployable threshold sweep quantizes scores; raw rows never enter a
    * window). The cell table is small, so its single ordered pass uses the
    * same constant-but-not-foldable partition key idiom as the calendar
    * running sum (`events_cumulative_users`). */
  def prCurve(df: DataFrame, labelCol: String, scoreCol: String): DataFrame = {
    val part = pmod(col(scoreCol), lit(1))
    val w = Window.partitionBy(part).orderBy(col(scoreCol).desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val whole = Window.partitionBy(part) // same key: one Exchange for both
    df.groupBy(col(scoreCol))
      .agg(count(lit(1)).as("c"), sum(col(labelCol)).as("p"))
      .withColumn("cum_n", sum(col("c")).over(w))
      .withColumn("cum_tp", sum(col("p")).over(w))
      .withColumn("all_tp", sum(col("p")).over(whole))
      .select(col(scoreCol).as("threshold"), col("cum_tp").as("tp"),
        (col("cum_n") - col("cum_tp")).as("fp"),
        expr("cast((cast(cum_tp as decimal(38,0)) * 1000000) " +
          "div cum_n as bigint)").as("precision_ppm"),
        expr("cast((cast(cum_tp as decimal(38,0)) * 1000000) " +
          "div nullif(all_tp, 0) as bigint)").as("recall_ppm"))
  }
}
