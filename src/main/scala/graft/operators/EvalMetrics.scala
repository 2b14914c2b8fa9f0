package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Fleiss' kappa: chance-corrected agreement among a FIXED number of
    * raters per item over any number of categories — [[cohensKappa]]'s
    * many-rater generalization (annotation quality for labeling
    * campaigns). `df` is one row per (item, rating); every item must
    * carry exactly `nRaters` rows (the caller filters — the formula is
    * undefined otherwise).
    *
    * With n_ij the per-item-category counts, T = N·n total ratings,
    * S = Σ n_ij², C2 = Σ_j (Σ_i n_ij)²:
    * P̄ = (S − T) / (T(n−1)), P_e = C2 / T², and after clearing the
    * shared factor T, κ = ((S−T)·T − C2·(n−1)) / ((n−1)·(T² − C2)).
    * Everything is integral; kappa can be NEGATIVE, so the division uses
    * the `(x − x%y) div y` spelling (truncate == floor on exact
    * multiples, the [[cohensKappa]] portability trick).
    *
    * Scale shape: ratings → (item, category) cells is one map-side-
    * combining hash agg; cells → per-category marginals is a second agg
    * over the CELL table (≤ N·categories rows); the final row is a
    * global agg over the CATEGORY table (tiny). No window, no join. */
  def fleissKappa(df: DataFrame, itemCol: String, catCol: String,
                  nRaters: Int): DataFrame = {
    require(nRaters >= 2, "need at least two raters")
    df.groupBy(col(itemCol), col(catCol))
      .agg(count(lit(1)).as("nij"))
      .groupBy(col(catCol))
      .agg(sum(col("nij")).as("cj"),
        sum(col("nij") * col("nij")).as("sj"))
      .groupBy()
      .agg(sum(col("cj")).as("t"),
        sum(col("sj")).cast("decimal(38,0)").as("s"),
        sum(col("cj").cast("decimal(38,0)") * col("cj")
          .cast("decimal(38,0)")).as("c2"))
      .select(
        expr(s"cast(t div $nRaters as bigint)").as("n_items"),
        lit(nRaters.toLong).as("n_raters"),
        expr(s"""cast(((s - t) * 1000000)
                | div (cast(t as decimal(38,0)) * ${nRaters - 1})
                | as bigint)""".stripMargin).as("pbar_ppm"),
        expr("""cast((c2 * 1000000)
               | div (cast(t as decimal(38,0)) * t) as bigint)"""
          .stripMargin).as("pe_ppm"),
        expr(fleissKappaExpr(nRaters)).as("kappa_ppm"))
  }

  private def fleissKappaExpr(nRaters: Int): String = {
    val num = s"(((s - t) * cast(t as decimal(38,0)) " +
      s"- c2 * ${nRaters - 1}) * 1000000)"
    val den = s"nullif(cast(${nRaters - 1} as decimal(38,0)) " +
      "* (cast(t as decimal(38,0)) * t - c2), 0)"
    s"cast(($num - $num % $den) div $den as bigint)"
  }

  /** Poisson bootstrap confidence interval for a mean — THE distributed
    * bootstrap (Chamandy et al., "Estimating Uncertainty for Massive
    * Data Streams"; Kleiner et al.'s BLB is the heavier sibling):
    * classic resampling draws N rows WITH replacement per replicate,
    * which cannot be done independently per partition, but each row's
    * multiplicity in a replicate is ≈ Poisson(1), which CAN — each task
    * weights its own rows with no coordination, and a map-side-combined
    * per-replicate partial sum leaves a shuffle of O(partitions × reps)
    * rows, never O(rows × reps).
    *
    * Determinism/portability: the Poisson draw inverts the pinned CDF
    * thresholds below against 6-hex uniforms from md5 — the same
    * engine-portable idiom as the sampling surface, so DuckDB replays
    * the exact weights (lexicographic hex compare; thresholds are
    * ⌊CDF·16⁶⌋ in 6-digit hex). One 32-hex digest yields FIVE
    * independent 6-hex uniforms (replicate r reads slot (r−1)%5 of
    * digest ⌈r/5⌉ of md5(salt:id:block)); the whole harvest runs as one
    * fused codegen kernel per row ([[org.apache.spark.sql.graft
    * .PoissonWeights]]) over raw digest bytes. The cost curve at sf0.1:
    * naive one-hash-per-replicate 22.3 s → 5-slot harvest 8.2 s →
    * fused kernel + long-first two-phase reduction 3.0 s, identical
    * statistics at every step (the oracle hash-compares them).
    * Weights cap at 7 (P(X≥8) < 1e-5 — at most a ±1-count perturbation
    * per ~10⁵ replicate-rows, far inside the CI's own resolution).
    *
    * Output: one row — point mean, the replicate-mean order statistics
    * at ranks ⌈0.025R⌉ / ⌈0.5R⌉ / ⌈0.975R⌉ (ties broken by rep id), all
    * in the value column's integer units via truncating division. The
    * rank window runs over R rows (a constant), not data.
    *
    * PRECONDITION (exactness bound): the per-(replicate, partition)
    * partial Σ w·v accumulates as LONG, so it must stay below 2⁶³ —
    * with weights ≤ 7 that means `|value| · rows_per_partition` below
    * ~1.3·10¹⁸ (e.g. |value| ≤ 10¹⁴ at 10⁷-row partitions, 10¹¹ at
    * 10¹⁰-row partitions). Every money/metric column in integer units is
    * orders of magnitude inside this; callers summing wider values must
    * pre-scale or shrink partitions — the overflow is silent. Only the
    * O(partitions × reps) partials meet the exact decimal(38,0)
    * widening. */
  def poissonBootstrapCI(df: DataFrame, idCol: String, valueCol: String,
                         reps: Int = 100,
                         salt: String = "boot"): DataFrame = {
    require(reps >= 4, "need enough replicates to take percentiles")
    // all `reps` weights of a row come out of ONE fused codegen'd pass
    // over the raw md5 digest bytes ([[org.apache.spark.sql.graft
    // .PoissonWeights]] — bit-identical to the hex-substring form the
    // oracle replays); the only explode is the final skinny (rep, w)
    // posexplode. The earlier two-Generate form (blocks × slots, digest
    // hex strings riding every row) measured ~2× slower.
    val wcol = org.apache.spark.sql.GraftBridge.column(
      org.apache.spark.sql.graft.PoissonWeights(
        org.apache.spark.sql.GraftBridge.expression(
          concat(lit(salt), lit(":"), col(idCol).cast("string"),
            lit(":"))), reps))
    // two-phase reduction: the inner aggregate keys on (rep, partition)
    // so its LONG sums are exact by construction (|Σ w·v| per partition
    // ≤ 7·rows_per_partition·|v| — at 10⁷-row partitions that allows
    // |v| up to ~10¹⁴, far past any money/metric column), and only the
    // O(partitions × reps) partials meet the decimal(38,0) widening.
    // Folding decimal arithmetic into the 15M-row phase instead
    // measured ~25% of the query.
    // posexplode_OUTER: the inner form makes the optimizer infer a
    // `size(_ws) > 0 AND isnotnull(_ws)` filter under the Generate that
    // RE-EVALUATES the whole md5 kernel once more per row (no cross-
    // operator subexpression elimination). The weights array is always
    // non-null and `reps` long for a non-null id, so with the explicit
    // id guard the outer form emits identical rows — at half the hashes.
    val perRep = df
      .where(col(idCol).isNotNull)
      .select(col(valueCol).cast("long").as("_v"), wcol.as("_ws"))
      .select(col("_v"), posexplode_outer(col("_ws")).as(Seq("_rep0", "_w")))
      .withColumn("_rep", col("_rep0") + 1)
      .groupBy(col("_rep"), spark_partition_id().as("_part"))
      .agg(sum(col("_w").cast("long")).as("psw"),
        sum(col("_w").cast("long") * col("_v")).as("psv"))
      .groupBy("_rep")
      .agg(sum(col("psw")).as("sw"),
        sum(col("psv").cast("decimal(38,0)")).as("sv"))
      .select(col("_rep"),
        expr("cast(sv div nullif(sw, 0) as bigint)").as("m"))
    // constant-but-not-foldable partition key (the prCurve idiom): the
    // window is over R = `reps` rows, a constant, never data-scaled
    val ranked = perRep.withColumn("rn",
      row_number().over(Window.partitionBy(pmod(col("_rep"), lit(1)))
        .orderBy(col("m").asc, col("_rep").asc)))
    val point = df.groupBy()
      .agg(count(lit(1)).as("n"),
        sum(col(valueCol).cast("decimal(38,0)")).as("sv"))
      .select(col("n"),
        expr("cast(sv div nullif(n, 0) as bigint)").as("mean"))
    def rankOf(q: Double) = math.ceil(q * reps).toLong
    point.crossJoin(
      ranked.groupBy()
        .agg(count(lit(1)).as("n_reps"),
          max(when(col("rn") === rankOf(0.025), col("m"))).as("lo"),
          max(when(col("rn") === rankOf(0.5), col("m"))).as("med"),
          max(when(col("rn") === rankOf(0.975), col("m"))).as("hi")))
  }

  /** ⌊CDF_{Poisson(1)}(k)·16⁶⌋ for k = 0..6 in 6-digit hex — pinned
    * literals shared verbatim with the DuckDB twin. */
  val poissonCdfHex6: Seq[String] =
    Seq("5e2d58", "bc5ab1", "eb715e", "fb2397", "ff1025", "ffd90f",
      "fffa8b")

  /** nDCG@k per group — graded ranking quality of a retrieval/ordering
    * against integer relevance labels. The irrational log₂ discounts are
    * PINNED as ⌊10⁶/log₂(k+1)⌋ ppm literals (shared verbatim with the
    * SQL twin), so DCG, ideal DCG and their ratio are exact integer
    * arithmetic end to end — the same quantize-the-constants move as the
    * Poisson CDF above.
    *
    * `orderCols` is the system ranking under evaluation (must totalize
    * the order — include a tie-break); the ideal ranking sorts relevance
    * descending (its tie-break cannot change the ideal DCG, but is fixed
    * for determinism anyway). Groups with zero total relevance in the
    * ideal top-k yield NULL (no ranking question).
    *
    * Scale shape: both rankings are windows over the SAME partition key
    * — one Exchange; per-group output is one row. Top-k trimming happens
    * before the discount join (an array-literal lookup, codegen'd). */
  def ndcgAtK(df: DataFrame, groupCol: String, relCol: String,
              orderCols: Seq[Column], k: Int = 10): DataFrame = {
    require(k >= 1 && k <= ndcgDiscountPpm.length,
      s"1 <= k <= ${ndcgDiscountPpm.length} (extend the pinned table)")
    val discounts = array(ndcgDiscountPpm.map(lit): _*)
    val sys = Window.partitionBy(col(groupCol)).orderBy(orderCols: _*)
    val ideal = Window.partitionBy(col(groupCol))
      .orderBy(col(relCol).desc +: orderCols: _*)
    df.withColumn("_rn_sys", row_number().over(sys))
      .withColumn("_rn_ideal", row_number().over(ideal))
      .withColumn("_dcg_term",
        when(col("_rn_sys") <= k, col(relCol).cast("long") *
          element_at(discounts, col("_rn_sys"))).otherwise(0L))
      .withColumn("_idcg_term",
        when(col("_rn_ideal") <= k, col(relCol).cast("long") *
          element_at(discounts, col("_rn_ideal"))).otherwise(0L))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("_dcg_term")).as("dcg_ppm"),
        sum(col("_idcg_term")).as("idcg_ppm"))
      .withColumn("ndcg_ppm", expr(
        """cast((cast(dcg_ppm as decimal(38,0)) * 1000000)
          | div nullif(idcg_ppm, 0) as bigint)""".stripMargin))
  }

  /** ⌊10⁶ / log₂(k+1)⌋ for k = 1..10 — pinned ppm discount literals
    * shared verbatim with the DuckDB twin. */
  val ndcgDiscountPpm: Seq[Long] =
    Seq(1000000L, 630929L, 500000L, 430676L, 386852L, 356207L, 333333L,
      315464L, 301029L, 289064L)

  /** Two-sample Kolmogorov–Smirnov statistic between the `labelCol`=1 and
    * =0 score distributions — "how separable are the two classes at the
    * single best threshold" (the KS chart next to AUC in every scorecard
    * review). Exact under ties: KS = maxₛ |F₁(s) − F₂(s)| evaluated on
    * the DISTINCT-score tie cells; clearing denominators keeps it
    * integral — d(s) = |cum₁(s)·n₀ − cum₀(s)·n₁|, KS_ppm =
    * 10⁶·max d / (n₁·n₀). Also reports the argmax threshold (lowest
    * score on ties — the packed-max trick again).
    *
    * Scale shape: the [[aucByGroup]] cells-first discipline — one hash
    * agg to (group, score) cells, a running window over the CELL table
    * (bounded by the quantized score axis), one final row per group.
    * Degenerate groups (one class absent) yield NULL. */
  def ksStatistic(df: DataFrame, groupCol: String, labelCol: String,
                  scoreCol: String): DataFrame = {
    val run = Window.partitionBy(col(groupCol)).orderBy(col(scoreCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val whole = Window.partitionBy(col(groupCol))
    df.groupBy(col(groupCol), col(scoreCol))
      .agg(count(lit(1)).as("c"), sum(col(labelCol)).as("p"))
      .withColumn("cum1", sum(col("p")).over(run))
      .withColumn("cum0", sum(col("c") - col("p")).over(run))
      .withColumn("n1", sum(col("p")).over(whole))
      .withColumn("n0", sum(col("c") - col("p")).over(whole))
      .withColumn("d", abs(col("cum1").cast("decimal(38,0)") * col("n0") -
        col("cum0").cast("decimal(38,0)") * col("n1")))
      // pack (d major, lowest-score-on-ties minor); scores are quantized
      // non-negative longs in practice — require so the pack is total
      .withColumn("_pack", col("d") * lit(10000000L) +
        (lit(9999999L) - col(scoreCol).cast("decimal(38,0)")))
      .groupBy(col(groupCol))
      .agg(max(col("n1")).as("n_pos"), max(col("n0")).as("n_neg"),
        max(col("_pack")).as("_mp"))
      .select(col(groupCol), col("n_pos"), col("n_neg"),
        expr("cast(9999999 - _mp % 10000000 as bigint)").as("ks_at_score"),
        expr("""cast((_mp div 10000000) * 1000000
               | div nullif(cast(n_pos as decimal(38,0)) * n_neg, 0)
               | as bigint)""".stripMargin).as("ks_ppm"))
  }
}
