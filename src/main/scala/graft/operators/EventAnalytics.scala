package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Batch event-sequence analytics over the events table: conversion
  * funnels and cohort retention — the two classic product-analytics
  * operators. Both are ONE-SHUFFLE shapes: group the events by user once
  * and finish row-locally, instead of the textbook per-stage self-joins
  * (3 shuffled joins for a 3-stage funnel). */
object EventAnalytics {

  /** Per-user 3-stage conversion funnel: the user's earliest `s1` event,
    * the first `s2` strictly after it, and the first `s3` strictly after
    * that (classic view -> click -> purchase). Stages not reached are
    * NULL. Semantically identical to the per-stage `min(ts > prev)`
    * self-join chain, but computed as ONE groupBy(user) + an in-row fold
    * over the time-sorted event array — one shuffle total, no fact
    * re-scans; per-user state is bounded by that user's event count. */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
             typeCol: String, s1: String, s2: String, s3: String): DataFrame = {
    val packed = events
      .select(col(userCol), col(tsCol).as("_ts"), col(typeCol).as("_ty"))
      .where(col("_ty").isin(s1, s2, s3))
      .groupBy(userCol)
      .agg(array_sort(collect_list(struct(col("_ts"), col("_ty")))).as("_evs"))
    val zero = struct(
      lit(null).cast("timestamp").as("t1"),
      lit(null).cast("timestamp").as("t2"),
      lit(null).cast("timestamp").as("t3"))
    val folded = aggregate(col("_evs"), zero, (acc, e) => {
      val ts = e.getField("_ts")
      val ty = e.getField("_ty")
      val t1 = acc.getField("t1")
      val t2 = acc.getField("t2")
      val t3 = acc.getField("t3")
      struct(
        when(t1.isNull && ty === s1, ts).otherwise(t1).as("t1"),
        when(t2.isNull && ty === s2 && t1.isNotNull && ts > t1, ts)
          .otherwise(t2).as("t2"),
        when(t3.isNull && ty === s3 && t2.isNotNull && ts > t2, ts)
          .otherwise(t3).as("t3"))
    })
    packed.select(col(userCol), folded.as("_f"))
      .select(col(userCol),
        col("_f.t1").as(s"first_$s1"),
        col("_f.t2").as(s"first_${s2}_after"),
        col("_f.t3").as(s"first_${s3}_after"))
  }

  /** Event-type transition counts — the edge weights of the user-journey
    * Markov chain: for each user's time-ordered event stream, count each
    * (previous type -> next type) step across the corpus. One lag window
    * per user partition + one aggregation; `idCol` breaks timestamp ties
    * so the ordering (and therefore the counts) is deterministic. */
  def transitions(events: DataFrame, userCol: String, tsCol: String,
                  idCol: String, typeCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(userCol).orderBy(col(tsCol), col(idCol))
    events
      .select(col(userCol), col(tsCol), col(idCol), col(typeCol).as("next"))
      .withColumn("prev", lag(col("next"), 1).over(w))
      .where(col("prev").isNotNull)
      .groupBy("prev", "next")
      .agg(count(lit(1)).cast("long").as("n"))
  }

  /** Cohort retention: users are cohorted by their first active DATE; for
    * each (cohort, day offset) the count of cohort users active that day.
    * One groupBy(user) collects the distinct active-day set (bounded by
    * the calendar, not the event count), then a small explode +
    * re-aggregate — no join of the fact against a first-seen dimension. */
  def retention(events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val d = to_date(col(tsCol))
    events
      .select(col(userCol), d.as("_d"))
      .groupBy(userCol)
      .agg(min(col("_d")).as("cohort"), collect_set(col("_d")).as("_days"))
      .select(col("cohort"), explode(col("_days")).as("_day"))
      .groupBy(col("cohort"),
        datediff(col("_day"), col("cohort")).cast("long").as("day_offset"))
      .agg(count(lit(1)).cast("long").as("n_users"))
  }

  /** Gaps-and-islands: collapse each user's CONSECUTIVE same-type events
    * into runs. The classic rank-difference trick — `rn` (position in
    * the user's full stream) minus `rnt` (position among that type's
    * events) is constant exactly within a consecutive run, so one
    * aggregation on the difference recovers every island without a
    * self-join or an iterative pass. Run identity is `run_start_seq` =
    * the run's first stream position (deterministic on the (ts,
    * tiebreak) total order).
    *
    * Scale shape: two windows over the SAME user partitioning (one
    * shuffle; the second window only re-sorts within partitions) + one
    * hash aggregation. The behavioral-analytics primitive behind dwell
    * analysis, bot detection (pathological run lengths), and session
    * compression. Output: (userCol, typeCol, run_start_seq, run_len). */
  def stateRuns(events: DataFrame, userCol: String, tsCol: String,
                tiebreakCol: String, typeCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(userCol)
      .orderBy(col(tsCol).asc, col(tiebreakCol).asc)
    val wt = Window.partitionBy(userCol, typeCol)
      .orderBy(col(tsCol).asc, col(tiebreakCol).asc)
    events
      .select(col(userCol), col(tsCol), col(tiebreakCol), col(typeCol))
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("rnt", row_number().over(wt).cast("long"))
      .groupBy(col(userCol), col(typeCol),
        (col("rn") - col("rnt")).as("_grp"))
      .agg(min(col("rn")).as("run_start_seq"),
        count(lit(1)).as("run_len"))
      .drop("_grp")
      .select(col(userCol), col(typeCol), col("run_start_seq"),
        col("run_len"))
  }

  /** Interval-union coverage: per group, merge overlapping [start, end]
    * integer intervals into maximal islands and report the total covered
    * length and island count. The running-max formulation — an interval
    * starts a new island iff its start exceeds every previous interval's
    * end (max over the preceding frame); islands are then numbered by a
    * running sum of the start flags and reduced with min/max. Covers
    * "machine busy time", "user active time", "contract coverage days".
    *
    * Scale shape: two windows over the SAME group partitioning (one
    * shuffle) + one aggregation per island + one per group — no
    * self-join, no recursion; per-group cost is the sort. Intervals must
    * be totally ordered within a group: `tiebreakCols` extend (start,
    * end) to a total order so the running max is deterministic.
    *
    * Output: (groupCols*, n_intervals, n_islands, covered) where
    * `covered` = Σ_islands (max end − min start) in the intervals' own
    * integer unit (end-exclusive length; adjacent-but-not-overlapping
    * intervals with end == next start merge, matching the ≤ test). */
  def intervalCoverage(df: DataFrame, groupCols: Seq[String],
                       startCol: String, endCol: String,
                       tiebreakCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val gcols = groupCols.map(col)
    val order = (Seq("_s", "_e") ++ tiebreakCols).map(col(_).asc)
    val w = Window.partitionBy(gcols: _*).orderBy(order: _*)
    val prevMax = max(col("_e")).over(
      w.rowsBetween(Window.unboundedPreceding, -1))
    df
      .select(gcols ++ tiebreakCols.map(col) :+
        col(startCol).cast("long").as("_s") :+
        col(endCol).cast("long").as("_e"): _*)
      .withColumn("_new", when(col("_s") > coalesce(prevMax,
        lit(Long.MinValue)), 1L).otherwise(0L))
      .withColumn("_isl", sum(col("_new")).over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(gcols :+ col("_isl"): _*)
      .agg(count(lit(1)).as("_n"), min(col("_s")).as("_lo"),
        max(col("_e")).as("_hi"))
      .groupBy(gcols: _*)
      .agg(sum(col("_n")).as("n_intervals"),
        count(lit(1)).as("n_islands"),
        sum(col("_hi") - col("_lo")).as("covered"))
  }

  /** Calendar gap-fill with forward fill: each observed (group, day,
    * value) row is expanded to cover every day up to (exclusive) the
    * group's NEXT observation, carrying its value — the missing calendar
    * days materialize with the last observed value and `observed` = 0.
    * Time-series regularization for daily activity feeds where absent
    * days mean "unchanged", done without a calendar-dimension join.
    *
    * Scale shape: one lead window (single shuffle on the group key) plus
    * a row-local `sequence` explode — fan-out per row is the gap length,
    * bounded by the group's calendar span, never corpus-sized. Nothing
    * fills after a group's last observation (there is no next-day bound
    * to fill toward). Requires (group, day) unique — pre-aggregate first.
    * Output: (groupCols*, day, valCol, observed). */
  def forwardFillCalendar(df: DataFrame, groupCols: Seq[String],
                          dayCol: String, valCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val gcols = groupCols.map(col)
    val w = Window.partitionBy(gcols: _*).orderBy(col("_d").asc)
    df
      .select(gcols :+ col(dayCol).cast("long").as("_d") :+
        col(valCol).as("_v"): _*)
      .withColumn("_next", lead(col("_d"), 1).over(w))
      .select(gcols :+ col("_d") :+ col("_v") :+
        explode(sequence(col("_d"),
          coalesce(col("_next") - 1, col("_d")))).as("day"): _*)
      .select(gcols :+ col("day") :+ col("_v").as(valCol) :+
        (col("day") === col("_d")).cast("long").as("observed"): _*)
  }

  /** First-order Markov transition matrix over per-sequence event
    * streams: for each (state → next_state) adjacent pair, the transition
    * count and its exact-integer probability in ppm of the state's total
    * outgoing transitions. The what-happens-next model behind
    * next-action prediction and anomalous-flow detection.
    *
    * Scale shape: one lead window (single shuffle on the sequence key),
    * one hash aggregation to the |states|² transition table, and a
    * broadcast of the per-state totals (the state domain is small by
    * construction). `orderCols` must totally order each sequence. Output:
    * (state, next_state, n_trans, n_from, prob_ppm). */
  def markovTransitions(df: DataFrame, seqCol: String,
                        orderCols: Seq[String], typeCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(seqCol))
      .orderBy(orderCols.map(col(_).asc): _*)
    val trans = df
      .withColumn("_next", lead(col(typeCol), 1).over(w))
      .where(col("_next").isNotNull)
      .groupBy(col(typeCol).as("state"), col("_next").as("next_state"))
      .agg(count(lit(1)).as("n_trans"))
    val fromTot = trans.groupBy("state").agg(sum("n_trans").as("n_from"))
    trans
      .join(broadcast(fromTot), "state")
      .select(col("state"), col("next_state"), col("n_trans"),
        col("n_from"),
        expr("cast(cast(n_trans as decimal(38,0)) * 1000000 div n_from " +
          "as bigint)").as("prob_ppm"))
  }

  /** Directed association rules over per-basket item sets (market-basket
    * analysis): for every ordered item pair (a → b) co-occurring in at
    * least `minSupport` baskets, the support count, confidence and lift
    * in exact integer ppm. Confidence = |a∧b| / |a|; lift = |a∧b|·N /
    * (|a|·|b|) — both emitted as truncating integer divisions of
    * ppm-scaled decimals, so the result is combine-order-free and
    * engine-portable.
    *
    * Scale shape: basket build is ONE distinct (shuffle on the basket
    * key); the pair join is per-basket (bounded by the item domain, not
    * the corpus); item and total counts are tiny aggregates joined onto
    * the pair counts (broadcast at any scale). Never an all-pairs join
    * across baskets.
    *
    * Output: (antecedent, consequent, n_pair, n_ante, n_cons,
    * confidence_ppm, lift_ppm). */
  def assocRules(df: DataFrame, basketCols: Seq[String], itemCol: String,
                 minSupport: Long = 1L): DataFrame = {
    val bcols = basketCols.map(col)
    val items = df.select(bcols :+ col(itemCol).as("_item"): _*).distinct()
    // single-row basket total, broadcast onto the pair counts (lazy — no
    // plan-build-time action)
    val totals = items.select(bcols: _*).distinct()
      .agg(count(lit(1)).as("n_baskets"))
    val itemCounts = items.groupBy(col("_item"))
      .agg(count(lit(1)).as("_cnt"))
    val pairs = items.as("x")
      .join(items.as("y"), basketCols)
      .where(col("x._item") =!= col("y._item"))
      .groupBy(col("x._item").as("antecedent"),
        col("y._item").as("consequent"))
      .agg(count(lit(1)).as("n_pair"))
      .where(col("n_pair") >= minSupport)
    pairs
      .join(itemCounts.select(col("_item").as("antecedent"),
        col("_cnt").as("n_ante")), "antecedent")
      .join(itemCounts.select(col("_item").as("consequent"),
        col("_cnt").as("n_cons")), "consequent")
      .crossJoin(broadcast(totals))
      .select(col("antecedent"), col("consequent"), col("n_pair"),
        col("n_ante"), col("n_cons"),
        // decimal guards: pair·basket products overflow int64 in the
        // billions-of-baskets regime
        expr("cast(cast(n_pair as decimal(38,0)) * 1000000 div n_ante " +
          "as bigint)").as("confidence_ppm"),
        expr("""cast((cast(n_pair as decimal(38,0)) * n_baskets * 1000000)
              |div (cast(n_ante as decimal(38,0)) * n_cons)
              |as bigint)""".stripMargin).as("lift_ppm"))
  }

  /** Integer-exact exponentially-weighted moving average over each key's
    * trailing `window` rows: weights are powers of two (newest row =
    * 2^(n−1), n = rows in frame), so `ewma = (Σ v_j·2^(j−1)) div (2^n −
    * 1)` — every intermediate an exact BIGINT (bounded by the frame, no
    * overflow) and ONE truncating division at the end. Time-series
    * smoothing with zero float drift: the result is a pure function of
    * the frame, independent of partitioning and combine order, which is
    * what lets an ANSI twin replay it hash-exactly (double EWMA cannot).
    *
    * `valueCol` is pre-quantized to micro-units (`floor(v·1e6)`); NULL
    * values are excluded. One shuffle on the key; per-row state is the
    * ≤`window`-element frame array. `orderCols` must totalize the
    * per-key order. */
  def ewmaIntWindow(df: DataFrame, keyCol: String, orderCols: Seq[String],
                    valueCol: String, window: Int = 16): DataFrame = {
    require(window >= 1 && window <= 62, "1 <= window <= 62 (2^n in long)")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(orderCols.map(col(_).asc): _*)
      .rowsBetween(-(window - 1), org.apache.spark.sql.expressions
        .Window.currentRow)
    df.where(col(valueCol).isNotNull)
      .withColumn("_vm", floor(col(valueCol) * 1000000).cast("long"))
      .withColumn("_arr", collect_list(col("_vm")).over(w))
      .withColumn("n", size(col("_arr")).cast("long"))
      .withColumn("ewma_micros", expr(
        """aggregate(
          |  transform(sequence(1, size(_arr)),
          |    j -> element_at(_arr, j) *
          |         shiftleft(cast(1 as bigint), j - 1)),
          |  cast(0 as bigint), (a, x) -> a + x)
          |div (shiftleft(cast(1 as bigint), size(_arr)) - 1)"""
          .stripMargin))
      .drop("_vm", "_arr")
  }

  /** Brown's DOUBLE exponential smoothing over the [[ewmaIntWindow]]
    * machinery: s₂ = EWMA(EWMA(x)) with the same dyadic weights, so a
    * trending series — where single EWMA lags systematically — gets a
    * level + trend estimate. With the dyadic α = 1/2 weighting the
    * classic Brown trend term (s₁−s₂)·α/(1−α) is exactly s₁ − s₂, so
    * the one-step-ahead forecast is `3·s₁ − 2·s₂`, still exact integer
    * micros end to end (both smoothings use the truncating power-series
    * division, replayed verbatim by the SQL twin).
    *
    * Scale shape: two window passes over the SAME (key, order)
    * partitioning — one Exchange, the second window reuses it; per-row
    * state is the ≤`window`-element frame array, same as the single
    * smoothing. */
  def doubleEwmaIntWindow(df: DataFrame, keyCol: String,
                          orderCols: Seq[String], valueCol: String,
                          window: Int = 16): DataFrame = {
    require(window >= 1 && window <= 62, "1 <= window <= 62 (2^n in long)")
    def smooth(arr: String) =
      s"""aggregate(
         |  transform(sequence(1, size($arr)),
         |    j -> element_at($arr, j) *
         |         shiftleft(cast(1 as bigint), j - 1)),
         |  cast(0 as bigint), (a, x) -> a + x)
         |div (shiftleft(cast(1 as bigint), size($arr)) - 1)""".stripMargin
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(orderCols.map(col(_).asc): _*)
      .rowsBetween(-(window - 1), org.apache.spark.sql.expressions
        .Window.currentRow)
    df.where(col(valueCol).isNotNull)
      .withColumn("_vm", floor(col(valueCol) * 1000000).cast("long"))
      .withColumn("_arr", collect_list(col("_vm")).over(w))
      .withColumn("n", size(col("_arr")).cast("long"))
      .withColumn("ewma_micros", expr(smooth("_arr")))
      .withColumn("_arr2", collect_list(col("ewma_micros")).over(w))
      .withColumn("dewma_micros", expr(smooth("_arr2")))
      .withColumn("forecast_micros",
        lit(3L) * col("ewma_micros") - lit(2L) * col("dewma_micros"))
      .drop("_vm", "_arr", "_arr2")
  }

  /** CUSUM changepoint estimate per group — "when did this metric's level
    * shift?" over a per-period series (Page's cumulative-sum statistic;
    * the standard first-look shift detector for pipeline telemetry).
    *
    * For the group's ordered values x₁..xₙ with prefix sums Pₖ and total
    * S, the mean-centered cumulative sum is Cₖ = Σᵢ≤ₖ(xᵢ − S/n); scaling
    * by n clears the fraction: Cₖ·n = n·Pₖ − k·S, exact integers. The
    * changepoint estimate is the period at max |Cₖ| (the classic CUSUM
    * argmax; ties → EARLIEST period, pinned via the packed-order max).
    *
    * Scale shape: the raw series is assumed pre-aggregated (per-period
    * counts — periods per group, not rows); one window Exchange on the
    * group key computes rank/prefix/totals in a single pass, then a hash
    * agg reduces to one row per group. The argmax is the packed-long
    * max trick (|C|·10⁵ + reversed epoch-day) — no second window, no
    * join, and the same packing replays in ANSI SQL. Periods-per-group
    * is calendar-bounded (e.g. days), so the window partition never
    * scales with corpus size. */
  /** Daily time-weighted average (TWAP) of an irregularly-sampled value
    * per group — the metric a monitoring/pricing pass wants when sample
    * spacing is uneven (a plain AVG over-weights bursts). Each sample
    * holds its value until the NEXT sample in the same (group, day);
    * the day's last sample holds until midnight, so the denominator
    * covers first-sample → day-end exactly once.
    *
    * Exact integers throughout: epoch-second durations × milli-quantized
    * values, truncating division (UTC session; `ts.cast(long)` and the
    * day arithmetic agree with a naive-timestamp SQL engine verbatim).
    *
    * Scale shape: one window Exchange on (group, day) for the lead()
    * lookahead, then a hash agg on the SAME key — Catalyst reuses the
    * partitioning, so the agg is exchange-free. Samples-per-(group, day)
    * bounds the window partition, never the corpus. */
  def twapDaily(df: DataFrame, groupCol: String, tsCol: String,
                valueCol: String): DataFrame = {
    // the window and the final agg share the (group, _day) key so the
    // agg reuses the window's Exchange
    // tie-break on the QUANTIZED value: rows tying on (ts, _vm) are
    // interchangeable in every output sum, so the order is total enough
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol), col("_day"))
      .orderBy(col(tsCol).asc, col("_vm").asc)
    df.withColumn("_day",
        datediff(to_date(col(tsCol)), lit("1970-01-01")).cast("long"))
      .withColumn("_sec", col(tsCol).cast("long"))
      .withColumn("_vm", floor(col(valueCol) * 1000).cast("long"))
      .withColumn("_next", coalesce(
        lead(col("_sec"), 1).over(w), (col("_day") + 1L) * 86400L))
      .withColumn("_dt", col("_next") - col("_sec"))
      .groupBy(col(groupCol), col("_day").as("epoch_day"))
      .agg(count(lit(1)).as("n_samples"),
        sum(col("_dt")).as("covered_sec"),
        // negative values are legal -> the (x - x%y) div y spelling keeps
        // truncating (Spark) and flooring (DuckDB) division identical
        expr("""cast((sum(cast(_vm as decimal(38,0)) * _dt)
               |  - sum(cast(_vm as decimal(38,0)) * _dt)
               |    % nullif(sum(_dt), 0))
               | div nullif(sum(_dt), 0) as bigint)""".stripMargin)
          .as("twap_milli"))
  }

  def cusumChangepoint(series: DataFrame, groupCol: String, dayCol: String,
                       valueCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col(dayCol).asc)
    val whole = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)) // same key: one Exchange for all four
    series
      .withColumn("_day", datediff(col(dayCol), lit("1970-01-01"))
        .cast("long"))
      .withColumn("_k", row_number().over(w).cast("long"))
      .withColumn("_p", sum(col(valueCol)).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, org.apache.spark.sql.expressions
          .Window.currentRow)))
      .withColumn("_n", count(lit(1)).over(whole))
      .withColumn("_s", sum(col(valueCol)).over(whole))
      // decimal cross products: n·P reaches ~3.6e15 at 100 TB daily
      // counts, and the ×10⁵ pack below would overflow int64 — decimal
      // keeps both exact at any scale
      .withColumn("_ac", abs(
        col("_n").cast("decimal(38,0)") * col("_p") -
          col("_k").cast("decimal(38,0)") * col("_s")))
      // pack (|C| major, earliest-day-on-ties minor) in decimal(38,0):
      // reversed day = 99999 − epoch-day keeps max-pack = earliest day
      .withColumn("_pack",
        col("_ac") * lit(100000L) + (lit(99999L) - col("_day")))
      .groupBy(col(groupCol))
      .agg(max(col("_n")).as("n_periods"), max(col("_s")).as("total"),
        max(col("_pack")).as("_mp"))
      .select(col(groupCol), col("n_periods"), col("total"),
        (lit(99999L) - pmod(col("_mp"), lit(100000L))).cast("long")
          .as("change_epoch_day"),
        expr("cast(_mp div 100000 as bigint)").as("peak_abs_scaled"))
  }
}
