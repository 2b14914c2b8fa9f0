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
}
