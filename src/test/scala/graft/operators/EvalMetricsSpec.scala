package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class EvalMetricsSpec extends SparkSpec {

  private def lbl(pairs: Seq[(Long, Long)]): DataFrame = {
    import spark.implicits._
    pairs.toDF("y", "score").withColumn("g", lit(0L))
  }

  private def auc(df: DataFrame): Option[Long] = {
    val r = EvalMetrics.aucByGroup(df, "g", "y", "score").collect()(0)
    if (r.isNullAt(r.fieldIndex("auc_ppm"))) None
    else Some(r.getAs[Long]("auc_ppm"))
  }

  test("auc: perfect separation is exactly 1e6; reversal exactly 0") {
    val d = lbl(Seq((0L, 1L), (0L, 2L), (0L, 3L), (1L, 10L), (1L, 11L)))
    assert(auc(d) === Some(1000000L))
    val rev = d.withColumn("score", -col("score"))
    assert(auc(rev) === Some(0L))
  }

  test("auc: constant score (all one tie cell) is exactly 500000") {
    val d = lbl(Seq((0L, 7L), (1L, 7L), (0L, 7L), (1L, 7L), (1L, 7L)))
    assert(auc(d) === Some(500000L))
  }

  test("auc: invariant under strictly monotone score transforms") {
    val d = lbl(Seq((0L, 1L), (1L, 2L), (0L, 2L), (1L, 5L), (0L, 9L),
      (1L, 9L), (1L, 14L)))
    val a0 = auc(d)
    assert(a0.isDefined)
    assert(auc(d.withColumn("score", col("score") * 7L + 3L)) === a0)
  }

  test("auc: complement law auc(s) + auc(−s) = 1e6 (ties included)") {
    val d = lbl(Seq((0L, 1L), (1L, 1L), (0L, 2L), (1L, 3L), (0L, 3L),
      (1L, 3L), (0L, 8L)))
    val a = auc(d).get
    val b = auc(d.withColumn("score", -col("score"))).get
    // each side floors its own ppm rational; the exact rationals sum to 1,
    // so the floors sum to 1e6 or 1e6−1
    assert(a + b === 1000000L || a + b === 999999L)
  }

  test("auc: degenerate groups (single-class) yield NULL, not a number") {
    assert(auc(lbl(Seq((1L, 1L), (1L, 2L)))) === None)
    assert(auc(lbl(Seq((0L, 1L), (0L, 2L)))) === None)
  }

  test("auc: matches the O(n²) pair-counting definition on real-ish data") {
    // AUC = (#concordant + #ties/2) / (n⁺·n⁻), brute-forced
    val pairs = Seq((0L, 3L), (1L, 5L), (0L, 5L), (1L, 8L), (0L, 2L),
      (1L, 2L), (1L, 9L), (0L, 9L), (1L, 3L), (0L, 8L), (1L, 8L))
    val pos = pairs.filter(_._1 == 1L).map(_._2)
    val neg = pairs.filter(_._1 == 0L).map(_._2)
    val num2 = (for (p <- pos; n <- neg) yield {
      if (p > n) 2L else if (p == n) 1L else 0L
    }).sum // 2×(concordant + tie/2)
    val expect = num2 * 1000000L / (2L * pos.size * neg.size)
    assert(auc(lbl(pairs)) === Some(expect))
  }

  test("confusion: cells partition n; p/r/f1 match hand arithmetic") {
    import spark.implicits._
    val d = Seq((1L, 1L), (1L, 1L), (1L, 0L), (0L, 1L), (0L, 0L),
      (0L, 0L), (0L, 0L)).toDF("y", "yhat").withColumn("g", lit(0L))
    val r = EvalMetrics.confusionByGroup(d, "g", "y", "yhat").collect()(0)
    assert(r.getAs[Long]("tp") === 2L && r.getAs[Long]("fp") === 1L &&
      r.getAs[Long]("fn") === 1L && r.getAs[Long]("tn") === 3L)
    assert(r.getAs[Long]("precision_ppm") === 2000000L / 3L)
    assert(r.getAs[Long]("recall_ppm") === 2000000L / 3L)
    // f1 = 2·2/(2·2+1+1) = 2/3
    assert(r.getAs[Long]("f1_ppm") === 4000000L / 6L)
  }

  test("confusion: empty denominators are NULL") {
    import spark.implicits._
    val d = Seq((0L, 0L), (0L, 0L)).toDF("y", "yhat")
      .withColumn("g", lit(0L))
    val r = EvalMetrics.confusionByGroup(d, "g", "y", "yhat").collect()(0)
    assert(r.isNullAt(r.fieldIndex("precision_ppm")))
    assert(r.isNullAt(r.fieldIndex("recall_ppm")))
    assert(r.isNullAt(r.fieldIndex("f1_ppm")))
  }

  test("calibration: bins partition the input; clamps catch out-of-range") {
    import spark.implicits._
    val d = Seq((1L, -5L), (0L, 0L), (1L, 49L), (0L, 50L), (1L, 99L),
      (0L, 100L), (1L, 700L)).toDF("y", "score")
    val got = EvalMetrics.calibrationBins(d, "y", "score", 0L, 100L, 2)
      .collect().map(r => (r.getAs[Long]("bin"), r.getAs[Long]("n")))
      .toMap
    // −5 clamps to bin 0; 50 opens bin 1 ([0,50)/[50,100)); 700 and the
    // exact upper edge 100 clamp into bin 1
    assert(got === Map(0L -> 3L, 1L -> 4L))
    assert(got.values.sum === 7L)
  }

  test("kappa: identical raters = 1e6; complementary raters ≤ 0") {
    import spark.implicits._
    val r = Seq(1L, 0L, 1L, 1L, 0L, 0L, 1L)
    val same = r.map(v => (v, v)).toDF("r1", "r2")
    val g1 = EvalMetrics.cohensKappa(same, "r1", "r2").collect()(0)
    assert(g1.getAs[Long]("kappa_ppm") === 1000000L)
    val opp = r.map(v => (v, 1L - v)).toDF("r1", "r2")
    val g2 = EvalMetrics.cohensKappa(opp, "r1", "r2").collect()(0)
    assert(g2.getAs[Long]("kappa_ppm") <= 0L)
  }

  test("kappa: symmetric in the raters; constant rater yields NULL") {
    import spark.implicits._
    val d = Seq((1L, 0L), (1L, 1L), (0L, 0L), (0L, 1L), (1L, 1L))
      .toDF("r1", "r2")
    val k12 = EvalMetrics.cohensKappa(d, "r1", "r2").collect()(0)
      .getAs[Long]("kappa_ppm")
    val k21 = EvalMetrics.cohensKappa(d, "r2", "r1").collect()(0)
      .getAs[Long]("kappa_ppm")
    assert(k12 === k21)
    // ONE constant rater keeps pe < 1: chance agreement exactly explains
    // the observed agreement, so kappa is 0 — not NULL
    val oneConst = Seq((1L, 1L), (0L, 1L)).toDF("r1", "r2")
    assert(EvalMetrics.cohensKappa(oneConst, "r1", "r2").collect()(0)
      .getAs[Long]("kappa_ppm") === 0L)
    // BOTH raters constant is the degenerate pe = 1 case: NULL
    val bothConst = Seq((1L, 1L), (1L, 1L)).toDF("r1", "r2")
    val r = EvalMetrics.cohensKappa(bothConst, "r1", "r2").collect()(0)
    assert(r.isNullAt(r.fieldIndex("kappa_ppm")))
  }

  test("gini: uniform mass = 0; single holder = (n−1)/n; known split") {
    import spark.implicits._
    val flat = (1L to 10L).map(k => (k, 100L)).toDF("k", "v")
    assert(EvalMetrics.giniConcentration(flat, "k", "v")
      .collect()(0).getAs[Long]("gini_ppm") === 0L)
    val one = ((1L to 9L).map(k => (k, 0L)) :+ (10L, 500L)).toDF("k", "v")
    assert(EvalMetrics.giniConcentration(one, "k", "v")
      .collect()(0).getAs[Long]("gini_ppm") === 900000L)
    // x = (1,2,3,4): G = (2·(1+4+9+16) − 5·10)/(4·10) = 10/40 = 0.25
    val ramp = Seq((1L, 1L), (2L, 2L), (3L, 3L), (4L, 4L)).toDF("k", "v")
    assert(EvalMetrics.giniConcentration(ramp, "k", "v")
      .collect()(0).getAs[Long]("gini_ppm") === 250000L)
  }

  test("pr curve: precision at top cell is its purity; recall ends at 1e6 " +
    "and is monotone as the threshold drops") {
    import spark.implicits._
    val d = Seq((1L, 9L), (0L, 9L), (1L, 5L), (1L, 5L), (0L, 3L), (1L, 1L))
      .toDF("y", "score")
    val rows = EvalMetrics.prCurve(d, "y", "score")
      .orderBy(col("threshold").desc).collect()
    assert(rows.length === 4)
    assert(rows(0).getAs[Long]("precision_ppm") === 500000L) // 1/2 at t=9
    val recalls = rows.map(_.getAs[Long]("recall_ppm"))
    assert(recalls.last === 1000000L)
    assert(recalls.sameElements(recalls.sorted))
  }

  test("fleissKappa: hand-computed 3-item 2-rater panel") {
    import spark.implicits._
    // i1: a,a; i2: a,b; i3: b,b -> S=10, T=6, C2=18
    // Pbar = 4/6, Pe = 1/2, kappa = (4*6 - 18)/(36 - 18) = 1/3
    val d = Seq((1L, "a"), (1L, "a"), (2L, "a"), (2L, "b"), (3L, "b"),
      (3L, "b")).toDF("item", "cat")
    val got = EvalMetrics.fleissKappa(d, "item", "cat", nRaters = 2)
      .as[(Long, Long, Long, Long, Long)].collect().head
    assert(got === ((3L, 2L, 666666L, 500000L, 333333L)))
  }

  test("fleissKappa: systematic disagreement is exactly -1e6; unanimity 1e6") {
    import spark.implicits._
    val disagree = Seq((1L, "a"), (1L, "b"), (2L, "a"), (2L, "b"))
      .toDF("item", "cat")
    val g1 = EvalMetrics.fleissKappa(disagree, "item", "cat", 2)
      .select("kappa_ppm").as[Long].collect().head
    assert(g1 === -1000000L)
    // unanimous on DIFFERENT categories per item: Pbar = 1, Pe < 1
    val unanimous = Seq((1L, "a"), (1L, "a"), (2L, "b"), (2L, "b"))
      .toDF("item", "cat")
    val g2 = EvalMetrics.fleissKappa(unanimous, "item", "cat", 2)
      .select("kappa_ppm").as[Long].collect().head
    assert(g2 === 1000000L)
  }

  test("ksStatistic: perfect separation is 1e6 at the boundary score; " +
    "tied maxima break to the LOWEST score; degenerate group is NULL") {
    import spark.implicits._
    // pos at {1,2}, neg at {3,4} -> KS=1 at s=2
    val sep = Seq((1L, 1L), (2L, 1L), (3L, 0L), (4L, 0L))
      .toDF("score", "y").withColumn("g", lit("s"))
    val s1 = EvalMetrics.ksStatistic(sep, "g", "y", "score").collect().head
    assert(s1.getAs[Long]("ks_ppm") === 1000000L)
    assert(s1.getAs[Long]("ks_at_score") === 2L)
    // interleaved: max d=2 at s=1 AND s=3 -> argmax reports 1
    val mix = Seq((1L, 1L), (2L, 0L), (3L, 1L), (4L, 0L))
      .toDF("score", "y").withColumn("g", lit("m"))
    val m = EvalMetrics.ksStatistic(mix, "g", "y", "score").collect().head
    assert(m.getAs[Long]("ks_ppm") === 500000L)
    assert(m.getAs[Long]("ks_at_score") === 1L)
    // one-class group: no distance to measure
    val one = Seq((1L, 1L), (2L, 1L)).toDF("score", "y")
      .withColumn("g", lit("d"))
    val d = EvalMetrics.ksStatistic(one, "g", "y", "score").collect().head
    assert(d.isNullAt(d.fieldIndex("ks_ppm")))
  }

  test("poissonBootstrapCI: constant values collapse the CI to the point") {
    import spark.implicits._
    val d = (1L to 300L).map(i => (i, 4200L)).toDF("id", "v")
    val got = EvalMetrics.poissonBootstrapCI(d, "id", "v", reps = 40)
      .as[(Long, Long, Long, Long, Long, Long)].collect().head
    // (n, mean, n_reps, lo, med, hi)
    assert(got === ((300L, 4200L, 40L, 4200L, 4200L, 4200L)))
  }

  test("poissonBootstrapCI: deterministic, ordered, and covers the mean") {
    import spark.implicits._
    val d = (1L to 500L).map(i => (i, i * 10L)).toDF("id", "v")
    val run1 = EvalMetrics.poissonBootstrapCI(d, "id", "v", reps = 100)
      .as[(Long, Long, Long, Long, Long, Long)].collect().head
    val run2 = EvalMetrics.poissonBootstrapCI(d, "id", "v", reps = 100)
      .as[(Long, Long, Long, Long, Long, Long)].collect().head
    assert(run1 === run2) // pure function of (data, salt)
    val (_, mean, nReps, lo, med, hi) = run1
    assert(nReps === 100L && lo <= med && med <= hi)
    // the 95% CI of the mean of 1..500 (x10) straddles the true mean
    assert(lo <= mean && mean <= hi)
    // and it is a genuine interval, not a collapsed point
    assert(lo < hi)
  }

  test("ndcgAtK: perfect ranking is exactly 1e6; hand-computed reversal") {
    import spark.implicits._
    // rel (3,2,0); system order by key desc. Perfect: keys align with rel
    val perfect = Seq((1L, 30L, 3L), (2L, 20L, 2L), (3L, 10L, 0L))
      .toDF("id", "key", "rel").withColumn("g", lit("q"))
    val p = EvalMetrics.ndcgAtK(perfect, "g", "rel",
      Seq(col("key").desc, col("id").asc), k = 10).collect().head
    assert(p.getAs[Long]("ndcg_ppm") === 1000000L)
    // reversal: dcg = 3*w3 + 2*w2 = 2761858, idcg = 3*w1 + 2*w2 = 4261858
    val reversed = Seq((1L, 10L, 3L), (2L, 20L, 2L), (3L, 30L, 0L))
      .toDF("id", "key", "rel").withColumn("g", lit("q"))
    val r = EvalMetrics.ndcgAtK(reversed, "g", "rel",
      Seq(col("key").desc, col("id").asc), k = 10).collect().head
    assert(r.getAs[Long]("dcg_ppm") === 2761858L)
    assert(r.getAs[Long]("idcg_ppm") === 4261858L)
    assert(r.getAs[Long]("ndcg_ppm") === 648040L)
  }

  test("ndcgAtK: zero-relevance group yields NULL; top-k trims the tail") {
    import spark.implicits._
    val zero = Seq((1L, 5L, 0L), (2L, 4L, 0L)).toDF("id", "key", "rel")
      .withColumn("g", lit("z"))
    val z = EvalMetrics.ndcgAtK(zero, "g", "rel",
      Seq(col("key").desc, col("id").asc), k = 10).collect().head
    assert(z.isNullAt(z.fieldIndex("ndcg_ppm")))
    // rank-11 relevance contributes nothing at k=10
    val tail = ((1 to 10).map(i => (i.toLong, 100L - i, 0L)) :+
      (11L, 1L, 3L)).toDF("id", "key", "rel").withColumn("g", lit("t"))
    val t = EvalMetrics.ndcgAtK(tail, "g", "rel",
      Seq(col("key").desc, col("id").asc), k = 10).collect().head
    assert(t.getAs[Long]("dcg_ppm") === 0L) // the only rel sits at rank 11
    assert(t.getAs[Long]("idcg_ppm") === 3000000L) // ideal puts it first
    assert(t.getAs[Long]("ndcg_ppm") === 0L)
  }

  test("PoissonWeights.cdf24 is the integer reading of poissonCdfHex6 " +
    "(the fused kernel and the SQL twin share one pinned CDF)") {
    assert(org.apache.spark.sql.graft.PoissonWeights.cdf24.toSeq ===
      EvalMetrics.poissonCdfHex6.map(Integer.parseInt(_, 16)))
  }

  test("poissonBootstrapCI: replicate blowup stays inside the scan stage " +
    "(pruned read, map-side partial aggregate before any exchange)") {
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_orderkey"),
        floor(col("o_totalprice") * 100).cast("long").as("cents"))
    val plan = EvalMetrics.poissonBootstrapCI(orders, "o_orderkey", "cents")
      .queryExecution.executedPlan.toString
    // only the two needed columns reach the parquet scan
    assert(plan.contains("ReadSchema: struct<o_orderkey:bigint,o_totalprice:double>"),
      plan)
    // the per-rep reduction partially aggregates before its shuffle:
    // partial HashAggregate appears below the first Exchange in the
    // per-rep branch (keys=[_rep...], partial merge functions)
    assert("HashAggregate\\(keys=\\[_rep".r.findAllIn(plan).size >= 2, plan)
  }
}
