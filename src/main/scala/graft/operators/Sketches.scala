package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** At-rest MERGEABLE AGGREGATE STATE: a parquet table of per-group HLL
  * sketches (Spark 4's Apache DataSketches integration —
  * `hll_sketch_agg` / `hll_union_agg` / `hll_sketch_estimate`) that
  * answers distinct-count questions WITHOUT rescanning the fact data.
  *
  * The 100 TB pattern: the fact scan happens once, at sketch-build time
  * (e.g. per ingest batch — sketches of disjoint batches union to the
  * sketch of their union, so the table maintains incrementally); every
  * later query aggregates kilobyte sketches instead of terabyte facts,
  * and any GROUP BY over a SUBSET of the sketch keys is answerable by
  * union-merging — one sketch table serves the whole rollup lattice.
  * Same determinism contract as `a_approx_distinct`: the estimate is a
  * pure function of the input multiset. Oracle status varies by family
  * (r17): the DataSketches HLL/KLL estimator internals (coupon and
  * compaction modes) have no SQL replay — those registry rows stay
  * rows-only with error/merge laws spec-pinned (`SketchesSpec`) — but
  * the deterministic CMS rollup and the exact-mode theta overlap are
  * fully hash-oracled in DuckDB, and the bitmap family is exact by
  * construction. */
object Sketches {

  /** One sketch per `groupCols` tuple over `valueCol`, `lgK` per the
    * DataSketches accuracy table (12 → ~2% RSE). */
  def sketchTable(df: DataFrame, groupCols: Seq[String], valueCol: String,
                  lgK: Int = 12): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol), lit(lgK)).as("sketch"))

  private val built = new graft.SessionMemo[String, String]()

  /** Build the sketch table ONCE per dataset key and persist it as
    * parquet (binary sketch column) — the at-rest artifact queries
    * merge from. */
  def sketchTableFor(df: => DataFrame, groupCols: Seq[String],
                     valueCol: String, key: String,
                     spark: SparkSession): String =
    built.getOrCompute(spark, key) {
      val path = graft.TmpArtifacts.path("graft-sketches", key)
      sketchTable(df, groupCols, valueCol).write.mode("overwrite")
        .parquet(path)
      path
    }

  /** Distinct-count estimates for any GROUP BY over a subset of the
    * sketch table's keys: kilobyte sketch merges, zero fact reads. */
  def distinctFromSketches(spark: SparkSession, path: String,
                           rollupCols: Seq[String]): DataFrame =
    spark.read.parquet(path)
      .groupBy(rollupCols.map(col): _*)
      .agg(hll_sketch_estimate(hll_union_agg(col("sketch"), lit(false)))
        .as("approx_distinct"))

  // ---- quantile sketches (KLL) — the percentile sibling of the HLL
  // ---- family above; custom TypedImperativeAggregate because Spark 4
  // ---- exposes DataSketches only for distinct counts

  import org.apache.spark.sql.{Column, GraftBridge}
  import org.apache.spark.sql.graft.{KllMergeAgg, KllQuantile, KllRank, KllSketchAgg, KllSketchN}

  /** `kll_sketch_agg(value, k)` as a DSL Column. */
  def kllSketchAgg(value: Column, k: Int = 200): Column =
    GraftBridge.column(
      KllSketchAgg(GraftBridge.expression(value.cast("double")), k)
        .toAggregateExpression())

  /** `kll_merge_agg(sketchBytes, k)` as a DSL Column. */
  def kllMergeAgg(sketch: Column, k: Int = 200): Column =
    GraftBridge.column(
      KllMergeAgg(GraftBridge.expression(sketch), k).toAggregateExpression())

  def kllQuantile(sketch: Column, rank: Double): Column =
    GraftBridge.column(KllQuantile(GraftBridge.expression(sketch),
      org.apache.spark.sql.catalyst.expressions.Literal(rank)))

  def kllRank(sketch: Column, value: Column): Column =
    GraftBridge.column(KllRank(GraftBridge.expression(sketch),
      GraftBridge.expression(value.cast("double"))))

  def kllN(sketch: Column): Column =
    GraftBridge.column(KllSketchN(GraftBridge.expression(sketch)))

  /** One KLL sketch per `groupCols` tuple over `valueCol` — the quantile
    * analogue of [[sketchTable]]; same one-fact-scan, merge-forever
    * contract. */
  def quantileSketchTable(df: DataFrame, groupCols: Seq[String],
                          valueCol: String, k: Int = 200): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(kllSketchAgg(col(valueCol), k).as("qsketch"))

  private val builtQ = new graft.SessionMemo[String, String]()

  /** Build the quantile-sketch table ONCE per dataset key and persist it
    * as parquet (binary sketch column). */
  def quantileSketchTableFor(df: => DataFrame, groupCols: Seq[String],
                             valueCol: String, key: String,
                             spark: SparkSession, k: Int = 200): String =
    builtQ.getOrCompute(spark, key) {
      val path = graft.TmpArtifacts.path("graft-qsketches", key)
      quantileSketchTable(df, groupCols, valueCol, k).write.mode("overwrite")
        .parquet(path)
      path
    }

  /** Percentile estimates for any GROUP BY over a subset of the sketch
    * table's keys: kilobyte sketch merges, zero fact reads. Emits one row
    * per rollup group with the exact merged `n` and a value column per
    * requested rank. */
  def quantilesFromSketches(spark: SparkSession, path: String,
                            rollupCols: Seq[String],
                            ranks: Seq[(String, Double)] = Seq(
                              "p50" -> 0.5, "p95" -> 0.95, "p99" -> 0.99),
                            k: Int = 200): DataFrame = {
    spark.read.parquet(path)
      .groupBy(rollupCols.map(col): _*)
      .agg(kllMergeAgg(col("qsketch"), k).as("m"))
      .select(rollupCols.map(col) ++
        Seq(kllN(col("m")).as("n")) ++
        ranks.map { case (name, r) => kllQuantile(col("m"), r).as(name) }: _*)
  }

  // ---- count-min sketches — point-FREQUENCY estimates for ARBITRARY
  // ---- keys (Misra-Gries keeps only heavy hitters; CMS answers "how
  // ---- often did key X occur" for any X in depth·width·8 bytes,
  // ---- never undercounting), with an EXACT counter-wise merge law

  import org.apache.spark.sql.graft.{CmsEstimate, CmsMergeAgg, CmsSketchAgg, CmsSketchN}

  /** `cms_sketch_agg(key, depth, width)` as a DSL Column. */
  def cmsSketchAgg(key: Column, depth: Int = 4, width: Int = 2048): Column =
    GraftBridge.column(
      CmsSketchAgg(GraftBridge.expression(key.cast("long")), depth, width)
        .toAggregateExpression())

  /** `cms_merge_agg(sketchBytes, depth, width)` as a DSL Column. */
  def cmsMergeAgg(sketch: Column, depth: Int = 4,
                  width: Int = 2048): Column =
    GraftBridge.column(
      CmsMergeAgg(GraftBridge.expression(sketch), depth, width)
        .toAggregateExpression())

  def cmsEstimate(sketch: Column, key: Column): Column =
    GraftBridge.column(CmsEstimate(GraftBridge.expression(sketch),
      GraftBridge.expression(key.cast("long"))))

  def cmsN(sketch: Column): Column =
    GraftBridge.column(CmsSketchN(GraftBridge.expression(sketch)))

  /** One CMS per `groupCols` tuple over `keyCol` — same one-fact-scan,
    * merge-forever contract as the HLL/KLL tables. */
  def cmsTable(df: DataFrame, groupCols: Seq[String], keyCol: String,
               depth: Int = 4, width: Int = 2048): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(cmsSketchAgg(col(keyCol), depth, width).as("fsketch"))

  private val builtC = new graft.SessionMemo[String, String]()

  /** Build the frequency-sketch table ONCE per dataset key and persist
    * it as parquet (binary sketch column). */
  def cmsTableFor(df: => DataFrame, groupCols: Seq[String], keyCol: String,
                  key: String, spark: SparkSession, depth: Int = 4,
                  width: Int = 2048): String =
    builtC.getOrCompute(spark, key) {
      val path = graft.TmpArtifacts.path("graft-fsketches", key)
      cmsTable(df, groupCols, keyCol, depth, width).write.mode("overwrite")
        .parquet(path)
      path
    }

  /** Point-frequency estimates for `probeKeys` over any GROUP BY of a
    * subset of the sketch table's keys: kilobyte merges, zero fact
    * reads. One output row per (rollup group, probe key). */
  def frequenciesFromSketches(spark: SparkSession, path: String,
                              rollupCols: Seq[String],
                              probeKeys: Seq[Long], depth: Int = 4,
                              width: Int = 2048): DataFrame = {
    val merged = spark.read.parquet(path)
      .groupBy(rollupCols.map(col): _*)
      .agg(cmsMergeAgg(col("fsketch"), depth, width).as("m"))
    val probes = explode(array(probeKeys.map(lit): _*)).as("probe_key")
    merged
      // n is computed in its OWN projection BELOW the probe explode: in a
      // shared select the analyzer hoists it above the Generate and the
      // sketch-total kernel re-runs once per PROBE (the explode-hoist
      // class PlanQualitySpec sweeps for). cmsEstimate legitimately sits
      // above — it consumes the generated probe_key.
      .select(rollupCols.map(col) ++
        Seq(cmsN(col("m")).as("n"), col("m")): _*)
      .select(rollupCols.map(col) ++ Seq(col("n"), col("m"), probes): _*)
      .select(rollupCols.map(col) ++ Seq(col("n"),
        col("probe_key").cast("long").as("probe_key"),
        cmsEstimate(col("m"), col("probe_key")).as("est_count")): _*)
  }

  /** CMS inner product — the join-SIZE estimator (never undercounts). */
  def cmsInnerProduct(a: Column, b: Column): Column =
    GraftBridge.column(org.apache.spark.sql.graft.CmsInnerProduct(
      GraftBridge.expression(a), GraftBridge.expression(b)))

  // ---- Spark-native HLL++ register tables — the DataSketches HLL
  // ---- table's contract with RUN-IDENTICAL bytes (registers are
  // ---- order-insensitive slot maxes) and a DuckDB-replayable
  // ---- estimator (graft.HllSql), so the rollup row carries a full
  // ---- hash oracle where the DataSketches twin is rows-only

  import org.apache.spark.sql.graft.{HllPpEstimate, HllPpMergeAgg, HllPpSketchAgg}

  /** `hllpp_sketch_agg(key, rsd)` as a DSL Column (keys cast to long —
    * the `approx_count_distinct` register build, exposed as bytes). */
  def hllppSketchAgg(value: Column, rsd: Double = 0.02): Column =
    GraftBridge.column(
      HllPpSketchAgg(GraftBridge.expression(value.cast("long")), rsd)
        .toAggregateExpression())

  /** `hllpp_merge_agg(sketchBytes, rsd)` — register-wise max (EXACT:
    * disjoint-batch merges are byte-identical to a whole-input build). */
  def hllppMergeAgg(sketch: Column, rsd: Double = 0.02): Column =
    GraftBridge.column(
      HllPpMergeAgg(GraftBridge.expression(sketch), rsd)
        .toAggregateExpression())

  /** The exact `HyperLogLogPlusPlusHelper.query` estimate. */
  def hllppEstimate(sketch: Column, rsd: Double = 0.02): Column =
    GraftBridge.column(HllPpEstimate(GraftBridge.expression(sketch), rsd))

  private val builtH = new graft.SessionMemo[String, String]()

  /** Build the HLL++ register table ONCE per dataset key and persist it
    * as parquet — same at-rest contract as [[sketchTableFor]]. */
  def hllppSketchTableFor(df: => DataFrame, groupCols: Seq[String],
                          valueCol: String, key: String,
                          spark: SparkSession, rsd: Double = 0.02): String =
    builtH.getOrCompute(spark, key) {
      val path = graft.TmpArtifacts.path("graft-hppsketches", key)
      df.groupBy(groupCols.map(col): _*)
        .agg(hllppSketchAgg(col(valueCol), rsd).as("sketch"))
        .write.mode("overwrite").parquet(path)
      path
    }

  /** Distinct-count estimates for any GROUP BY over a subset of the
    * register table's keys: kilobyte max-merges, zero fact reads —
    * and the estimate equals `approx_count_distinct(value, rsd)` over
    * the rolled-up group EXACTLY (slot maxes commute with the rollup),
    * which is what lets `a_hllpp_rollup` verify under the graft.HllSql
    * hash oracle. */
  def distinctFromHllpp(spark: SparkSession, path: String,
                        rollupCols: Seq[String],
                        rsd: Double = 0.02): DataFrame =
    spark.read.parquet(path)
      .groupBy(rollupCols.map(col): _*)
      .agg(hllppEstimate(hllppMergeAgg(col("sketch"), rsd), rsd)
        .as("approx_distinct"))

  // ---- roaring bitmaps — the EXACT mergeable distinct structure: the
  // ---- at-rest contract of the HLL tables with a hash-verifiable
  // ---- answer; size grows with distinct keys (HLL stays kilobytes)

  import org.apache.spark.sql.graft.{BitmapAgg, BitmapCount, BitmapOrAgg}

  def bitmapAgg(key: Column): Column =
    GraftBridge.column(
      BitmapAgg(GraftBridge.expression(key.cast("long")))
        .toAggregateExpression())

  def bitmapOrAgg(bitmap: Column): Column =
    GraftBridge.column(
      BitmapOrAgg(GraftBridge.expression(bitmap)).toAggregateExpression())

  def bitmapCount(bitmap: Column): Column =
    GraftBridge.column(BitmapCount(GraftBridge.expression(bitmap)))

  /** One bitmap per `groupCols` tuple over `keyCol`. */
  def bitmapTable(df: DataFrame, groupCols: Seq[String],
                  keyCol: String): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(bitmapAgg(col(keyCol)).as("bm"))

  private val builtB = new graft.SessionMemo[String, String]()

  /** Build the bitmap table ONCE per dataset key, persist as parquet. */
  def bitmapTableFor(df: => DataFrame, groupCols: Seq[String],
                     keyCol: String, key: String,
                     spark: SparkSession): String =
    builtB.getOrCompute(spark, key) {
      val path = graft.TmpArtifacts.path("graft-bitmaps", key)
      bitmapTable(df, groupCols, keyCol).write.mode("overwrite")
        .parquet(path)
      path
    }

  /** EXACT distinct counts for any GROUP BY over a subset of the bitmap
    * table's keys: OR-merges, zero fact reads — and unlike the HLL twin
    * this answers under the count(DISTINCT) oracle hash-exactly. */
  def distinctFromBitmaps(spark: SparkSession, path: String,
                          rollupCols: Seq[String]): DataFrame =
    spark.read.parquet(path)
      .groupBy(rollupCols.map(col): _*)
      .agg(bitmapCount(bitmapOrAgg(col("bm"))).as("n_distinct"))

  // ---- theta sketches — SET ALGEBRA over at-rest sketches: HLL unions,
  // ---- theta also intersects and differences ("did A and B", "did A but
  // ---- never B" answered from kilobyte per-segment sketches)

  import org.apache.spark.sql.graft.{ThetaAnotBSketch, ThetaEstimate, ThetaIntersectSketch, ThetaSketchAgg, ThetaUnionAgg}

  /** `theta_sketch_agg(id, lgK)` as a DSL Column (ids cast to long). */
  def thetaSketchAgg(value: Column, lgK: Int = 12): Column =
    GraftBridge.column(
      ThetaSketchAgg(GraftBridge.expression(value.cast("long")), lgK)
        .toAggregateExpression())

  /** `theta_union_agg(sketchBytes, lgK)` as a DSL Column. */
  def thetaUnionAgg(sketch: Column, lgK: Int = 12): Column =
    GraftBridge.column(
      ThetaUnionAgg(GraftBridge.expression(sketch), lgK)
        .toAggregateExpression())

  def thetaEstimate(sketch: Column): Column =
    GraftBridge.column(ThetaEstimate(GraftBridge.expression(sketch)))

  def thetaIntersect(a: Column, b: Column): Column =
    GraftBridge.column(ThetaIntersectSketch(
      GraftBridge.expression(a), GraftBridge.expression(b)))

  def thetaAnotB(a: Column, b: Column): Column =
    GraftBridge.column(ThetaAnotBSketch(
      GraftBridge.expression(a), GraftBridge.expression(b)))

  private val builtT = new graft.SessionMemo[String, String]()

  /** Build a per-segment theta sketch table ONCE per dataset key and
    * persist it as parquet — the at-rest artifact segment-overlap
    * queries read instead of the fact table. */
  def thetaSketchTableFor(df: => DataFrame, groupCols: Seq[String],
                          valueCol: String, key: String,
                          spark: SparkSession, lgK: Int = 12): String =
    builtT.getOrCompute(spark, key) {
      val path = graft.TmpArtifacts.path("graft-tsketches", key)
      df.groupBy(groupCols.map(col): _*)
        .agg(thetaSketchAgg(col(valueCol), lgK).as("tsketch"))
        .write.mode("overwrite").parquet(path)
      path
    }

  /** Pairwise segment-overlap matrix from an at-rest theta sketch table:
    * for every ordered segment pair (a < b), the estimated count of ids
    * in BOTH segments and in A ONLY. The join is sketch-row × sketch-row
    * — |segments|² kilobyte set operations, zero fact reads; the fact
    * table equivalent is |segments|² self-semi-joins of the full data.
    * Estimates floor to long: exact-mode sketches (test scale) make them
    * exactly the distinct counts, which the green exact twin pins. */
  def segmentOverlapFromSketches(spark: SparkSession, path: String,
                                 segCol: String): DataFrame = {
    val sk = spark.read.parquet(path)
    val a = sk.select(col(segCol).as("seg_a"), col("tsketch").as("ska"))
    val b = sk.select(col(segCol).as("seg_b"), col("tsketch").as("skb"))
    a.join(broadcast(b), col("seg_a") < col("seg_b"))
      .select(col("seg_a"), col("seg_b"),
        floor(thetaEstimate(thetaIntersect(col("ska"), col("skb"))))
          .cast("long").as("n_both"),
        floor(thetaEstimate(thetaAnotB(col("ska"), col("skb"))))
          .cast("long").as("n_a_only"))
  }
}
