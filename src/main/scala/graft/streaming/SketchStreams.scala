package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.Sketches

/** Streaming maintenance of the AT-REST frequency-sketch tables: each
  * micro-batch builds its OWN per-group CMS sketches (one aggregate over
  * the batch only) and merges them into the persisted table through the
  * crash-safe snapshot protocol — the fact stream is read once, at
  * arrival; every later frequency question is kilobyte merges.
  *
  * CMS merge is a counter SUM, not idempotent — a replayed micro-batch
  * would double-count (unlike the bitmap tables' OR, which is idempotent
  * by algebra) — and foreachBatch is at-least-once, so the applied-batch
  * watermark rides the table itself (`_batch`, the `maintainAggSnapshot`
  * marker discipline) and replays of an already-applied batch are
  * no-ops. Crash safety comes from [[graft.sources.Sinks.snapshotOverwrite]]:
  * the merged table stages first (it READS the current target), then
  * swaps by renames with recover-on-open.
  *
  * The correctness anchor is the CMS exact-merge law: applying batches
  * B₁…Bₙ yields counter-for-counter the same sketches as one build over
  * B₁∪…∪Bₙ — pinned byte-exactly in `SketchStreamsSpec`. */
object SketchStreams {

  /** Start the sketch-maintenance stream over `newRows`. */
  def cmsIngest(newRows: DataFrame, target: String, backupRoot: String,
                checkpoint: String, groupCols: Seq[String], keyCol: String,
                depth: Int = 4, width: Int = 2048,
                trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    newRows.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyCmsBatch(batch, batchId, target, backupRoot, groupCols,
          keyCol, depth, width)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()

  /** Streaming maintenance of the AT-REST exact-distinct BITMAP tables —
    * the idempotent sibling of [[cmsIngest]]: bitmap merge is a set OR,
    * so a replayed micro-batch converges to the SAME table by algebra
    * and no applied-batch watermark is needed at all. The contrast is
    * the point: pick the marker discipline when the merge is a sum
    * (CMS), skip it when the merge is idempotent (bitmap/HLL) — replay
    * safety then costs nothing. Crash safety is still the snapshot
    * protocol's. */
  def bitmapIngest(newRows: DataFrame, target: String, backupRoot: String,
                   checkpoint: String, groupCols: Seq[String],
                   keyCol: String,
                   trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    newRows.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBitmapBatch(batch, target, backupRoot, groupCols, keyCol)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()

  /** Streaming maintenance of the AT-REST HLL++ register tables
    * (`Sketches.hllppSketchTableFor`'s artifact, maintained
    * incrementally): register merge is a slot-wise MAX — idempotent like
    * the bitmap OR, so no applied-batch watermark is needed — and the
    * merge law is BYTE-EXACT (order-insensitive slot maxes), so the
    * streamed table is byte-identical to a one-shot whole-input build,
    * pinned in `SketchStreamsSpec`. The r17 point: this is the one
    * ESTIMATING sketch family whose streaming maintenance needs neither
    * the marker discipline (idempotent) nor an estimate-level tolerance
    * (byte-exact state, DuckDB-replayable estimates via graft.HllSql). */
  def hllppIngest(newRows: DataFrame, target: String, backupRoot: String,
                  checkpoint: String, groupCols: Seq[String],
                  keyCol: String, rsd: Double = 0.02,
                  trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    newRows.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyHllppBatch(batch, target, backupRoot, groupCols, keyCol, rsd)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()

  /** One HLL++ micro-batch — max-merge the batch's own per-group
    * registers into the persisted table (replay-idempotent by algebra:
    * max(a, a) = a). */
  def applyHllppBatch(batch: DataFrame, target: String, backupRoot: String,
                      groupCols: Seq[String], keyCol: String,
                      rsd: Double = 0.02): Unit =
    applyIdempotentSketchBatch(batch, target, backupRoot, groupCols,
      sketchCol = "sketch",
      buildAgg = Sketches.hllppSketchAgg(col(keyCol), rsd),
      mergeAgg = sk => Sketches.hllppMergeAgg(sk, rsd))

  /** The shared recover / read / union / merge / snapshot protocol of
    * the two IDEMPOTENT sketch families (bitmap OR, HLL++ register max)
    * — one copy so a crash-safety fix can never reach one family and
    * miss the other (r17 review). The CMS path stays separate: its sum
    * merge needs the applied-batch watermark this protocol deliberately
    * omits. */
  private def applyIdempotentSketchBatch(
      batch: DataFrame, target: String, backupRoot: String,
      groupCols: Seq[String], sketchCol: String,
      buildAgg: org.apache.spark.sql.Column,
      mergeAgg: org.apache.spark.sql.Column => org.apache.spark.sql.Column)
    : Unit = {
    val spark = batch.sparkSession
    graft.sources.Sinks.recover(spark, target)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val exists = fs.exists(new org.apache.hadoop.fs.Path(target))
    val batchSk = batch.groupBy(groupCols.map(col): _*)
      .agg(buildAgg.as(sketchCol))
    val union =
      if (exists)
        spark.read.parquet(target)
          .select((groupCols.map(col) :+ col(sketchCol)): _*)
          .unionByName(batchSk)
      else batchSk
    val merged = union
      .groupBy(groupCols.map(col): _*)
      .agg(mergeAgg(col(sketchCol)).as(sketchCol))
    graft.sources.Sinks.snapshotOverwrite(spark, merged, target, backupRoot)
  }

  /** One bitmap micro-batch — OR the batch's own per-group bitmaps into
    * the persisted table. Applying the same batch twice is a set-algebra
    * no-op (A ∪ B ∪ B = A ∪ B), pinned count-exactly in
    * `SketchStreamsSpec`. */
  def applyBitmapBatch(batch: DataFrame, target: String, backupRoot: String,
                       groupCols: Seq[String], keyCol: String): Unit =
    applyIdempotentSketchBatch(batch, target, backupRoot, groupCols,
      sketchCol = "bm",
      buildAgg = Sketches.bitmapAgg(col(keyCol)),
      mergeAgg = Sketches.bitmapOrAgg)

  /** One micro-batch — separated so replay idempotence is directly
    * testable (the `applyAggBatch` pattern). */
  def applyCmsBatch(batch: DataFrame, batchId: Long, target: String,
                    backupRoot: String, groupCols: Seq[String],
                    keyCol: String, depth: Int, width: Int): Unit = {
    val spark = batch.sparkSession
    graft.sources.Sinks.recover(spark, target)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val exists = fs.exists(new org.apache.hadoop.fs.Path(target))
    val prev = if (exists) Some(spark.read.parquet(target)) else None
    val lastApplied = prev match {
      case Some(p) if p.columns.contains("_batch") =>
        p.select(max(col("_batch"))).first() match {
          case r if r.isNullAt(0) => -1L
          case r => r.getLong(0)
        }
      case _ => -1L
    }
    if (batchId > lastApplied) {
      val batchSk = Sketches
        .cmsTable(batch, groupCols, keyCol, depth, width)
      val union = prev match {
        case Some(p) =>
          p.select((groupCols.map(col) :+ col("fsketch")): _*)
            .unionByName(batchSk)
        case None => batchSk
      }
      val merged = union
        .groupBy(groupCols.map(col): _*)
        .agg(Sketches.cmsMergeAgg(col("fsketch"), depth, width)
          .as("fsketch"))
        .withColumn("_batch", lit(batchId))
      graft.sources.Sinks.snapshotOverwrite(spark, merged, target,
        backupRoot)
    }
  }

  /** Read the maintained sketch table (marker column dropped). */
  def readSketchTable(spark: org.apache.spark.sql.SparkSession,
                      target: String): DataFrame = {
    graft.sources.Sinks.recover(spark, target)
    spark.read.parquet(target).drop("_batch")
  }
}
