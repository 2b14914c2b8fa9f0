package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming maintenance of a keyed ROW table from a CDC change stream —
  * the "MERGE INTO the silver table" pattern: each micro-batch of
  * (key, ts, op, payload…) changes reduces to its per-key LATEST change,
  * then merges last-write-wins into the persisted snapshot; upserts
  * replace the row, deletes tombstone it.
  *
  * Two design points carry the correctness at scale:
  *
  *  - '''LWW merge is idempotent by algebra''' — max over a total order
  *    absorbs repeats (`max(a, a) = a`) — so, like the bitmap tables and
  *    unlike the CMS counter sums, a replayed at-least-once micro-batch
  *    converges to the SAME table and no applied-batch marker is needed.
  *    The total order is `(ts, op-rank, payload)`: ts decides, a delete
  *    outranks an upsert at the same ts, payload breaks exact ts+op ties
  *    deterministically.
  *  - '''Deletes persist as TOMBSTONES''' (`_deleted = true` rows kept in
  *    the table, filtered on read). Dropping the row instead would let a
  *    STALE update — arriving out of order in a later batch with
  *    `ts < delete.ts` — resurrect the key, because the evidence that it
  *    lost the race would be gone. The tombstone IS that evidence; it can
  *    only be compacted away once upstream guarantees no older change can
  *    still arrive (the same retention contract as Delta/Hudi/Iceberg
  *    merge-on-read deletes, cf. `Sinks` S9 + L55 `s_mor_deletes`).
  *
  * Crash safety is [[graft.sources.Sinks.snapshotOverwrite]]'s staged
  * rename protocol (the merge READS the current target, so stage-first
  * ordering is what makes a mid-write crash recoverable). Scale shape:
  * per batch, one hash-agg over the BATCH (tiny) + one hash-agg over
  * table ∪ batch — a full-table rewrite per micro-batch, which is the
  * copy-on-write trade: right for dimension/entity tables maintained
  * from a change feed; a 100 TB fact table would take the MOR delete
  * path instead of this one. */
object ChangeCaptureStreams {

  /** Start the upsert-maintenance stream over `changes`. `opCol` values:
    * `deleteOp` tombstones the key, anything else upserts the payload. */
  def upsertIngest(changes: DataFrame, target: String, backupRoot: String,
                   checkpoint: String, keyCol: String, tsCol: String,
                   opCol: String, deleteOp: String = "D",
                   trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    changes.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyUpsertBatch(batch, target, backupRoot, keyCol, tsCol, opCol,
          deleteOp)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()

  /** One micro-batch — separated so replay idempotence and out-of-order
    * laws are directly testable (the `applyAggBatch` pattern). */
  def applyUpsertBatch(batch: DataFrame, target: String, backupRoot: String,
                       keyCol: String, tsCol: String, opCol: String,
                       deleteOp: String = "D"): Unit = {
    if (batch.isEmpty) return // nothing to merge; skip the table rewrite
    val spark = batch.sparkSession
    graft.sources.Sinks.recover(spark, target)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val exists = fs.exists(new org.apache.hadoop.fs.Path(target))
    val payloadCols = batch.columns.toSeq
      .filterNot(c => c == keyCol || c == tsCol || c == opCol)
    val asRows = batch.select(
      (col(keyCol) +: col(tsCol).as("_ts") +:
        (col(opCol) === deleteOp).as("_deleted") +:
        payloadCols.map(col)): _*)
    val union =
      if (exists) spark.read.parquet(target).unionByName(asRows)
      else asRows
    graft.sources.Sinks.snapshotOverwrite(spark,
      lwwLatest(union, keyCol, payloadCols), target, backupRoot)
  }

  /** Last-write-wins reduction to one row per key: a single max-struct
    * aggregation (map-side partial max, no window sort) over the
    * `(ts, delete-outranks-upsert, payload…)` total order. */
  private def lwwLatest(rows: DataFrame, keyCol: String,
                        payloadCols: Seq[String]): DataFrame = {
    val order: Seq[Column] = col("_ts") +:
      col("_deleted").cast("int").as("_rank") +: payloadCols.map(col)
    rows.groupBy(col(keyCol))
      .agg(max(struct(order: _*)).as("_w"))
      .select(
        (col(keyCol) +: col("_w._ts").as("_ts") +:
          (col("_w._rank") === 1).as("_deleted") +:
          payloadCols.map(c => col(s"_w.$c").as(c))): _*)
  }

  /** Read the maintained table: live rows only, bookkeeping dropped. */
  def readSnapshot(spark: SparkSession, target: String): DataFrame = {
    graft.sources.Sinks.recover(spark, target)
    spark.read.parquet(target)
      .where(!col("_deleted")).drop("_deleted", "_ts")
  }

  /** The maintained table with tombstones and versions visible (for the
    * spec's laws and for compaction tooling). */
  def readWithTombstones(spark: SparkSession, target: String): DataFrame = {
    graft.sources.Sinks.recover(spark, target)
    spark.read.parquet(target)
  }
}
