package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.sources.Generations

/** Streaming maintenance of an atomically-published GENERATION SET —
  * the §2.9 closure of [[graft.sources.Generations]]: each micro-batch
  * folds the arriving (group, value) rows into the previous generation's
  * aggregate state and publishes ALL derived tables (the per-group
  * aggregate, the corpus totals, the applied-batch meta) as ONE new
  * generation, committed by a single version-marker rename. A reader
  * resolving the pointer therefore sees `by_group` and `totals` from the
  * SAME fold — never table A of batch i next to table B of batch i−1 —
  * which is the streaming form of the reference's one-transaction-per-run
  * publish (ref `src/batch_train.py:154-176`; the per-table
  * [[graft.sources.Sinks.maintainAggSnapshot]] gives crash safety but
  * not this cross-table guarantee).
  *
  * Exactly-once across foreachBatch replays: the generation's `meta`
  * table carries the applied micro-batch id and rides the atomic marker
  * commit WITH the data (they cannot tear), so a replayed batch id is a
  * no-op — the `maintainAggSnapshot` `_batch` discipline, lifted from a
  * column on one table to a table in the generation. Crash safety is
  * [[Generations.publish]]'s: everything stages invisibly; the marker
  * rename is the only commit point; orphans sweep on the next batch.
  *
  * Scale shape: a micro-batch pays one aggregation of ITSELF plus a
  * merge with the group-cardinality-sized previous state — no corpus
  * re-read ever; the publish itself is O(1) metadata on top of the
  * state write. State growth is group cardinality, the same bound as
  * the snapshot it generalizes. */
object GenerationStreams {

  /** Start the generation-maintenance stream over `newRows`. */
  def generationIngest(newRows: DataFrame, root: String, checkpoint: String,
                       groupCol: String, valueCol: String,
                       trigger: Trigger = Trigger.AvailableNow())
      : StreamingQuery =
    newRows.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyGenerationBatch(batch, batchId, root, groupCol, valueCol)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()

  /** One micro-batch — separated so replay idempotence and the
    * cross-table consistency law are directly testable. */
  def applyGenerationBatch(batch: DataFrame, batchId: Long, root: String,
                           groupCol: String, valueCol: String): Unit = {
    val spark = batch.sparkSession
    val cur = Generations.currentVersion(spark, root)
    val lastApplied = cur.map(v =>
      Generations.readTableAt(spark, root, v, "meta")
        .select(max(col("batch_id"))).first().getLong(0)).getOrElse(-1L)
    if (batchId <= lastApplied) return
    val batchAgg = batch
      .groupBy(col(groupCol).as("g"))
      .agg(count(lit(1)).as("n"), sum(col(valueCol).cast("long")).as("s"))
    val merged = cur match {
      case None => batchAgg
      case Some(v) =>
        Generations.readTableAt(spark, root, v, "by_group")
          .unionByName(batchAgg)
          .groupBy(col("g"))
          .agg(sum(col("n")).as("n"), sum(col("s")).as("s"))
    }
    // eager pin: the fold feeds BOTH derived tables — they must publish
    // from the SAME materialized state (group-cardinality-sized), and
    // the publish below reads while the current generation still exists
    val m = merged.localCheckpoint()
    val totals = m.agg(count(lit(1)).as("n_groups"),
      sum(col("n")).as("n_rows"), sum(col("s")).as("s_total"))
    val meta = spark.range(1).select(lit(batchId).as("batch_id"))
    Generations.publish(spark,
      Map("by_group" -> m, "totals" -> totals, "meta" -> meta), root)
  }

  /** Per-JVM registry of folded generation chains (the
    * [[graft.sources.Generations.generationChainFor]] contract): applies
    * the given batches in order through [[applyGenerationBatch]] and
    * returns the root — the batch-mode drive of the exact foreachBatch
    * body, for the oracled registry read. */
  private val chains = new graft.SessionMemo[String, String]()

  def foldedGenerationsFor(spark: org.apache.spark.sql.SparkSession,
                           batches: Seq[DataFrame], groupCol: String,
                           valueCol: String, key: String,
                           baseDir: String =
                             sys.props("java.io.tmpdir") + "/graft-genstream")
      : String = {
    require(batches.nonEmpty, "at least one batch")
    chains.getOrCompute(spark, key) {
      val root = graft.TmpArtifacts.under(baseDir, key)
      org.apache.hadoop.fs.FileSystem
        .get(spark.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path(root), true)
      batches.zipWithIndex.foreach { case (b, i) =>
        applyGenerationBatch(b, i.toLong, root, groupCol, valueCol)
      }
      root
    }
  }
}
