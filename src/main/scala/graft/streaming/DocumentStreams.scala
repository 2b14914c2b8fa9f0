package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.Dedup

/** Streaming document ingestion for a continuously growing training
  * corpus: dedup-on-arrival. Each micro-batch is (1) collapsed
  * internally — near-dup clusters keep their min-id survivor, so two
  * copies arriving together can't both pass — then (2) judged against
  * the KEPT corpus on disk with the asymmetric cross-corpus pass
  * ([[Dedup.incrementalVerdict]]), and (3) the survivors are appended to
  * that corpus, so every later batch is judged against everything kept
  * so far. The per-document verdicts (with batch id) append to an audit
  * relation.
  *
  * Scale shape: the kept corpus is the big side and is only ever
  * appended; the per-batch work is bounded by the batch (within-batch
  * PPJoin + one asymmetric probe of the corpus). At 100 TB the re-read
  * of the corpus per batch becomes a persisted shingle index — the
  * `...FromGroups` family is the hook — the dataflow here stays the
  * same. foreachBatch is at-least-once: a replayed batch would re-append
  * — downstream readers dedup on `batch_id`, or wire the marker trick of
  * `Sinks`' exactly-once drain when the sink must be exact. */
object DocumentStreams {

  /** Start the ingestion stream. `refDir` must exist (seed it with the
    * initial kept corpus — possibly empty — sharing `newDocs`' schema);
    * the audit appends to `outDir` as (new_id, n_matches, dropped,
    * reason, batch_id), one row per arriving document: reason is
    * `batch_dup` (lost the within-batch collapse), `corpus_dup` (matched
    * the kept corpus) or `kept`. */
  def dedupIngest(newDocs: DataFrame, refDir: String, outDir: String,
                  checkpointDir: String, idCol: String, textCol: String,
                  k: Int, minJaccard: Double,
                  trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    newDocs.writeStream
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val spark = batch.sparkSession
        // (1) within-batch collapse: near-dup clusters -> min-id survivor
        // (unpaired docs are their own cluster and survive trivially)
        val pairs = Dedup.ngramJaccardPairs(batch, idCol, textCol, k,
          minJaccard)
        val losers = Dedup.connectedComponents(pairs, "id_a", "id_b")
          .where(col("doc") =!= col("cluster"))
          .select(col("doc").as(idCol))
        val batchKept = batch.join(losers, Seq(idCol), "left_anti")
          .localCheckpoint() // consumed by the verdict AND the append
        // (2) judge the batch survivors against the kept corpus
        val ref = spark.read.parquet(refDir)
        val verdict = Dedup.incrementalVerdict(batchKept, ref, idCol,
          textCol, k, minJaccard).localCheckpoint()
        verdict
          .withColumn("reason", when(col("dropped") === 1, "corpus_dup")
            .otherwise("kept"))
          .unionByName(losers.select(col(idCol).as("new_id"),
            lit(0L).as("n_matches"), lit(1L).as("dropped"),
            lit("batch_dup").as("reason")))
          .withColumn("batch_id", lit(batchId))
          .write.mode("append").parquet(outDir)
        // (3) survivors join the corpus for every later batch
        batchKept
          .join(verdict.where(col("dropped") === 0)
            .select(col("new_id").as(idCol)), Seq(idCol))
          .select(ref.columns.map(col): _*)
          .write.mode("append").parquet(refDir)
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()
}
