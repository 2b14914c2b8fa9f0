package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.Dedup
import graft.Checkpoints.PinOps

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
    dedupIngestWith(newDocs, refDir, outDir, checkpointDir, idCol, trigger,
      pairsOf = b => Dedup.ngramJaccardPairs(b, idCol, textCol, k,
        minJaccard),
      verdictOf = (kept, ref) => Dedup.incrementalVerdict(kept, ref, idCol,
        textCol, k, minJaccard))

  /** [[dedupIngest]] under the MOSS winnowing guarantee instead of
    * Jaccard: within-batch collapse over [[TextAnalysis.winnowPairs]]'
    * graph, corpus judgment via
    * [[TextAnalysis.winnowIncrementalVerdict]] — re-flowed verbatim
    * copies (whitespace/punct/case laundering) cannot slip past the
    * gate. The verdict runs UNCACHED on purpose: the kept corpus grows
    * every batch, so a memoized reference index would judge against
    * stale data (the batch API's `refKey` memo is for a FROZEN corpus
    * generation). */
  def dedupIngestWinnow(newDocs: DataFrame, refDir: String, outDir: String,
                        checkpointDir: String, idCol: String,
                        textCol: String, k: Int = 5, w: Int = 4,
                        minShared: Int = 8, maxDf: Int = 20,
                        trigger: Trigger = Trigger.AvailableNow())
      : StreamingQuery = {
    import graft.operators.TextAnalysis
    dedupIngestWith(newDocs, refDir, outDir, checkpointDir, idCol, trigger,
      // winnowPairs materializes only through leak-free lineage pins
      // (r19) — safe to call once per micro-batch for the stream's whole
      // lifetime; no CacheManager entry is ever registered
      pairsOf = b => TextAnalysis.winnowPairs(b, idCol, textCol, k, w,
        minShared, maxDf)
        .select(col("id_a"), col("id_b")),
      verdictOf = (kept, ref) => TextAnalysis.winnowIncrementalVerdict(
        kept, ref, idCol, textCol, k, w, minShared, maxDf))
  }

  /** CCNet-style QUALITY gate on arrival — the streaming twin of the
    * `pipeline_ccnet` selection step: each arriving document is scored
    * against a FROZEN reference bigram LM and kept only if its
    * per-bigram cost is at or below the reference corpus' per-language
    * head+middle cutoff ([[graft.operators.TextAnalysis
    * .perplexityCutoffsFor]]). Unlike the dedup ingest (whose reference
    * corpus GROWS every batch and must be re-read), the quality
    * reference is a fixed corpus generation — the production CCNet
    * shape: the target model is trained once and applied to the whole
    * crawl — so the model and the lang-sized cutoff table are
    * session-memoized; a micro-batch pays one scan of itself plus a
    * broadcast join. Documents in a language absent from the reference
    * are DROPPED (kept = 0, cutoff null) — the CCNet treatment of
    * unmodeled languages. Audit rows append to `outDir` as
    * (idCol, langCol, n_bigrams, mean_cost_q, cutoff_cost_q, kept,
    * batch_id); kept documents append to `keptDir`. */
  def perplexityGateIngest(newDocs: DataFrame, refDir: String,
                           outDir: String, keptDir: String,
                           checkpointDir: String, idCol: String,
                           textCol: String, langCol: String,
                           topN: Int = 200,
                           trigger: Trigger = Trigger.AvailableNow())
      : StreamingQuery = {
    import graft.operators.TextAnalysis
    newDocs.writeStream
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val spark = batch.sparkSession
        val ref = spark.read.parquet(refDir)
        val cutoffs = TextAnalysis.perplexityCutoffsFor(ref, idCol,
          textCol, langCol, topN, key = refDir)
        val judged = TextAnalysis.meanLmCost(batch, idCol, textCol, topN,
          cacheKey = Some(refDir))
          .join(batch.select(col(idCol), col(langCol)), Seq(idCol))
          .join(broadcast(cutoffs), Seq(langCol), "left_outer")
          .withColumn("kept", (col("cutoff_cost_q").isNotNull &&
            col("mean_cost_q") <= col("cutoff_cost_q")).cast("long"))
          .pin() // consumed by the audit AND the kept append
        judged.withColumn("batch_id", lit(batchId))
          .select(col(idCol), col(langCol), col("n_bigrams"),
            col("mean_cost_q"), col("cutoff_cost_q"), col("kept"),
            col("batch_id"))
          .write.mode("append").parquet(outDir)
        batch.join(judged.where(col("kept") === 1).select(col(idCol)),
            Seq(idCol))
          .write.mode("append").parquet(keptDir)
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()
  }

  /** The shared ingest body: `pairsOf` generates the within-batch
    * candidate pair graph (columns id_a, id_b), `verdictOf` judges batch
    * survivors against the kept corpus (columns new_id, n_matches,
    * dropped). */
  private def dedupIngestWith(newDocs: DataFrame, refDir: String,
                              outDir: String, checkpointDir: String,
                              idCol: String, trigger: Trigger,
                              pairsOf: DataFrame => DataFrame,
                              verdictOf: (DataFrame, DataFrame) => DataFrame)
      : StreamingQuery =
    newDocs.writeStream
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val spark = batch.sparkSession
        // (1) within-batch collapse: near-dup clusters -> min-id survivor
        // (unpaired docs are their own cluster and survive trivially)
        val pairs = pairsOf(batch)
        val losers = Dedup.connectedComponents(pairs, "id_a", "id_b")
          .where(col("doc") =!= col("cluster"))
          .select(col("doc").as(idCol))
        val batchKept = batch.join(losers, Seq(idCol), "left_anti")
          .pin() // consumed by the verdict AND the append
        // (2) judge the batch survivors against the kept corpus
        val ref = spark.read.parquet(refDir)
        val verdict = verdictOf(batchKept, ref).pin()
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

  /** Streaming corpus-mix monitor — the on-arrival form of
    * [[graft.operators.Sampling.mixGap]]: per-group (doc count, token
    * mass) state is maintained across micro-batches in a parquet table
    * at `stateDir`, and after each batch the full mix-gap report
    * (actual vs T=2 target share, ppm) recomputes from the GROUP-SIZED
    * state and appends to `outDir` with the batch id — the live
    * dashboard that says when the arriving crawl has drifted the corpus
    * off its target language mix.
    *
    * `newRows` must carry (`groupCol`, `nTokensCol`) — project tokens
    * upstream. Scale shape: a micro-batch pays ONE aggregation of
    * itself plus a merge with the |groups|-row state; no corpus data is
    * ever re-read. The merge is a SUM, so replay safety uses the
    * applied-batch watermark (`_batch` marker — the [[SketchStreams]]
    * CMS discipline); crash safety is the snapshot protocol's. */
  def mixGapMonitor(newRows: DataFrame, stateDir: String, outDir: String,
                    backupRoot: String, checkpointDir: String,
                    groupCol: String, nTokensCol: String,
                    trigger: Trigger = Trigger.AvailableNow())
      : StreamingQuery =
    newRows.writeStream
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        applyMixBatch(batch.toDF(), batchId, stateDir, outDir, backupRoot,
          groupCol, nTokensCol)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()

  /** One mix-monitor micro-batch — separated so replay idempotence is
    * directly testable (the `applyCmsBatch` pattern). A replayed batch
    * id is a no-op: the state merge is a sum, so the applied-batch
    * watermark is load-bearing, not belt-and-braces. */
  def applyMixBatch(batch: DataFrame, batchId: Long, stateDir: String,
                    outDir: String, backupRoot: String,
                    groupCol: String, nTokensCol: String): Unit = {
    import graft.operators.Sampling
    val spark = batch.sparkSession
    graft.sources.Sinks.recover(spark, stateDir)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val exists = fs.exists(new org.apache.hadoop.fs.Path(stateDir))
    val prev = if (exists) Some(spark.read.parquet(stateDir)) else None
    val lastApplied = prev match {
      case Some(p) if p.columns.contains("_batch") =>
        p.select(max(col("_batch"))).first() match {
          case r if r.isNullAt(0) => -1L
          case r => r.getLong(0)
        }
      case _ => -1L
    }
    if (batchId > lastApplied) {
      val batchGroups = batch
        .groupBy(col(groupCol))
        .agg(count(lit(1)).as("n_docs"),
          sum(col(nTokensCol)).as("sum_tokens"))
      val union = prev match {
        case Some(p) =>
          p.select(col(groupCol), col("n_docs"), col("sum_tokens"))
            .unionByName(batchGroups)
        case None => batchGroups
      }
      val merged = union
        .groupBy(col(groupCol))
        .agg(sum(col("n_docs")).as("n_docs"),
          sum(col("sum_tokens")).as("sum_tokens"))
        .withColumn("_batch", lit(batchId))
        .pin() // the overwrite consumes it, then the report reads it
      graft.sources.Sinks.snapshotOverwrite(spark, merged, stateDir,
        backupRoot)
      Sampling.mixGapFromGroups(merged.drop("_batch"), groupCol)
        .withColumn("batch_id", lit(batchId))
        .write.mode("append").parquet(outDir)
    }
  }
}
