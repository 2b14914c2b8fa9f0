package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Small-input fan-out for expensive per-row kernels.
  *
  * Parquet cannot split below a row group, so a source written as one
  * file with one row group plans as ONE scan task no matter how many
  * cores the session has — and a per-row battery (BPE replace chain,
  * language-profile scoring, the curation-funnel signals) then runs the
  * whole corpus on a single thread. That is a DATA-LAYOUT artifact, not
  * an operator property: at 100 TB the same scan yields thousands of
  * splits and the battery parallelizes for free.
  *
  * [[maybe]] closes the gap conditionally: when the physical scan's
  * split count cannot feed even half the session's default parallelism,
  * redistribute rows by a key hash before the kernel; otherwise return
  * the input untouched — on real multi-split data the condition is
  * false and the op keeps its zero-exchange filter-pass shape. The
  * repartition is hash-by-column (deterministic, no RoundRobin sort
  * pass), and the shuffle it introduces moves only the kernel's input
  * columns — for the ops that use this, orders of magnitude cheaper
  * than the single-threaded compute it amortizes (measured at sf1:
  * `text_funnel` 15.9 s -> ~1.5 s on 32 cores).
  *
  * Streaming frames pass through untouched: split-count introspection
  * would throw on an unstarted streaming plan, and the streaming ingest
  * paths parallelize per micro-batch source instead.
  */
object Fanout {

  /** `df` repartitioned to the session's default parallelism by
    * `hash(byCol)` when its scan cannot feed half the cores; `df`
    * unchanged otherwise (and always for streaming frames). */
  def maybe(df: DataFrame, byCol: String): DataFrame = {
    if (df.isStreaming) return df
    val target = df.sparkSession.sparkContext.defaultParallelism
    // physical split count of the frame's plan — no job runs; for a
    // parquet scan this is the FilePartition count after packing
    val parts = df.rdd.getNumPartitions
    if (parts * 2 <= target) df.repartition(target, col(byCol)) else df
  }
}
