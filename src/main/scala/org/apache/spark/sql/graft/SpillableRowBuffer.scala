package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.UnsafeRow
import org.apache.spark.sql.execution.ExternalAppendOnlyUnsafeRowArray
import org.apache.spark.sql.internal.SQLConf

/** Spill-capable row buffer for the sanctioned imperative per-partition
  * operators ([[graft.operators.PrefixScan]]'s grouped scan): wraps
  * Spark's own `ExternalAppendOnlyUnsafeRowArray` (the buffer WindowExec
  * uses for frames) so a buffered group segment spills to disk past the
  * window-exec thresholds instead of pinning the heap — a plain
  * `ArrayBuffer` of row copies would OOM on a giant single-partition
  * group. Lives in `org.apache.spark.sql` because the wrapped class is
  * `private[sql]`, same rationale as [[InternalRows]].
  *
  * `add` copies the row (the wrapped array's own contract), so reused
  * iterator buffers are safe to feed; the returned iterator's rows are
  * themselves reused buffers (the scan-node contract downstream). */
final class SpillableRowBuffer {
  // the same threshold wiring WindowExec's evaluator uses (the size
  // threshold doubles as the in-memory byte cap)
  private val arr = new ExternalAppendOnlyUnsafeRowArray(
    SQLConf.get.windowExecBufferInMemoryThreshold,
    SQLConf.get.windowExecBufferSpillSizeThreshold,
    SQLConf.get.windowExecBufferSpillThreshold,
    SQLConf.get.windowExecBufferSpillSizeThreshold)

  def add(row: InternalRow): Unit =
    arr.add(row.asInstanceOf[UnsafeRow])

  def iterator: Iterator[InternalRow] =
    arr.generateIterator().map(r => r: InternalRow)

  def clear(): Unit = arr.clear()
}
