package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, JoinedRow}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.InternalRows
import org.apache.spark.sql.types.LongType

/** Distributed prefix scan: running aggregates in a GLOBAL total order
  * without a single-partition window. The classic two-phase carry-in
  * algorithm (Blelloch's scan, the shape every parallel-prefix library
  * uses): range-partition + sort on the order key (a distributed sort),
  * aggregate each partition independently, roll the per-partition
  * aggregates into exclusive carry-ins on the driver (one long per
  * partition — bounded state), broadcast them, and have a second pass
  * emit each row's running value as carry-in ⊕ local prefix. Both
  * passes are fully distributed; driver state never exceeds the
  * partition count.
  *
  * This is the same two-job pattern as [[Ranking.globalRowNumbers]]
  * (`zipWithIndex` is exactly a prefix-SUM of ones) generalized to any
  * associative combine — the sanctioned answer whenever an analytic
  * needs `agg(...) OVER (ORDER BY ... ROWS UNBOUNDED PRECEDING)` with
  * no partition: interval sweeps (peak concurrency), skyline
  * dominance (running max over a sorted dimension), global cumulative
  * totals. A plain unpartitioned window funnels the whole table
  * through one task and dies at scale; this does not.
  */
object PrefixScan {

  /** An associative combine over longs with identity `neutral`. */
  sealed trait Op {
    def neutral: Long
    def combine(a: Long, b: Long): Long
  }
  /** Running total. Overflow fails loudly (`Math.addExact`): a global
    * running sum at 100 TB can exceed int64, and the codebase's
    * integer-exactness convention (decimal(38,0) elsewhere) forbids a
    * silent wrap. Pre-scale cents to a coarser unit upstream if the
    * total can exceed ~9.2e18. */
  case object Sum extends Op {
    val neutral = 0L
    def combine(a: Long, b: Long): Long = Math.addExact(a, b)
  }
  /** Running maximum (identity = Long.MinValue). */
  case object Max extends Op {
    val neutral = Long.MinValue
    def combine(a: Long, b: Long): Long = math.max(a, b)
  }

  /** Append exclusive (`exclCol`, the running value BEFORE this row) and
    * inclusive (`inclCol`, after) prefix aggregates of LONG `valueCol`
    * in the total order of `orderCols`.
    *
    * Deterministic iff `orderCols` is a total order (same contract as
    * [[Ranking.globalRowNumbers]]); peers under a partial order would
    * get partition-dependent intermediate values. The first row's
    * `exclCol` is `op.neutral`. Like `zipWithIndex`, the sorted lineage
    * is computed twice (once for the per-partition aggregates, once for
    * the emit pass) rather than pinning executor memory with a persist —
    * the range partitioner is built once and reused, so both jobs see
    * identical partition boundaries and order. */
  def runningLong(df: DataFrame, orderCols: Seq[String], valueCol: String,
                  op: Op, exclCol: String = "run_excl",
                  inclCol: String = "run_incl"): DataFrame = {
    require(orderCols.nonEmpty, "at least one order column")
    require(!df.columns.contains(exclCol) && !df.columns.contains(inclCol),
      s"output columns $exclCol/$inclCol already exist")
    val sorted = df
      .repartitionByRange(orderCols.map(col): _*)
      .sortWithinPartitions(orderCols.map(col): _*)
    // one shuffled, sorted RDD shared by both jobs: shuffle map outputs
    // are reused so the range shuffle is not redone, but the reduce-side
    // SortExec re-runs in the emit pass (deterministic given the total
    // order) — cheaper than persisting the sorted lineage at scale.
    // InternalRow bridge (org.apache.spark.sql.graft.InternalRows): both
    // passes only read one long per row, so the old `df.rdd` hop paid an
    // external-row decode of EVERY column twice, plus a full re-encode
    // on emit, for nothing
    val rdd = InternalRows.toRdd(sorted)
    val idx = sorted.schema.fieldIndex(valueCol)
    require(sorted.schema(idx).dataType == LongType,
      s"$valueCol must be LONG (cast upstream)")
    // nulls are a CONTRACT violation checked at runtime with a clear
    // error, not a schema-nullability require: parquet-sourced columns
    // are conservatively nullable even when null-free, and rejecting
    // them statically would force semantically-no-op coalesces on every
    // caller. An actual null fails loudly here instead of as an NPE.
    val vCol = valueCol
    def valueAt(r: InternalRow): Long = {
      if (r.isNullAt(idx)) throw new IllegalArgumentException(
        s"$vCol contains NULL — filter or coalesce upstream of PrefixScan")
      r.getLong(idx)
    }
    val partAggs = rdd
      .mapPartitionsWithIndex { (i, it) =>
        var acc = op.neutral
        it.foreach(r => acc = op.combine(acc, valueAt(r)))
        Iterator.single((i, acc))
      }
      .collect().sortBy(_._1).map(_._2)
    val carries = partAggs.scanLeft(op.neutral)(op.combine).dropRight(1)
    val bc = df.sparkSession.sparkContext.broadcast(carries)
    val out = rdd.mapPartitionsWithIndex { (i, it) =>
      var acc = bc.value(i)
      // reused buffers, per the scan-node row contract (the downstream
      // scan projects each row to unsafe before any buffering)
      val extra = new GenericInternalRow(2)
      val joined = new JoinedRow
      it.map { r =>
        val excl = acc
        acc = op.combine(acc, valueAt(r))
        extra.update(0, excl)
        extra.update(1, acc)
        joined(r, extra): InternalRow
      }
    }
    InternalRows.toDataFrame(df, out,
      sorted.schema
        .add(exclCol, LongType, nullable = false)
        .add(inclCol, LongType, nullable = false))
  }
}
