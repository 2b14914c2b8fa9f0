package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.classic
import org.apache.spark.sql.types.StructType

/** The `InternalRow` bridge for the sanctioned imperative per-partition
  * operators ([[graft.operators.Ranking.globalRowNumbers]],
  * [[graft.operators.PrefixScan]]): `df.rdd` deserializes every row to an
  * external `Row` (per-field boxing + converters) and
  * `createDataFrame(rowRdd, schema)` serializes them all back — two full
  * codec passes that exist only because the RDD hop crosses the public
  * API boundary. Staying on `queryExecution.toRdd`'s `InternalRow`s
  * skips both (same pattern as [[TopKPerKeyExec]]); this object lives in
  * `org.apache.spark.sql` so it can reach the `private[sql]`
  * `internalCreateDataFrame`.
  *
  * Contract mirrored from Spark's own scan nodes: iterator rows may be
  * REUSED buffers — a consumer that buffers rows must `copy()`, and
  * produced rows are projected to unsafe by the downstream scan before
  * any buffering, so emitting a reused `JoinedRow`/`GenericInternalRow`
  * is safe exactly like in `RDDScanExec`. */
object InternalRows {

  /** The analyzed plan's `RDD[InternalRow]` — no external-row decode. */
  def toRdd(df: DataFrame): RDD[InternalRow] = df.queryExecution.toRdd

  /** Wrap an `RDD[InternalRow]` as a DataFrame without an external-row
    * encode pass. Caller guarantees rows match `schema`. */
  def toDataFrame(df: DataFrame, rdd: RDD[InternalRow],
                  schema: StructType): DataFrame =
    df.sparkSession.asInstanceOf[classic.SparkSession]
      .internalCreateDataFrame(rdd, schema)
}
