package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Global sequence numbers WITHOUT a global-sort-on-one-reducer: the
  * scale-correct alternative to `row_number() OVER (ORDER BY ...)` with
  * no partition, whose single-partition window funnels the whole table
  * through one task. Here the table is RANGE-partitioned and sorted on
  * the order key (a distributed sort), then each partition's row count
  * rolls up into per-partition offsets (driver state = one long per
  * partition) and every row gets offset + local index — two passes, all
  * of them distributed. This is the `zipWithIndex` pattern; it is also
  * why `buildVocab`-style post-limit rankers are the ONLY sanctioned
  * unpartitioned windows in this codebase (they rank ≤ k rows).
  */
object Ranking {

  /** Append a 0-based `seqCol` following the total order of `orderCols`.
    * Deterministic iff `orderCols` is a unique key (ties would leave
    * peer order partition-dependent — same contract as any total-order
    * ranking). One of the genuinely imperative per-partition cases where
    * the RDD layer is the right tool (SURVEY §4). */
  def globalRowNumbers(df: DataFrame, orderCols: Seq[String],
                       seqCol: String = "seq"): DataFrame = {
    require(orderCols.nonEmpty, "at least one order column")
    require(!df.columns.contains(seqCol), s"column $seqCol already exists")
    val sorted = df
      .repartitionByRange(orderCols.map(col): _*)
      .sortWithinPartitions(orderCols.map(col): _*)
    val withSeq = sorted.rdd.zipWithIndex.map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ i)
    }
    df.sparkSession.createDataFrame(withSeq,
      sorted.schema.add(seqCol, LongType, nullable = false))
  }
}
