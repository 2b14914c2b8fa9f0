package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of (point-in-time) join: for each left row, attach the most
  * recent right row with `right.ts <= left.ts` within the same key — the
  * standard temporal-enrichment operator (trades joined to quotes, events
  * to the last prior state change).
  *
  * Spark has no built-in as-of join; the scalable formulation is
  * union-and-fill, NOT a range join: tag both sides, union, window-sort
  * within the key by (ts, side) with right rows ordering before left rows
  * at equal timestamps (so an exactly-equal timestamp matches), forward
  * fill the right payload, keep left rows. One shuffle on the key, frames
  * bounded per key, no time-range cross product at any point — survives
  * arbitrarily long histories per key.
  */
object AsofJoin {

  /** Left as-of-backward join. Column names of `left` and `right` must be
    * disjoint apart from `key`; every non-key right column (including
    * `rightTs`) is attached, null where no right row precedes. */
  def asofBackward(left: DataFrame, right: DataFrame, key: String,
                   leftTs: String, rightTs: String): DataFrame = {
    val rightPayload = right.columns.filterNot(_ == key).toSeq
    val leftCols = left.columns.toSeq
    val overlap = leftCols.toSet.intersect(rightPayload.toSet)
    require(overlap.isEmpty, s"column collision: $overlap")

    val rightTypes = right.schema.map(f => f.name -> f.dataType).toMap
    val leftTypes = left.schema.map(f => f.name -> f.dataType).toMap

    val lFull = rightPayload.foldLeft(
      left.withColumn("_ts", col(leftTs)).withColumn("_side", lit(1)))(
      (df, c) => df.withColumn(c, lit(null).cast(rightTypes(c))))
    val rFull = leftCols.filterNot(_ == key).foldLeft(
      right.withColumn("_ts", col(rightTs)).withColumn("_side", lit(0)))(
      (df, c) => df.withColumn(c, lit(null).cast(leftTypes(c))))

    val unioned = lFull.select((leftCols ++ rightPayload ++ Seq("_ts", "_side"))
        .map(col): _*)
      .unionByName(rFull.select(
        (leftCols ++ rightPayload ++ Seq("_ts", "_side")).map(col): _*))

    val w = Window.partitionBy(key).orderBy(col("_ts").asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = rightPayload.foldLeft(unioned)((df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w)))
    filled.where(col("_side") === 1).drop("_ts", "_side")
  }
}
