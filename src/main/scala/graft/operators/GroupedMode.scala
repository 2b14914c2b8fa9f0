package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Grouped mode / argmax-by-frequency — the reference's "majority vote"
  * knowledge extraction (SURVEY §2.4 A2+A3, ref `src/batch_train.py:126-146`):
  * per group, pick the value combination that occurs most often.
  *
  * The reference's pandas `Counter.most_common(1)` breaks ties by insertion
  * order, which has no distributed equivalent; this operator breaks ties
  * deterministically by the natural ordering of the value columns (documented
  * semantic delta, pinned by tests).
  *
  * Scale shape: one partial+final hash aggregation on (group, value) — the
  * map-side combine collapses the vote stream before any shuffle — then a
  * window on the group key alone. Because the window input is already
  * one-row-per-candidate (not per-vote), the second shuffle moves only the
  * distinct candidate set, which is orders of magnitude smaller than the
  * input at corpus scale.
  */
object GroupedMode {

  /** Per `groupCols`, the most frequent `valueCols` combination and its
    * frequency (ties → smallest value combination). Output columns:
    * groupCols ++ valueCols ++ frequency. */
  def modeBy(df: DataFrame, groupCols: Seq[String], valueCols: Seq[String],
             freqName: String = "frequency"): DataFrame = {
    val votes = df.groupBy((groupCols ++ valueCols).map(col): _*)
      .agg(count(lit(1)).as(freqName))
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col(freqName).desc +: valueCols.map(col(_).asc): _*)
    votes.withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1).drop("_rn")
  }
}
