package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-inference scoring: apply a trained linear (logistic-margin)
  * quality classifier to every document — the "model-based quality
  * filter" stage of an LLM data pipeline (a fastText/logreg classifier
  * scoring web documents, keep-if-above-threshold).
  *
  * Spark-first shape: the model is TINY (a weight per feature) and the
  * corpus is huge, so weights are baked into the plan as literals — no
  * join, no UDF, no broadcast variable plumbing; featurization and the
  * dot product are pure `Column` arithmetic that stays inside one
  * whole-stage-codegen span over the scan. At 100 TB this is a single
  * embarrassingly-parallel projection with the filter pushed to the scan
  * output — the cheapest possible plan shape.
  *
  * Determinism/verifiability: weights are integer MILLI-units and every
  * feature is an exact integer count (chars, spaces, digits, terminal
  * punctuation, uppercase letters — each replayable in ANSI SQL via
  * length/regexp_replace deltas), so `score_milli` is exact int64
  * arithmetic with no float drift and the whole inference pass is
  * hash-oracled end to end. A float-weight model is the same plan with
  * `lit(w)` doubles; the integer form is what the correctness gate pins.
  */
object ModelScore {

  /** Feature weights in milli-units plus decision threshold. The default
    * is a hand-rolled "prose-likeness" margin: reward word structure
    * (spaces) and sentence ends, penalize digit- and shout-heavy text. */
  final case class LinearModel(bias: Long, wChars: Long, wSpaces: Long,
                               wDigits: Long, wPunct: Long, wUpper: Long,
                               thresholdMilli: Long)

  val proseModel: LinearModel =
    LinearModel(bias = 500, wChars = -1, wSpaces = 12, wDigits = -8,
      wPunct = 25, wUpper = -3, thresholdMilli = 1200)

  private def countOf(text: Column, regex: String): Column =
    (length(text) - length(regexp_replace(text, regex, ""))).cast("long")

  /** Score `textCol` with `model`; emits the exact integer feature
    * vector, `score_milli`, and the keep/drop `label`. */
  def linearQualityScore(df: DataFrame, idCol: String, textCol: String,
                         model: LinearModel = proseModel): DataFrame = {
    val text = col(textCol)
    val scored = df.select(
      col(idCol),
      length(text).cast("long").as("f_chars"),
      countOf(text, " ").as("f_spaces"),
      countOf(text, "[0-9]").as("f_digits"),
      countOf(text, "[.!?]").as("f_punct"),
      countOf(text, "[A-Z]").as("f_upper"))
    scored.withColumn("score_milli",
        lit(model.bias) +
          lit(model.wChars) * col("f_chars") +
          lit(model.wSpaces) * col("f_spaces") +
          lit(model.wDigits) * col("f_digits") +
          lit(model.wPunct) * col("f_punct") +
          lit(model.wUpper) * col("f_upper"))
      .withColumn("label",
        (col("score_milli") >= model.thresholdMilli).cast("long"))
  }
}
