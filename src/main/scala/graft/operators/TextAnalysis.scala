package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions._

/** Text-corpus analysis operators: language identification (marker-word
  * heuristic), quality scoring, token counting, and content fingerprinting.
  * All row-local expressions — the whole surface runs scan-side with zero
  * shuffles, which is what makes it viable as a 100 TB filter pass.
  */
object TextAnalysis {

  /** Marker stopwords per language. Tiny fixed lists — this is the n-gram /
    * stopword-hit heuristic, not a trained model; deterministic and
    * SQL-expressible so the oracle can replay it. */
  val markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "is", "with"),
    "es" -> Seq("el", "la", "de", "es", "con"),
    "de" -> Seq("der", "die", "und", "ist", "mit"),
    "fr" -> Seq("le", "la", "et", "est", "avec"))

  private def score(toks: Column, words: Seq[String]): Column =
    words.map(w => when(array_contains(toks, w), 1).otherwise(0))
      .reduce(_ + _)

  /** Minimum Han-script characters for a zh call — CJK text isn't
    * whitespace-segmented, so marker tokens can't see it; script detection
    * covers it instead. */
  private val hanThreshold = 3

  /** Predicted language per document: Han-script character detection for
    * zh (dominant when present), else argmax of marker-hit scores with a
    * fixed precedence order for ties, "und" (undetermined) when nothing
    * hits. Output: id, per-language scores, n_han, predicted lang. */
  def languageId(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = array_distinct(tokens(col(textCol)))
    val scored = docs.select(
      (col(idCol) +: markers.map { case (lang, ws) =>
        score(toks, ws).as(s"score_$lang")
      }) :+
        // Java regex spells the script class \p{IsHan} (RE2/DuckDB: \p{Han})
        length(regexp_replace(col(textCol), "[^\\p{IsHan}]", ""))
          .cast("long").as("n_han"): _*)
    val best = markers.map { case (lang, _) => col(s"score_$lang") }
      .reduce((a, b) => greatest(a, b))
    // first language (in declared precedence) achieving the max score
    val markerPred = markers.foldRight(lit("und")) { case ((lang, _), els) =>
      when(best > 0 && col(s"score_$lang") === best, lang).otherwise(els)
    }
    scored.withColumn("lang_pred",
      when(col("n_han") >= hanThreshold, "zh").otherwise(markerPred))
  }

  /** Quality metrics: char/token counts, alpha and punctuation counts,
    * stopword hits, and a keep/drop flag from fixed thresholds — the shape
    * of a C4/Gopher-style quality filter, all scan-side. */
  def qualityScore(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val toks = tokens(t)
    val enStop = markers.toMap.apply("en")
    val stopHits = aggregate(toks, lit(0),
      (acc, w) => acc + when(w.isin(enStop: _*), 1).otherwise(0))
    docs.select(
      col(idCol),
      length(t).as("n_chars"),
      size(toks).as("n_tokens"),
      length(regexp_replace(t, "[^\\p{L}]", "")).as("n_alpha"),
      length(regexp_replace(t, "[\\p{L}\\p{N}\\s]", "")).as("n_punct"),
      stopHits.as("n_stopwords"))
      .withColumn("mean_token_len",
        col("n_alpha").cast("double") / col("n_tokens"))
      .withColumn("quality_ok",
        col("n_tokens") >= 10 && col("mean_token_len") >= 2.0 &&
          col("n_punct") * 5 <= col("n_chars"))
  }

  /** Token counts under two tokenizers: plain whitespace and a BPE-ish
    * regex (letter runs / digit runs / single punctuation marks), the
    * standard pre-tokenization used to estimate LLM token budgets. */
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol),
      size(tokens(col(textCol))).as("n_ws_tokens"),
      size(regexp_extract_all(lower(col(textCol)),
        lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))).as("n_bpe_tokens"))

  /** Content fingerprints: MD5 of normalized text (exact-dup key) plus a
    * 64-bit chained rolling hash over the token stream (order-sensitive
    * content signature), both row-local. The rolling fold re-hashes the
    * accumulator with each token (`h = xxhash64(h, token)`) instead of a
    * polynomial multiply — same signature properties, no long overflow
    * under ANSI mode. */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val rolling = aggregate(tokens(col(textCol)), lit(0L),
      (acc, t) => xxhash64(acc, t))
    docs.select(
      col(idCol),
      fingerprint(col(textCol)).as("md5_fp"),
      rolling.as("rolling_fp"))
  }
}
