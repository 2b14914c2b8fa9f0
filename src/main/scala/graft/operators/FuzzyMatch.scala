package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fuzzy (edit-distance) best-match join: for each dirty string, the
  * closest clean string by Levenshtein distance — the approximate form of
  * the reference's informal→official description matching (ref
  * `batch_train.py:121-146` learns exact matches; this operator answers
  * "and what about the typos"). `levenshtein` is a codegen'd built-in with
  * identical unit-cost semantics across engines, so the whole operator is
  * hash-oracle-able.
  *
  * Scale shape: the clean side is a DIMENSION (entity names, label
  * vocabularies, gazetteer rows — bounded) and broadcasts; the dirty side
  * streams through map-side with no shuffle. `maxDistance` prunes the
  * candidate pairs before ranking, and for clean sides too large to
  * broadcast whole, pre-block by length band (|len(a) − len(b)| ≤
  * maxDistance is a hard Levenshtein bound, so the length-band join loses
  * nothing).
  */
object FuzzyMatch {

  /** For each row of `dirty`, the `clean` row with the smallest
    * `levenshtein(dirtyCol, cleanCol)` ≤ `maxDistance` (ties break to the
    * lexicographically smallest clean value — deterministic). Rows with no
    * candidate within the bound are dropped (inner semantics). Output:
    * every `dirty` column plus (match, distance). */
  def bestMatch(dirty: DataFrame, clean: DataFrame,
                dirtyCol: String, cleanCol: String,
                maxDistance: Int): DataFrame = {
    require(maxDistance >= 0, "maxDistance >= 0")
    val cands = clean.select(col(cleanCol).as("_cand")).distinct()
    val dcols = dirty.columns.toSeq
    dirty
      .crossJoin(broadcast(cands))
      // length band first: a cheap codegen'd gate that skips the O(n·m)
      // distance loop for most candidates
      .where(abs(length(col(dirtyCol)) - length(col("_cand"))) <= maxDistance)
      .withColumn("_dist", levenshtein(col(dirtyCol), col("_cand")))
      .where(col("_dist") <= maxDistance)
      .groupBy(dcols.map(col): _*)
      .agg(min_by(struct(col("_cand").as("m"), col("_dist").as("d")),
        struct(col("_dist"), col("_cand"))).as("_best"))
      .select(dcols.map(col) :+ col("_best.m").as("match")
        :+ col("_best.d").cast("long").as("distance"): _*)
  }

  /** One agreement field of a Fellegi–Sunter comparison vector: the
    * predicate plus its integer milli log-odds weights (≈ log(m/u) /
    * log((1−m)/(1−u)) from a trained or hand-set m-u model — like
    * [[graft.operators.ModelScore]], the trained parameters bake into
    * the plan as literals). */
  final case class FsField(name: String, agree: org.apache.spark.sql.Column,
                           wAgreeMilli: Long, wDisagreeMilli: Long)

  /** Fellegi–Sunter record-linkage scoring over pre-BLOCKED candidate
    * pairs (Fellegi & Sunter 1969, the standard probabilistic
    * record-linkage decision model). Each field's
    * agreement adds its log-odds weight, disagreement its (negative)
    * counterpart; the summed `score_milli` lands each pair in the
    * classic three-way decision: `match` / `possible` (clerical review)
    * / `nonmatch`.
    *
    * NULL-safe: a NULL on either side of a predicate counts as
    * DISAGREEMENT (no evidence ≠ evidence of sameness). All weights are
    * integer milli-units, so the whole decision surface is exact and
    * SQL-replayable.
    *
    * Scale shape: scoring is a pure codegen'd projection over the
    * blocked pair stream — no shuffle of its own; the blocking join
    * upstream (equi-join on block keys, broadcast when one side is a
    * dimension) owns the data movement. Never call this on an unblocked
    * cross product. */
  def fellegiSunterScore(pairs: DataFrame, fields: Seq[FsField],
                         matchMin: Long, possibleMin: Long): DataFrame = {
    require(fields.nonEmpty, "need at least one comparison field")
    require(matchMin > possibleMin, "matchMin must exceed possibleMin")
    val withInd = fields.foldLeft(pairs) { (df, f) =>
      df.withColumn(s"agree_${f.name}",
        coalesce(f.agree, lit(false)).cast("long"))
    }
    val score = fields.map { f =>
      when(col(s"agree_${f.name}") === 1L, lit(f.wAgreeMilli))
        .otherwise(lit(f.wDisagreeMilli))
    }.reduce(_ + _)
    withInd.withColumn("score_milli", score)
      .withColumn("band",
        when(col("score_milli") >= matchMin, "match")
          .when(col("score_milli") >= possibleMin, "possible")
          .otherwise("nonmatch"))
  }
}
