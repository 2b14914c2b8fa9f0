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
    * `rightTs`) is attached, null where no right row precedes.
    *
    * The right payload travels as ONE struct column and the forward fill
    * fills that struct — never the payload columns independently — so every
    * emitted left row carries fields from exactly one right row even when
    * right payload values are null (filling columns independently would
    * stitch the newest non-null value of each field across different right
    * rows, diverging from as-of semantics).
    *
    * When several right rows share (key, ts), pass `tiebreakCols` to make
    * the pick total (the row with the LARGEST tiebreak tuple wins — the
    * "most recent" reading of equal timestamps) or guarantee (key,
    * rightTs) unique. */
  def asofBackward(left: DataFrame, right: DataFrame, key: String,
                   leftTs: String, rightTs: String,
                   tiebreakCols: Seq[String] = Seq.empty): DataFrame = {
    val rightPayload = right.columns.filterNot(_ == key).toSeq
    val leftCols = left.columns.toSeq
    val overlap = leftCols.toSet.intersect(rightPayload.toSet)
    require(overlap.isEmpty, s"column collision: $overlap")

    val leftTypes = left.schema.map(f => f.name -> f.dataType).toMap
    val rpType = org.apache.spark.sql.types.StructType(
      right.schema.fields.filterNot(_.name == key))

    val lFull = left.select(
      leftCols.map(col) ++ Seq(
        lit(null).cast(rpType).as("_rp"),
        col(leftTs).as("_ts"), lit(1).as("_side")): _*)
    val rFull = right.select(
      leftCols.map(c =>
        if (c == key) col(key)
        else lit(null).cast(leftTypes(c)).as(c)) ++ Seq(
        struct(rightPayload.map(col): _*).cast(rpType).as("_rp"),
        col(rightTs).as("_ts"), lit(0).as("_side")): _*)

    // tiebreak fields ride inside _rp; `last` over the preceding frame then
    // picks the greatest tiebreak among right rows at the matched timestamp
    val ord = Seq(col("_ts").asc, col("_side").asc) ++
      tiebreakCols.map(c => col("_rp").getField(c).asc_nulls_first)
    val w = Window.partitionBy(key).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lFull.unionByName(rFull)
      .withColumn("_rp", last(col("_rp"), ignoreNulls = true).over(w))
      .where(col("_side") === 1)
      .select(leftCols.map(col) ++
        rightPayload.map(c => col("_rp").getField(c).as(c)): _*)
  }

  /** Forward (look-ahead) as-of join: for each left row, the EARLIEST right
    * row with `right.ts >= left.ts` within the key — the "next state
    * change" / "time-to-next-event" enrichment. Same union-and-fill shape
    * as [[asofBackward]] mirrored: right rows order AFTER left rows at
    * equal timestamps (so an exactly-equal timestamp still matches) and
    * the struct payload back-fills over the FOLLOWING frame. One shuffle
    * on the key, no range cross product.
    *
    * When several right rows share (key, ts), which payload attaches is
    * partition-order-dependent unless the order is made total: pass
    * `tiebreakCols` (right-side payload columns; the row with the SMALLEST
    * tiebreak tuple wins) or guarantee (key, rightTs) unique. */
  def asofForward(left: DataFrame, right: DataFrame, key: String,
                  leftTs: String, rightTs: String,
                  tiebreakCols: Seq[String] = Seq.empty): DataFrame = {
    val rightPayload = right.columns.filterNot(_ == key).toSeq
    val leftCols = left.columns.toSeq
    val overlap = leftCols.toSet.intersect(rightPayload.toSet)
    require(overlap.isEmpty, s"column collision: $overlap")

    val leftTypes = left.schema.map(f => f.name -> f.dataType).toMap
    val rpType = org.apache.spark.sql.types.StructType(
      right.schema.fields.filterNot(_.name == key))

    val lFull = left.select(
      leftCols.map(col) ++ Seq(
        lit(null).cast(rpType).as("_rp"),
        col(leftTs).as("_ts"), lit(0).as("_side")): _*)
    val rFull = right.select(
      leftCols.map(c =>
        if (c == key) col(key)
        else lit(null).cast(leftTypes(c)).as(c)) ++ Seq(
        struct(rightPayload.map(col): _*).cast(rpType).as("_rp"),
        col(rightTs).as("_ts"), lit(1).as("_side")): _*)

    // tiebreak fields ride inside _rp; left rows (all-null _rp) are already
    // separated by _side, so nulls-first keeps them stably ahead
    val ord = Seq(col("_ts").asc, col("_side").asc) ++
      tiebreakCols.map(c => col("_rp").getField(c).asc_nulls_first)
    val w = Window.partitionBy(key).orderBy(ord: _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    lFull.unionByName(rFull)
      .withColumn("_rp", first(col("_rp"), ignoreNulls = true).over(w))
      .where(col("_side") === 0)
      .select(leftCols.map(col) ++
        rightPayload.map(c => col("_rp").getField(c).as(c)): _*)
  }

  /** Nearest as-of join: for each left row, the right row minimizing
    * |right.ts − left.ts| within the key — the "closest observation"
    * enrichment (sensor reading nearest the event, price nearest the
    * trade). Ties break BACKWARD (the not-later reading wins), in exact
    * MICROSECONDS (`unix_micros`; per-side second truncation diverges
    * engines — the `events_conversion_lag` lesson).
    *
    * Composes [[asofBackward]] then [[asofForward]] by CHAINING — the
    * backward pass's output is the forward pass's left side, so there is
    * no join back; two keyed window shuffles total, no range cross
    * product. The per-row pick is one row-local comparison. Right payload
    * columns come back under their own names; `asof_direction` ('b'/'f',
    * null when the key has no right rows at all) and `asof_gap_micros`
    * are appended. (key, rightTs) must be unique — pre-aggregate the
    * right side otherwise. */
  def asofNearest(left: DataFrame, right: DataFrame, key: String,
                  leftTs: String, rightTs: String): DataFrame = {
    val rightPayload = right.columns.filterNot(_ == key).toSeq
    val leftCols = left.columns.toSeq
    val rb = right.select(col(key) +:
      rightPayload.map(c => col(c).as(c + "_nb")): _*)
    val rf = right.select(col(key) +:
      rightPayload.map(c => col(c).as(c + "_nf")): _*)
    val both = asofForward(
      asofBackward(left, rb, key, leftTs, rightTs + "_nb"),
      rf, key, leftTs, rightTs + "_nf")
    val gapB = unix_micros(col(leftTs)) - unix_micros(col(rightTs + "_nb"))
    val gapF = unix_micros(col(rightTs + "_nf")) - unix_micros(col(leftTs))
    val useB = col(rightTs + "_nb").isNotNull &&
      (col(rightTs + "_nf").isNull || gapB <= gapF)
    both.select(leftCols.map(col) ++
      rightPayload.map(c =>
        when(useB, col(c + "_nb")).otherwise(col(c + "_nf")).as(c)) ++ Seq(
      when(useB, lit("b"))
        .when(col(rightTs + "_nf").isNotNull, lit("f"))
        .otherwise(lit(null).cast("string")).as("asof_direction"),
      when(useB, gapB)
        .when(col(rightTs + "_nf").isNotNull, gapF)
        .otherwise(lit(null).cast("long")).as("asof_gap_micros")): _*)
  }
}
