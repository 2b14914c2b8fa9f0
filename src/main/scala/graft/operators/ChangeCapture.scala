package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture over keyed snapshots and SCD2 history building —
  * the incremental-maintenance surface of a warehouse ETL engine (the
  * reference re-imports full tables each run, ref `import_xml_history.py`;
  * at 100 TB full reloads are not an option, so diff-and-merge is the
  * at-scale replacement this module provides).
  *
  * Scale shape: [[snapshotDiff]] is ONE full-outer shuffle join on the
  * snapshot key — both sides hash-partition once, no driver materialization,
  * and with both snapshots bucketed by the key at rest the exchange
  * disappears entirely. [[scd2Intervals]] is one per-entity window pass
  * (shuffle on the entity key, sort within), state bounded per key.
  */
object ChangeCapture {

  /** SCD1 MERGE (upsert): `updates` wins per key, base rows without an
    * update pass through, keys only in `updates` insert. Schemas must
    * match. Null join keys: an anti-join never matches a null key, so a
    * null-keyed base row always survives and a null-keyed update always
    * inserts — updates can't target null keys (require non-null keys
    * upstream if that matters, as [[snapshotDiff]] documents).
    *
    * Scale shape: one left-anti shuffle on the key + a union — the
    * relational core of MERGE INTO; pair with `Sinks.snapshotOverwrite`
    * to land it crash-safely. */
  def upsert(base: DataFrame, updates: DataFrame,
             keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column")
    require(base.columns.sameElements(updates.columns),
      "base and updates must share a schema")
    base.join(updates.select(keyCols.map(col): _*), keyCols, "left_anti")
      .unionByName(updates)
  }

  /** Keyed diff of two snapshots: one row per key whose compared columns
    * changed, appeared, or disappeared. `change_type` is `I` (key only in
    * `next`), `D` (key only in `prev`), `U` (present in both, at least one
    * compared column differs); unchanged keys are dropped. Compared columns
    * are emitted as `old_<c>` / `new_<c>` pairs.
    *
    * Null-safe: a null-to-value or value-to-null transition is a `U` (the
    * comparison uses null-safe equality), so nullable attribute columns
    * can't silently suppress changes. */
  def snapshotDiff(prev: DataFrame, next: DataFrame, keyCols: Seq[String],
                   compareCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column")
    require(compareCols.nonEmpty, "at least one compared column")
    val p = prev.select(
      keyCols.map(c => col(c).as(s"_p_$c")) ++
        compareCols.map(col) :+ lit(1).as("_in_prev"): _*)
    val n = next.select(
      keyCols.map(c => col(c).as(s"_nk_$c")) ++
        compareCols.map(c => col(c).as(s"_n_$c")) :+ lit(1).as("_in_next"): _*)
    // Null-safe key equality: a null key is a key like any other, so a row
    // keyed null-on-both-sides merges into one diff row instead of an I+D
    // pair (the usingColumns join form would split it).
    val keyMatch = keyCols.map(c => col(s"_p_$c") <=> col(s"_nk_$c"))
      .reduce(_ && _)
    val joined = p.join(n, keyMatch, "full_outer")
    val changed: Column = compareCols
      .map(c => !(col(c) <=> col(s"_n_$c")))
      .reduce(_ || _)
    val changeType = when(col("_in_prev").isNull, lit("I"))
      .when(col("_in_next").isNull, lit("D"))
      .when(changed, lit("U"))
    joined.where(changeType.isNotNull)
      .select(keyCols.map(c => coalesce(col(s"_p_$c"), col(s"_nk_$c")).as(c)) ++
        Seq(changeType.as("change_type")) ++
        compareCols.flatMap(c =>
          Seq(col(c).as(s"old_$c"), col(s"_n_$c").as(s"new_$c"))): _*)
  }

  /** Incrementally maintain a grouped (count, sum) aggregate from a
    * [[snapshotDiff]] change set: each change row contributes a delta
    * (`I`: +new, `D`: −old, `U`: new−old) in its NEW group (and −old in
    * its OLD group when the grouping attribute itself changed), the deltas
    * aggregate, and the previous aggregate absorbs them. At 100 TB this
    * replaces a full re-aggregation with one pass over the (small) change
    * set plus a merge keyed on the group — the point of capturing changes
    * at all. Exactness (incremental == recompute-from-scratch) is what
    * the oracle checks.
    *
    * `groupCol` and `valueCol` must be among the diff's compared columns
    * (so `old_`/`new_` pairs exist). Groups whose post-merge count is 0
    * drop out, matching the recomputed aggregate. */
  def incrementalAgg(prevSnapshot: DataFrame, diff: DataFrame,
                     groupCol: String, valueCol: String): DataFrame =
    incrementalAggFromAgg(
      prevSnapshot.groupBy(col(groupCol).as("g"))
        .agg(count(lit(1)).as("n"), sum(col(valueCol)).as("s")),
      diff, groupCol, valueCol)

  /** The delta-merge core of [[incrementalAgg]], taking the PREVIOUS
    * AGGREGATE (columns `g`, `n`, `s`) directly — the form a continuously
    * maintained aggregate snapshot uses, where the previous aggregate is
    * the stored artifact and the base rows are long gone
    * ([[graft.sources.Sinks.maintainAggSnapshot]]). */
  def incrementalAggFromAgg(prevAgg: DataFrame, diff: DataFrame,
                            groupCol: String, valueCol: String): DataFrame = {
    val oldSide = diff
      .where(col("change_type").isin("D", "U"))
      .select(col(s"old_$groupCol").as("g"),
        lit(-1L).as("dn"), (-col(s"old_$valueCol")).as("ds"))
    val newSide = diff
      .where(col("change_type").isin("I", "U"))
      .select(col(s"new_$groupCol").as("g"),
        lit(1L).as("dn"), col(s"new_$valueCol").as("ds"))
    val deltas = oldSide.unionByName(newSide)
      .groupBy("g").agg(sum(col("dn")).as("dn"), sum(col("ds")).as("ds"))
      .withColumnRenamed("g", "_dg")
    // Null-safe merge: a null group in the previous aggregate and the same
    // null group in the delta set are ONE group — plain equi-join would emit
    // two rows and break incremental == recompute exactness.
    prevAgg.join(deltas, col("g") <=> col("_dg"), "full_outer")
      .select(coalesce(col("g"), col("_dg")).as("g"),
        (coalesce(col("n"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n"),
        (coalesce(col("s"), lit(0L)) + coalesce(col("ds"), lit(0L))).as("s"))
      .where(col("n") > 0)
  }

  /** SCD2 validity intervals from a change-event log: collapse consecutive
    * equal states per entity, then each surviving state is valid from its
    * first event until the next DIFFERENT state's first event (`valid_to`
    * null = current). The standard "type-2 dimension from CDC events"
    * build.
    *
    * Two window passes over the same (entity, time) sort — Catalyst plans
    * them in a single shuffle+sort. `orderCols` must make the order total
    * (ties broken by e.g. an event id) or run-collapse is nondeterministic. */
  def scd2Intervals(events: DataFrame, entityCol: String, stateCol: String,
                    tsCol: String, orderCols: Seq[String] = Seq.empty)
      : DataFrame = {
    val ord = (col(tsCol) +: orderCols.map(col)).map(_.asc)
    val w = Window.partitionBy(entityCol).orderBy(ord: _*)
    val runs = events
      .withColumn("_prev_state", lag(col(stateCol), 1).over(w))
      .where(!(col(stateCol) <=> col("_prev_state"))) // run starts only
    val w2 = Window.partitionBy(entityCol).orderBy(ord: _*)
    runs
      .withColumn("valid_to", lead(col(tsCol), 1).over(w2))
      .select(col(entityCol), col(stateCol).as("state"),
        col(tsCol).as("valid_from"), col("valid_to"),
        col("valid_to").isNull.cast("int").as("is_current"))
  }
}
