package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture primitives (EXTENSION, SURVEY.md §2.K): snapshot
  * diff, changeset apply (MERGE-style upsert/delete), and SCD-type-2
  * history construction. The reference refreshes whole databases by
  * delete-and-recreate (`etl_manager/meta.py:574-643` repartitions and
  * re-registers full snapshots); these operators give its users the
  * incremental alternative — compute what changed between two snapshot
  * loads, apply a changeset without rewriting the table, and keep a
  * validity-interval history of attribute changes.
  *
  * Scale design shared by all three: diff and apply are single keyed
  * equi-joins (one shuffle per side, AQE skew-handled; shuffle-free when
  * both snapshots are bucketed on the key, `catalog/Bucketing`), and the
  * SCD2 build is one window partitioned by the ENTITY key — per-entity
  * history fits a task by construction (an entity's change log is tiny
  * even when the table is 100 TB), so no global sort ever happens.
  */
object ChangeCapture {

  private def requireCols(df: DataFrame, cols: Seq[String], what: String): Unit = {
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"$what missing columns: ${missing.mkString(", ")}")
  }

  /** Row-level diff of two snapshots of the same table, keyed by
    * `keys` (non-null by contract — parquet snapshot keys; null keys
    * would silently pair up as distinct rows on both sides).
    *
    * Output: key columns, `change_type` ('insert' | 'delete' |
    * 'update'), and `old_<c>` / `new_<c>` for every compare column.
    * Unchanged rows are dropped. A row counts as updated when ANY
    * compare column differs null-safely (`<=>` negated), so a value
    * going to/from NULL is a real update, and an all-NULL attribute row
    * is distinguishable from an absent row (presence is tracked with
    * side markers, not attribute nullness).
    *
    * Shape: ONE full-outer sort-merge join on the snapshot key — each
    * snapshot shuffles exactly once, nothing is windowed, and with both
    * snapshots bucketed on `keys` the exchange disappears entirely.
    */
  def snapshotDiff(base: DataFrame, next: DataFrame, keys: Seq[String],
      compareCols: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "snapshotDiff needs at least one key column")
    requireCols(base, keys ++ compareCols, "snapshotDiff base")
    requireCols(next, keys ++ compareCols, "snapshotDiff next")
    val reserved = Seq("__in_base", "__in_next", "change_type") ++
      compareCols.flatMap(c => Seq(s"old_$c", s"new_$c"))
    require(!base.columns.exists(reserved.contains),
      s"snapshotDiff reserves ${reserved.mkString(", ")}")
    val b = base.select(
      keys.map(col) ++ compareCols.map(c => col(c).as(s"old_$c")) :+
        lit(true).as("__in_base"): _*)
    val n = next.select(
      keys.map(col) ++ compareCols.map(c => col(c).as(s"new_$c")) :+
        lit(true).as("__in_next"): _*)
    val joined = b.join(n, keys, "full_outer")
    val changed = compareCols
      .map(c => !(col(s"old_$c") <=> col(s"new_$c")))
      .reduce(_ || _)
    joined
      .withColumn("change_type",
        when(col("__in_base").isNull, lit("insert"))
          .when(col("__in_next").isNull, lit("delete"))
          .when(changed, lit("update")))
      .filter(col("change_type").isNotNull)
      .select(keys.map(col) ++ Seq(col("change_type")) ++
        compareCols.flatMap(c => Seq(col(s"old_$c"), col(s"new_$c"))): _*)
  }

  /** MERGE-style changeset apply: `changes` carries the key columns, the
    * full data columns of `base` (the NEW values; ignored for deletes),
    * and `opCol` ∈ {'I','U','D'}. Result = base with 'D' keys removed,
    * 'U' keys replaced by their new values, and 'I' rows appended.
    * Contract: at most one change row per key (a CDC batch is already
    * compacted to latest-per-key — [[UrlOps.latestPerUrl]]'s argmax shape
    * does that compaction when it isn't); base keys are unique.
    *
    * Shape: one left-anti equi-join (base sheds changed/deleted keys —
    * broadcast when the changeset is small, the typical CDC case) plus a
    * union with the surviving change rows. No window, no full rewrite of
    * unchanged data paths at the plan level — at 100 TB with both sides
    * bucketed this is the standard no-shuffle MERGE shape.
    */
  def applyChanges(base: DataFrame, changes: DataFrame, keys: Seq[String],
      opCol: String): DataFrame = {
    require(keys.nonEmpty, "applyChanges needs at least one key column")
    requireCols(base, keys, "applyChanges base")
    requireCols(changes, keys :+ opCol, "applyChanges changes")
    val dataCols = base.columns.toSeq
    requireCols(changes, dataCols, "applyChanges changes")
    val survivors = changes.filter(col(opCol) =!= "D")
      .select(dataCols.map(col): _*)
    base.join(changes.select(keys.map(col): _*), keys, "left_anti")
      .unionByName(survivors)
  }

  /** SCD-type-2 history from a change log: one row per (entity, run of
    * equal consecutive attribute values), with `version` (1-based per
    * entity), `valid_from` (first ts of the run), `valid_to` (start of
    * the next run, NULL while current) and `is_current`. Consecutive
    * log rows with an unchanged attribute collapse into the earlier
    * run; attribute equality is null-safe, so NULL→NULL is no change
    * while x→NULL opens a new version. Ordering ties break on
    * `tiebreak` (caller supplies a total order — e.g. the event id).
    *
    * Shape: two window passes over ONE exchange — both windows hash on
    * the entity key with the same sort, so Catalyst plans a single
    * shuffle + sort and reuses it. Per-entity change logs are small by
    * nature (an entity changes a bounded number of times), so tasks
    * stay bounded no matter the table size; a skewed "mega entity"
    * would need the [[SkewJoin]] salting treatment upstream.
    */
  def scd2FromLog(log: DataFrame, key: String, tsCol: String,
      attrCol: String, tiebreak: Seq[String]): DataFrame = {
    requireCols(log, Seq(key, tsCol, attrCol) ++ tiebreak, "scd2FromLog")
    val order = (col(tsCol) +: tiebreak.map(col)).map(_.asc)
    val w = Window.partitionBy(col(key)).orderBy(order: _*)
    val changePoints = log
      .withColumn("__prev", lag(col(attrCol), 1).over(w))
      .withColumn("__first",
        row_number().over(w) === 1) // lag NULL can't mark the first row: a NULL attr value also lags NULL
      .filter(col("__first") || !(col(attrCol) <=> col("__prev")))
    val w2 = Window.partitionBy(col(key)).orderBy(order: _*)
    changePoints
      .withColumn("version", row_number().over(w2).cast("long"))
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w2))
      .withColumn("is_current", col("valid_to").isNull)
      .select(col(key), col(attrCol), col("version"), col("valid_from"),
        col("valid_to"), col("is_current"))
  }

  /** Gap-based sessionization: assign each event a per-user session
    * index (a new session starts when the gap to the previous event
    * exceeds `gapSeconds`, STRICTLY — a gap of exactly `gapSeconds`
    * stays in-session), then collapse to one row per session with
    * start/end/count and an EXACT integer-microsecond duration (no
    * double seconds — `duration_us` replays bit-equal in any engine).
    *
    * Shape: one lag+running-sum window pair on the user key (same
    * exchange, same sort — the order-dependent part is irreducible,
    * like [[EventAnalytics.eventTransitions]]), then a keyed agg on
    * (user, session). Nothing global: a 100 TB event stream shuffles
    * once on user_id and each task sees whole users.
    */
  def sessionize(events: DataFrame, userCol: String, tsCol: String,
      gapSeconds: Long, tiebreak: Seq[String]): DataFrame = {
    requireCols(events, Seq(userCol, tsCol) ++ tiebreak, "sessionize")
    val order = (col(tsCol) +: tiebreak.map(col)).map(_.asc)
    val w = Window.partitionBy(col(userCol)).orderBy(order: _*)
    val gapUs = gapSeconds * 1000000L
    val newSession = coalesce(
      unix_micros(col(tsCol)) - unix_micros(lag(col(tsCol), 1).over(w)) > gapUs,
      lit(true))
    events
      .withColumn("__new_sess", newSession.cast("long"))
      .withColumn("session_idx",
        sum(col("__new_sess")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(userCol), col("session_idx"))
      .agg(
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"),
        (max(unix_micros(col(tsCol))) - min(unix_micros(col(tsCol))))
          .as("duration_us"))
  }
}
