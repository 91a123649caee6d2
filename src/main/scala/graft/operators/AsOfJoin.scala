package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward) join — SURVEY.md §2.D EXT. For every left row, the
  * latest right row whose time column is <= the left row's, per key.
  *
  * Implemented as union + per-key window carry-forward (`last(...,
  * ignoreNulls)` over an unbounded-preceding frame), NOT a range join:
  * one shuffle per side on the key, sort within partitions, no
  * BroadcastNestedLoop / quadratic range explosion — the formulation that
  * holds when both sides are 100 TB time series. */
object AsOfJoin {

  /** @param left       probe rows (kept 1:1 in the output)
    * @param right      reference rows supplying carried-forward values
    * @param key        equi-key column name present on both sides
    * @param leftTs     left time column name
    * @param rightTs    right time column name
    * @param rightVals  right columns to carry (renamed as given) */
  def asofBackward(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String,
      rightVals: Map[String, String]): DataFrame =
    asofImpl(left, right, key, leftTs, rightTs, rightVals, forward = false)

  /** Forward as-of: for every left row, the EARLIEST right row whose
    * time is >= the left row's, per key (next-upcoming-event semantics —
    * "the error that followed this purchase"). Same
    * union + carry-forward shape as [[asofBackward]], with the per-key
    * sort descending so the carried value is the nearest at-or-after. */
  def asofForward(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String,
      rightVals: Map[String, String]): DataFrame =
    asofImpl(left, right, key, leftTs, rightTs, rightVals, forward = true)

  /** Backward as-of with a TOLERANCE bound (the `ASOF ... TOLERANCE`
    * refinement): the match must lie within `toleranceUs` microseconds
    * at-or-before the left row, else the carried values are NULL — a
    * stale quote/signup/config older than the window is no match at
    * all. Same single-exchange carry-forward plan as [[asofBackward]]
    * plus one map-side gap predicate; time columns must be timestamps.
    * `rightTs` may not itself appear in `rightVals` (the gap check
    * carries it internally). */
  def asofBackwardWithin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, rightVals: Map[String, String],
      toleranceUs: Long): DataFrame = {
    require(toleranceUs >= 0, s"toleranceUs must be >= 0, got $toleranceUs")
    require(!rightVals.contains(rightTs),
      s"carry $rightTs under a different name; asofBackwardWithin reserves it")
    require(!rightVals.values.exists(_ == "__asof_mts") &&
      !left.columns.contains("__asof_mts"),
      "asofBackwardWithin reserves __asof_mts")
    val withTs = asofBackward(left, right, key, leftTs, rightTs,
      rightVals + (rightTs -> "__asof_mts"))
    val gapOk =
      unix_micros(col(leftTs)) - unix_micros(col("__asof_mts")) <= toleranceUs
    rightVals.values.foldLeft(withTs) { (df, out) =>
      df.withColumn(out, when(gapOk, col(out)))
    }.drop("__asof_mts")
  }

  /** Point-in-time multi-table feature assembly — the feature-store
    * join: a label spine (entity, label_ts) picks up, from EACH feature
    * table, the latest value at-or-before the label time and within
    * that table's own staleness bound. Folding [[asofBackwardWithin]]
    * per table gives the two guarantees feature stores exist for: no
    * feature leakage (feature_ts ≤ label_ts, per row, by construction)
    * and bounded staleness (older features surface as NULL, never as a
    * silently stale value). Each fold is one union + one keyed
    * carry-forward window — the spine never re-shuffles between tables
    * beyond its entity key.
    *
    * @param features (table, tsCol, carriedVals, toleranceUs) per
    *        feature table; carried names must be globally distinct */
  def pointInTimeFeatures(spine: DataFrame, key: String, spineTs: String,
      features: Seq[(DataFrame, String, Map[String, String], Long)]): DataFrame =
    features.foldLeft(spine) { case (acc, (ft, ftTs, vals, tolUs)) =>
      asofBackwardWithin(acc, ft, key, spineTs, ftTs, vals, tolUs)
    }

  private def asofImpl(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String,
      rightVals: Map[String, String], forward: Boolean): DataFrame = {
    val leftCols = left.columns.toSeq
    val reserved = Set("_k", "_ts", "_side")
    require(!leftCols.exists(reserved) && !rightVals.values.exists(reserved),
      s"asofBackward reserves column names ${reserved.mkString(", ")}")
    val clash = rightVals.values.toSet.intersect(leftCols.toSet)
    require(clash.isEmpty,
      s"rightVals output names collide with left columns: ${clash.mkString(", ")}")
    val carried = rightVals.toSeq.sortBy(_._1)

    // unified shape: key, ts, side (right sorts before left on ts ties so
    // "<=" is inclusive), left payload nulled on right rows and vice versa
    val l = left.select(
      (col(key).as("_k") +: col(leftTs).as("_ts") +: lit(1).as("_side") +:
        leftCols.map(c => col(c)) ++:
        carried.map { case (_, out) => lit(null).as(out) }): _*)
    val r = right.select(
      (col(key).as("_k") +: col(rightTs).as("_ts") +: lit(0).as("_side") +:
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++:
        carried.map { case (in, out) => col(in).as(out) }): _*)

    // forward flips the scan direction; right (side 0) still sorts
    // before left at equal ts in both cases, keeping the bound inclusive
    val order =
      if (forward) Seq(col("_ts").desc, col("_side")) else Seq(col("_ts"), col("_side"))
    val w = Window.partitionBy("_k").orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withCarry = l.unionByName(r)
      .select((col("_side") +: leftCols.map(col) ++:
        carried.map { case (_, out) => last(col(out), ignoreNulls = true).over(w).as(out) }): _*)
    withCarry.filter(col("_side") === 1).drop("_side")
  }
}
