package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Time-range join without an equi-key — SURVEY.md §2.D EXT.
  *
  * Pairs every left row with the right rows whose time falls in the
  * half-open window `[leftTs + lowerSec, leftTs + upperSec)`. A naive
  * formulation is a pure theta join, which Spark can only execute as a
  * BroadcastNestedLoopJoin — O(|L|·|R|) and a driver-OOM risk once neither
  * side fits in a broadcast. Binning converts it to an equi-join: each
  * right row lands in exactly one fixed-width time bin, each left row's
  * window overlaps at most `ceil(width/bin)+1` bins (2 at the default
  * bin = window width), so the left side is replicated that bounded
  * number of times, the join runs as a shuffled equi-join on the bin id,
  * and the exact range predicate filters the residual pairs. Both sides
  * shuffle once on the bin key; no broadcast, no quadratic blow-up —
  * the formulation that holds when both sides are 100 TB event streams.
  */
object RangeJoin {

  /** @param left     probe rows (each may match many right rows)
    * @param right    build rows to locate inside the probe windows
    * @param leftTs   left timestamp column name
    * @param rightTs  right timestamp column name
    * @param lowerSec window start offset, seconds (inclusive, may be negative)
    * @param upperSec window end offset, seconds (exclusive, > lowerSec)
    * @param binSec   bin width, seconds; 0 = window width (replication ≤ 2) */
  def binnedRangeJoin(left: DataFrame, right: DataFrame,
      leftTs: String, rightTs: String,
      lowerSec: Long, upperSec: Long, binSec: Long = 0L): DataFrame = {
    require(upperSec > lowerSec,
      s"empty window: [$lowerSec, $upperSec) seconds")
    val bin = if (binSec > 0L) binSec else upperSec - lowerSec
    val clash = left.columns.toSet.intersect(right.columns.toSet)
    require(clash.isEmpty,
      s"left/right column names must be disjoint, both have: ${clash.mkString(", ")}")
    val reserved = Set("_lbin", "_rbin")
    require(!(left.columns ++ right.columns).exists(reserved),
      s"binnedRangeJoin reserves column names ${reserved.mkString(", ")}")

    // all arithmetic in epoch micros: exact longs, no double rounding.
    // floor division via (x - pmod(x, b)) / b: the numerator is an exact
    // multiple of b below 2^53, so the double division is exact — a bare
    // `floor(x / b)` can misplace exact bin boundaries, and `x div b`
    // truncates toward zero, wrong for pre-epoch timestamps.
    val binUs = bin * 1000000L
    val lowUs = lowerSec * 1000000L
    val highUs = upperSec * 1000000L
    val lUs = unix_micros(col(leftTs))
    val rUs = unix_micros(col(rightTs))
    def floorDiv(x: org.apache.spark.sql.Column) =
      ((x - pmod(x, lit(binUs))) / lit(binUs)).cast("long")

    val r = right.withColumn("_rbin", floorDiv(rUs))
    // window is half-open, so the last overlapped bin holds highUs - 1
    val l = left.withColumn("_lbin",
      explode(sequence(floorDiv(lUs + lowUs), floorDiv(lUs + highUs - 1L))))

    l.join(r, col("_lbin") === col("_rbin") &&
        rUs >= lUs + lowUs && rUs < lUs + highUs)
      .drop("_lbin", "_rbin")
  }

  /** Interval-overlap join without an equi-key: pairs every left
    * interval `[lStart, lEnd]` with the right intervals `[rStart, rEnd]`
    * it overlaps (closed-interval semantics: touching endpoints DO
    * overlap, with `overlap_us = 0`). Columns are epoch-microsecond (or
    * any same-unit integer) longs, so the same operator serves time
    * ranges, token spans, or genomic coordinates.
    *
    * Same scale argument as [[binnedRangeJoin]], generalized to
    * variable-length intervals on BOTH sides: each interval explodes to
    * the fixed-width bins it covers (≤ len/bin + 1 replicas — pick
    * `binUnits` near the typical interval length), the join is a
    * shuffled equi-join on the bin id, and each genuinely-overlapping
    * pair is emitted EXACTLY ONCE by the canonical-bin rule: only from
    * the bin containing `max(lStart, rStart)` — the first bin where
    * both intervals are present. No distinct pass, no
    * BroadcastNestedLoopJoin, bounded replication — holds when both
    * sides are 100 TB.
    *
    * Adds `overlap_us = min(lEnd, rEnd) − max(lStart, rStart)` (exact
    * integer arithmetic). Intervals must be well-formed (start ≤ end);
    * left/right column names must be disjoint.
    */
  def intervalOverlapJoin(left: DataFrame, right: DataFrame,
      lStart: String, lEnd: String, rStart: String, rEnd: String,
      binUnits: Long): DataFrame = {
    require(binUnits > 0L, s"bin width must be positive, got $binUnits")
    val clash = left.columns.toSet.intersect(right.columns.toSet)
    require(clash.isEmpty,
      s"left/right column names must be disjoint, both have: ${clash.mkString(", ")}")
    val reserved = Set("_lbin", "_rbin", "overlap_us")
    require(!(left.columns ++ right.columns).exists(reserved),
      s"intervalOverlapJoin reserves column names ${reserved.mkString(", ")}")
    def floorDiv(x: org.apache.spark.sql.Column) =
      ((x - pmod(x, lit(binUnits))) / lit(binUnits)).cast("long")
    val l = left.withColumn("_lbin",
      explode(sequence(floorDiv(col(lStart)), floorDiv(col(lEnd)))))
    val r = right.withColumn("_rbin",
      explode(sequence(floorDiv(col(rStart)), floorDiv(col(rEnd)))))
    l.join(r, col("_lbin") === col("_rbin") &&
        col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd) &&
        col("_lbin") === floorDiv(greatest(col(lStart), col(rStart))))
      .withColumn("overlap_us",
        least(col(lEnd), col(rEnd)) - greatest(col(lStart), col(rStart)))
      .drop("_lbin", "_rbin")
  }

  /** [[intervalOverlapJoin]] with bounded output: at most `k` matches per
    * left interval, keeping the LARGEST overlaps (ties broken by the
    * right columns in name order ascending — a total order when the
    * right side carries a unique id, so external engines replay the
    * selection with `row_number() OVER (PARTITION BY leftKey ORDER BY
    * overlap DESC, <right cols sorted>) <= k`).
    *
    * The interval join is the inventory's one remaining output-bound
    * family (~sf² by problem definition — BASELINE.md sf10: 39.5 s, all
    * of it pair emission), and at 100 TB a user usually wants "the k
    * most-overlapping partners", not every one. Same discipline as
    * [[binnedRangeJoinCapped]]: the cap is a bounded-heap aggregate
    * ([[graft.functions.MinKByAgg]]) with map-side partial aggregation,
    * so each mapper contributes ≤ k rows per left interval to the
    * exchange and nothing is ever sorted but the final k — output
    * returns to O(k·|left|) instead of O(|pairs|).
    *
    * Grouping is by ALL left columns (valid because `leftKey` uniquely
    * identifies a left row — the rest are functionally dependent).
    */
  def intervalOverlapJoinCapped(left: DataFrame, right: DataFrame,
      lStart: String, lEnd: String, rStart: String, rEnd: String,
      binUnits: Long, leftKey: Seq[String], k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(leftKey.nonEmpty, "leftKey must name the columns identifying a left row")
    require(leftKey.forall(left.columns.contains),
      s"leftKey ${leftKey.mkString(",")} must be left-side columns")
    val joined = intervalOverlapJoin(left, right, lStart, lEnd, rStart, rEnd,
      binUnits)
    val reserved = Set("_ij_neg", "_ij_top", "_ij_m")
    require(!joined.columns.exists(reserved),
      s"intervalOverlapJoinCapped reserves column names ${reserved.mkString(", ")}")
    // sort key: negated overlap (ascending = overlap DESC) then the right
    // columns by name — one struct per candidate doubles as the payload
    // (the fused minKRowsAgg shape, see binnedRangeJoinCapped)
    val ordCols = (-col("overlap_us")).as("_ij_neg") +:
      right.columns.sorted.map(c => col(c).as(c)) :+
      col("overlap_us").as("overlap_us")
    joined
      .groupBy(left.columns.map(col): _*)
      .agg(graft.functions.MinKByAgg
        .minKRowsAgg(struct(ordCols: _*), k).as("_ij_top"))
      .withColumn("_ij_m", explode(col("_ij_top")))
      .select(left.columns.map(col) ++
        right.columns.map(c => col("_ij_m").getField(c).as(c)) :+
        col("_ij_m").getField("overlap_us").as("overlap_us"): _*)
  }

  /** [[binnedRangeJoin]] with bounded output: at most `k` matches per
    * left row, keeping the EARLIEST right rows by `rightTs` (ties broken
    * by the remaining right columns ascending, so the selection is fully
    * deterministic and external engines replay it with
    * `row_number() OVER (PARTITION BY leftKey ORDER BY rightTs, ...) <= k`).
    *
    * The range join's output is the one thing in it that grows
    * super-linearly — ~|pairs| ≈ n² · window/span by problem definition
    * (BASELINE.md: 1.39 G candidate pairs at sf5) — and at 100 TB a user
    * often wants "the first k responses within the window", not every one.
    * A row_number window would shuffle EVERY candidate pair to its left
    * key's reducer and sort the whole match set before discarding all but
    * k; instead the cap is a bounded-heap aggregate
    * ([[graft.functions.MinKByAgg]]) grouped on the left row: map-side
    * partial aggregation caps each mapper's contribution at k rows per
    * left key, so the exchange after the join carries ≤ k·(bins touched)
    * rows per left row no matter how many candidates the window contains,
    * and nothing is ever sorted but the final k. That turns the engine's
    * largest avoidable shuffle (all pairs) into one proportional to the
    * OUTPUT (k·|left|).
    *
    * Grouping is by ALL left columns (valid because `leftKey` uniquely
    * identifies a left row, so the rest are functionally dependent — and
    * it keeps the left row intact without first()-style aggregates).
    *
    * @param leftKey columns that uniquely identify a left row (the cap
    *                partitions by them) */
  def binnedRangeJoinCapped(left: DataFrame, right: DataFrame,
      leftTs: String, rightTs: String,
      lowerSec: Long, upperSec: Long, leftKey: Seq[String], k: Int,
      binSec: Long = 0L): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(leftKey.nonEmpty, "leftKey must name the columns identifying a left row")
    require(leftKey.forall(left.columns.contains),
      s"leftKey ${leftKey.mkString(",")} must be left-side columns")
    val joined = binnedRangeJoin(left, right, leftTs, rightTs,
      lowerSec, upperSec, binSec)
    val reserved = Set("_rj_top", "_rj_m")
    require(!joined.columns.exists(reserved),
      s"binnedRangeJoinCapped reserves column names ${reserved.mkString(", ")}")
    // sort key = (rightTs, remaining right cols by name asc): a total order
    // over right rows, so the k survivors are unique and an external SQL
    // engine replays the selection with the equivalent row_number window.
    // The key carries every right column, so it doubles as the payload —
    // the fused minKRowsAgg builds ONE struct per candidate row (the
    // per-row cost that dominates below the shuffle-bound regime) and
    // the emit projection restores the caller's column order by name.
    val ordCols = (col(rightTs).as(rightTs)) +:
      right.columns.filterNot(_ == rightTs).sorted.map(c => col(c).as(c))
    joined
      .groupBy(left.columns.map(col): _*)
      .agg(graft.functions.MinKByAgg
        .minKRowsAgg(struct(ordCols: _*), k).as("_rj_top"))
      .withColumn("_rj_m", explode(col("_rj_top")))
      .select(left.columns.map(col) ++
        right.columns.map(c => col("_rj_m").getField(c).as(c)): _*)
  }
}
