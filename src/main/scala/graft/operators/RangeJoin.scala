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

  /** [[binnedRangeJoin]] with bounded output: at most `k` matches per
    * left row, keeping the EARLIEST right rows by `rightTs` (ties broken
    * by the remaining right columns ascending, so the selection is fully
    * deterministic and external engines replay it).
    *
    * The range join's output is the one thing in it that grows
    * super-linearly — ~|pairs| ≈ n² · window/span by problem definition
    * (BASELINE.md) — and at 100 TB a user often wants "the first k
    * responses within the window", not every one. The cap prunes AFTER
    * the residual range predicate but BEFORE the output materializes
    * downstream; the row_number window sorts only each left row's match
    * set, whose size the bin residual already bounds to the window
    * occupancy — the quantity the caller is declaring too big to keep,
    * and far smaller than a global sort.
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
    import org.apache.spark.sql.expressions.Window
    val joined = binnedRangeJoin(left, right, leftTs, rightTs,
      lowerSec, upperSec, binSec)
    require(!joined.columns.contains("_rj_rn"),
      "binnedRangeJoinCapped reserves column name _rj_rn")
    val ord = col(rightTs).asc +:
      right.columns.filterNot(_ == rightTs).sorted.map(col(_).asc)
    val w = Window.partitionBy(leftKey.map(col): _*).orderBy(ord: _*)
    joined.withColumn("_rj_rn", row_number().over(w))
      .filter(col("_rj_rn") <= k)
      .drop("_rj_rn")
  }
}
