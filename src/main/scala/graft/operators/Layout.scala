package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Physical-layout operators (EXTENSION, SURVEY.md §2.K): Z-order
  * (Morton) clustering keys for multi-dimensional data skipping, and
  * small-file compaction planning. The reference's scale mechanism is
  * directory partition pruning (`etl_manager/meta.py:473-479`); these
  * are the two layout tools that extend pruning WITHIN a partition —
  * sort files by a Z-order key so parquet min/max row-group stats prune
  * on BOTH dimensions, and re-bin undersized partitions so the file
  * count stays bounded as increments accumulate.
  */
object Layout {

  /** Morton (Z-order) key: interleave the low `bits` bits of `x` and
    * `y` (x on even positions, y on odd). Sorting/range-partitioning by
    * this key clusters rows so any small Z-range covers a small
    * axis-aligned rectangle in (x, y) — parquet min/max stats then
    * prune selective predicates on EITHER column, where a plain sort on
    * x leaves y unclustered. Pure bit arithmetic on longs (32 codegen'd
    * terms at the default 16 bits) — replays bit-equal in any engine.
    * Inputs must be non-negative and < 2^bits (caller masks/buckets
    * first: coordinates, hash buckets, day numbers...).
    */
  def zorderKey(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    val terms = (0 until bits).flatMap { i =>
      Seq(
        shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i),
        shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
    terms.reduce(_.bitwiseOR(_))
  }

  /** Per-Z-bucket clustering evidence: bucket rows by the top bits of
    * their Z-key (`bucketShift` = how many low bits to drop) and report
    * each bucket's row count and (x, y) bounding box. A well-clustered
    * layout shows SMALL boxes — exactly what parquet row-group min/max
    * stats would expose to the scan pruner. One map-side projection +
    * one keyed agg; all-integer output.
    */
  def zorderBucketStats(df: DataFrame, xCol: String, yCol: String,
      bits: Int = 16, bucketShift: Int = 26): DataFrame = {
    val z = zorderKey(col(xCol).cast("long"), col(yCol).cast("long"), bits)
    df.select(shiftright(z, bucketShift).as("z_bucket"),
        col(xCol).cast("long").as("_x"), col(yCol).cast("long").as("_y"))
      .groupBy("z_bucket")
      .agg(count(lit(1)).as("n"),
        min("_x").as("min_x"), max("_x").as("max_x"),
        min("_y").as("min_y"), max("_y").as("max_y"))
  }

  /** Small-file compaction plan: given a partition inventory
    * (`partCol`, `sizeCol` — rows or bytes), assign each partition (in
    * `partCol` order) to a compaction bin by greedy running total:
    * `bin = floor(cumulative_size_before / target)`. Adjacent
    * partitions land in the same output file until it reaches ~target —
    * the standard "coalesce a month of small increments" maintenance
    * pass. The window runs over the partition INVENTORY (thousands of
    * rows — metadata, not data), never over the table itself; the
    * rewrite it plans is then one `repartitionByRange(bin)` write.
    * Output: partCol, size, bin (all integers).
    */
  def compactionPlan(inventory: DataFrame, partCol: String, sizeCol: String,
      targetSize: Long): DataFrame = {
    require(targetSize > 0, s"targetSize must be positive, got $targetSize")
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col(partCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    inventory
      .withColumn("_cum", sum(col(sizeCol)).over(w) - col(sizeCol))
      .withColumn("bin", floor(col("_cum") / lit(targetSize)).cast("long"))
      .select(col(partCol), col(sizeCol), col("bin"))
  }
}
