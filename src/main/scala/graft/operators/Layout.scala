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

  /** The inventory SOURCE for [[compactionPlan]]: every data file under
    * `root` as (file, bytes, mtime_ms), `file` relative to the root so
    * plans are location-portable. The listing is DISTRIBUTED: top-level
    * entries enumerate on the driver (one RPC), then each task walks its
    * subtree — at 100 TB a table has millions of files across thousands
    * of partition dirs, and a driver-only recursive walk is the hidden
    * serial bottleneck of naive maintenance jobs (Spark's own
    * InMemoryFileIndex parallelizes the same way past a threshold).
    * Hidden files and commit markers (`_SUCCESS`, dotfiles) are skipped.
    * Output is metadata-sized; feed it straight to [[compactionPlan]]
    * (bins by bytes) — files sorted by relative path keeps partition
    * siblings adjacent, so bins respect directory locality. */
  def fileInventory(spark: org.apache.spark.sql.SparkSession,
      root: String): DataFrame = {
    import org.apache.hadoop.fs.Path
    val rootPath = new Path(root)
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val fs = rootPath.getFileSystem(conf.value)
    val rootUri = fs.makeQualified(rootPath).toUri
    val top = fs.listStatus(rootPath).toSeq
    val (dirs, files) = top.partition(_.isDirectory)
    def rel(p: Path): String =
      rootUri.relativize(p.toUri).getPath
    def keep(name: String): Boolean =
      !name.startsWith("_") && !name.startsWith(".")
    val topRows = files.filter(f => keep(f.getPath.getName))
      .map(f => (rel(f.getPath), f.getLen, f.getModificationTime))
    val dirStrs = dirs.filter(d => keep(d.getPath.getName))
      .map(_.getPath.toString)
    val subRows = spark.sparkContext
      .parallelize(dirStrs, math.max(1, math.min(dirStrs.size, 64)))
      .flatMap { dir =>
        val p = new Path(dir)
        val dfs = p.getFileSystem(conf.value)
        val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long)]
        val it = dfs.listFiles(p, true)
        while (it.hasNext) {
          val f = it.next()
          if (keep(f.getPath.getName))
            out += ((rootUri.relativize(f.getPath.toUri).getPath,
              f.getLen, f.getModificationTime))
        }
        out
      }
    import spark.implicits._
    (spark.createDataset(topRows) union subRows.toDS())
      .toDF("file", "bytes", "mtime_ms")
  }

  /** End-to-end small-file maintenance plan for a table directory:
    * [[fileInventory]] → [[compactionPlan]] binned by bytes. Each
    * output row is (file, bytes, bin); the rewrite is then "read the
    * files of each bin, write one output file per bin". */
  def compactionPlanForPath(spark: org.apache.spark.sql.SparkSession,
      root: String, targetBytes: Long): DataFrame =
    compactionPlan(fileInventory(spark, root), "file", "bytes", targetBytes)
}
