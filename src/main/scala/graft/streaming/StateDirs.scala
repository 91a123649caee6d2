package graft.streaming

import org.apache.spark.sql.SparkSession

/** The one shared state-directory probe for every streaming maintenance
  * surface (AggMaintenance / FeatureStore / JoinMaintenance / DriftMonitor
  * / CorpusIngest): "does this dir already hold parquet state?"
  *
  * RECURSIVE on purpose — a state dir seeded with a `partitionBy()`
  * layout keeps its files in subdirectories, and a top-level-only check
  * reads such a dir as "absent", after which the next trigger bootstraps
  * EMPTY state over the existing data (silent state loss). Five modules
  * used to carry private top-level-only copies of this check; the bug
  * class is fixed once, here.
  */
private[streaming] object StateDirs {

  def hasParquetData(spark: SparkSession, dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return false
    val it = fs.listFiles(p, true)
    while (it.hasNext) {
      if (it.next().getPath.getName.endsWith(".parquet")) return true
    }
    false
  }
}
