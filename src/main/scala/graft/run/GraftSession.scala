package graft.run

import org.apache.spark.sql.SparkSession

/** Session factory encoding the engine's production tuning (the §2.I
  * "job definition" analog of the reference's worker-type/count cluster
  * sizing, `etl_manager/etl.py:252-330`, re-expressed as Spark confs).
  *
  * Two profiles:
  *  - [[local]]: the test/bench shape (all cores of one machine).
  *  - [[clusterConf]]: the conf map a 100 TB deployment submits with —
  *    shuffle partitioned ~2-3x total cores, AQE on with skew-join
  *    splitting, 128 MB scan partitions, broadcast threshold sized to
  *    executor memory headroom.
  */
object GraftSession {

  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val b = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft")
      .config("spark.sql.shuffle.partitions", cores)
    commonConf(b).getOrCreate()
  }

  /** Conf map for a real cluster submit (spark-submit --conf ...). Pure
    * data so jobs can merge/override; mirrors how the reference derives a
    * job definition dict from worker sizing. */
  def clusterConf(executors: Int, coresPerExecutor: Int = 4,
      executorMemoryGb: Int = 16): Map[String, String] = {
    val totalCores = executors * coresPerExecutor
    Map(
      "spark.executor.instances" -> executors.toString,
      "spark.executor.cores" -> coresPerExecutor.toString,
      "spark.executor.memory" -> s"${executorMemoryGb}g",
      // ~2.5x cores: enough tasks to keep cores busy through stragglers
      // without tiny-partition overhead
      "spark.sql.shuffle.partitions" -> (totalCores * 5 / 2).toString,
      // 128 MB scan splits: the parquet row-group sweet spot
      "spark.sql.files.maxPartitionBytes" -> (128L * 1024 * 1024).toString,
      // AQE: runtime coalescing, skew-join splitting, plan re-opt
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // dims up to ~256 MB broadcast when executors have 16g
      "spark.sql.autoBroadcastJoinThreshold" ->
        (math.min(256, executorMemoryGb * 16).toString + "MB"),
      "spark.sql.session.timeZone" -> "UTC",
      "spark.sql.objectHashAggregate.sortBased.fallbackThreshold" -> "100000",
      "spark.serializer" -> "org.apache.spark.serializer.KryoSerializer",
    )
  }

  private def commonConf(b: SparkSession.Builder): SparkSession.Builder = b
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.skewJoin.enabled", "true")
    .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", 100000)
    .config("spark.ui.enabled", "false")
}
