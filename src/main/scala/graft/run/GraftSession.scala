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

  /** The JDK17 `--add-opens` flags Spark 4 needs when a JVM is launched
    * outside spark-submit (mirrors
    * org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions;
    * build.sbt carries the same list for forked driver JVMs). */
  val jdk17AddOpens: Seq[String] = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).map(p => s"--add-opens=$p=ALL-UNNAMED")

  /** Apply a master URL to a builder. A `local-cluster[n,cores,memMb]`
    * master spawns REAL executor JVMs (the single-machine rehearsal of a
    * standalone cluster — every task result, broadcast, and aggregate
    * buffer crosses a process boundary instead of staying in-heap), so
    * the executors also need the driver's classpath (this library runs
    * from class directories, not an assembled jar) and the add-opens
    * list. Requires SPARK_HOME and SPARK_SCALA_VERSION in the
    * environment (build.sbt sets both for forked runs). */
  def withMaster(b: SparkSession.Builder, master: String): SparkSession.Builder =
    if (master.startsWith("local-cluster")) b.master(master)
      .config("spark.executor.extraClassPath", sys.props("java.class.path"))
      .config("spark.executor.extraJavaOptions", jdk17AddOpens.mkString(" "))
    else b.master(master)

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
      // multi-tenant sessions run many queries concurrently (see
      // ConcurrencySpec): FAIR keeps a long scan from starving short
      // interactive jobs; pools opt in via spark.scheduler.pool
      "spark.scheduler.mode" -> "FAIR",
    )
  }

  private def commonConf(b: SparkSession.Builder): SparkSession.Builder = b
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.skewJoin.enabled", "true")
    .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", 100000)
    .config("spark.ui.enabled", "false")
}
