package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._
import scala.collection.mutable

object JobProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0); val dir = args(1)
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", 100000)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    case class St(id: Int, nameS: String, wall: Double, taskTime: Double,
      sRead: Long, sWrite: Long, input: Long, ntasks: Int)
    val stages = mutable.ArrayBuffer[St]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = (for {a <- si.completionTime; b <- si.submissionTime} yield (a-b)/1e3).getOrElse(0.0)
        val m = si.taskMetrics
        // label each stage by the OPERATOR scopes of its RDD chain (the
        // callsite-based stage name is useless under AQE: every stage
        // reports the thread-pool callsite) — rddInfos run leaf-to-root,
        // so this reads as the stage's pipeline
        val ops = si.rddInfos.flatMap(r => r.scope.map(_.name))
          .filterNot(_.startsWith("WholeStageCodegen")).distinct.take(8)
        // attempt + RDD-id range disambiguate a retried stage from two
        // distinct stages over the same shuffle
        val tag = s"a${si.attemptNumber}/r${si.rddInfos.map(_.id).min}-${si.rddInfos.map(_.id).max}"
        // JOBPROBE_RDDS=1: full per-RDD chain for stages > 5 s task time
        if (sys.env.contains("JOBPROBE_RDDS") && m.executorRunTime/1e3 > 5.0)
          println(s"  RDDS st ${si.stageId}: " + si.rddInfos.sortBy(_.id).map(r =>
            s"${r.id}:${r.scope.map(_.name).getOrElse("-")}:${r.name}").mkString(" | "))
        stages.synchronized {
          stages += St(si.stageId,
            (if (ops.nonEmpty) ops.mkString(">") else si.name.split('\n').head.take(60)) + s" [$tag]",
            wall, m.executorRunTime/1e3, m.shuffleReadMetrics.totalBytesRead,
            m.shuffleWriteMetrics.bytesWritten, m.inputMetrics.bytesRead, si.numTasks)
        }
      }
    })
    @volatile var lastPlan: String = ""
    spark.listenerManager.register(new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String, qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit =
        lastPlan = qe.executedPlan.toString
      override def onFailure(funcName: String, qe: org.apache.spark.sql.execution.QueryExecution, exception: Exception): Unit = ()
    })
    spark.range(1000).selectExpr("id","id*2 AS x").groupBy(org.apache.spark.sql.functions.expr("id % 7")).count()
      .write.format("noop").mode("overwrite").save()
    val fn = SparkEntry.queries(name)
    Queries.sharedStages.getOrElse(name, Nil).foreach(st =>
      Queries.indexBuilds.get(st).foreach(b => b(spark, dir)))
    for (rep <- 0 until reps) {
      stages.synchronized { stages.clear() }
      val t0 = System.nanoTime()
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime()-t0)/1e9
      Thread.sleep(300)
      val ss = stages.synchronized { stages.toSeq }
      println(f"== rep $rep wall=$wall%.2f nstages=${ss.size} stagewallsum=${ss.map(_.wall).sum}%.2f tasktimesum=${ss.map(_.taskTime).sum}%.2f")
      ss.sortBy(-_.wall).take(18).foreach { s =>
        println(f"  st ${s.id}%4d wall=${s.wall}%6.2f task=${s.taskTime}%7.2f n=${s.ntasks}%3d in=${s.input/1048576.0}%7.1fM sr=${s.sRead/1048576.0}%7.1fM sw=${s.sWrite/1048576.0}%7.1fM  ${s.nameS}")
      }
      if (rep == reps - 1 && sys.env.contains("JOBPROBE_PLAN")) println("FINAL PLAN:\n" + lastPlan)
    }
    spark.stop()
  }
}
