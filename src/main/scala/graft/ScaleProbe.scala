package graft

import org.apache.spark.sql.SparkSession

/** Same-session cross-SF scaling probe (dev tool): times a query subset
  * over SEVERAL fixture dirs in ONE JVM, with per-query repeats, so
  * sf-to-sf ratios are free of the two artifacts that have repeatedly
  * poisoned cross-SF reads on this box (BASELINE.md methodology notes):
  * cold-JVM warmup scaling with data touched, and box-load contamination
  * between separate runs. Repeats split one-off cost (first run pays
  * index builds + JIT) from steady-state (later runs are the number a
  * 100 TB capacity read should use).
  *
  * Usage: `runMain graft.ScaleProbe <q1,q2,...> <dir1,dir2,...> [repeats]`
  * Output: one JSON line per (query, dir, rep) with the index-build cost
  * charged separately on rep 0, mirroring Bench's contract.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(',').map(_.trim).filter(_.nonEmpty).toSeq
    val dirs = args(1).split(',').map(_.trim).filter(_.nonEmpty).toSeq
    val repeats = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", 100000)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // Bench's warmup: codegen + shuffle + parquet reader, no data cached
    spark.range(1000).selectExpr("id", "id * 2 AS x")
      .groupBy((org.apache.spark.sql.functions.col("id") % 7).as("k"))
      .count().write.format("noop").mode("overwrite").save()
    val queries = SparkEntry.queries
    for (dir <- dirs; name <- names) {
      val fn = queries.getOrElse(name,
        sys.error(s"unknown query $name; see SparkEntry.queries"))
      // charge shared index builds once per (query, dir), before rep 0
      val builds = Queries.sharedStages.getOrElse(name, Nil)
      val b0 = System.nanoTime()
      builds.foreach(st =>
        Queries.indexBuilds.get(st).foreach(b => b(spark, dir)))
      val buildSec = (System.nanoTime() - b0) / 1e9
      for (rep <- 0 until repeats) {
        val t0 = System.nanoTime()
        val err = try {
          fn(spark, dir).write.format("noop").mode("overwrite").save()
          None
        } catch { case e: Throwable =>
          Some(Option(e.getMessage).getOrElse(e.getClass.getName).take(200))
        }
        val sec = (System.nanoTime() - t0) / 1e9
        val errJson = err.map(m =>
          ",\"err\":\"" + m.replaceAll("[\"\\\\\n\r\t]", " ") + "\"").getOrElse("")
        println(f"""{"q":"$name","dir":"$dir","rep":$rep,"sec":$sec%.2f""" +
          (if (rep == 0 && builds.nonEmpty) f""","build_sec":$buildSec%.2f""" else "") +
          errJson + "}")
      }
    }
    spark.stop()
  }
}
