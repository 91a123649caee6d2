package graft.run

import graft.SparkTestBase

class GraftJobSpec extends SparkTestBase {

  test("timeout derives from the cost cap exactly like the reference") {
    // values pinned by tests/test_tests.py:169-199
    assert(GraftJob.timeoutMinutes(2, "G.1X") == 1363)
    assert(GraftJob.timeoutMinutes(5, "G.2X") == 272)
    assert(GraftJob.timeoutMinutes(40, "G.1X") == 68)
    intercept[IllegalArgumentException](GraftJob.timeoutMinutes(2, "Z.9X"))
  }

  test("run executes queries to parquet sinks and infers their metas") {
    val out = java.nio.file.Files.createTempDirectory("graftjob").toString
    val subset = graft.SparkEntry.queries.view
      .filterKeys(Set("q_scan_all", "q_agg_group")).toMap
    val results = GraftJob.run(spark, subset, sf(), out)
    assert(results.length == 2)
    assert(results.forall(_.isInstanceOf[GraftJob.JobSucceeded]))
    val metas = GraftJob.inferSinkMetas(spark, out)
    assert(metas.map(_.name).sorted == Seq("q_agg_group", "q_scan_all"))
    assert(metas.forall(_.columns.nonEmpty))
  }

  test("failed query reports JobFailed, not an exception") {
    val out = java.nio.file.Files.createTempDirectory("graftjob2").toString
    val bad = Map("boom" -> ((s: org.apache.spark.sql.SparkSession, d: String) =>
      s.read.parquet(s"$d/does_not_exist.parquet")))
    val r = GraftJob.run(spark, bad, sf(), out)
    assert(r.head.isInstanceOf[GraftJob.JobFailed])
  }

  test("a query exceeding the remaining budget is cancelled mid-flight") {
    val out = java.nio.file.Files.createTempDirectory("graftjob4").toString
    val slow = Map("crawl" -> ((s: org.apache.spark.sql.SparkSession, d: String) => {
      import s.implicits._
      s.range(0, 64, 1, 8).mapPartitions { it =>
        Thread.sleep(60000); it
      }.toDF("id")
    }))
    // G.8X x 40 workers at a 2-cent cap -> sub-second budget
    val t0 = System.nanoTime()
    val r = GraftJob.run(spark, slow, sf(), out,
      workers = 40, workerType = "G.8X", costCap = 0.02)
    val took = (System.nanoTime() - t0) / 1e9
    assert(r.head.isInstanceOf[GraftJob.JobTimedOut], r.head.toString)
    assert(took < 30, s"cancellation took ${took}s — query was not cut short")
    // the cancellation must actually kill the Spark jobs (not just return
    // early from Await): the 60s-sleep tasks get interrupted and the
    // cluster drains well before the sleep could have finished
    val tracker = spark.sparkContext.statusTracker
    val drainDeadline = System.nanoTime() + 20L * 1000 * 1000 * 1000
    while (tracker.getActiveJobIds().nonEmpty && System.nanoTime() < drainDeadline)
      Thread.sleep(200)
    assert(tracker.getActiveJobIds().isEmpty,
      "timed-out query's Spark jobs were not cancelled")
  }

  test("runAsync: pollable status transitions Running -> Completed") {
    val out = java.nio.file.Files.createTempDirectory("graftjob6").toString
    val subset = graft.SparkEntry.queries.view.filterKeys(Set("q_scan_all")).toMap
    val h = GraftJob.runAsync(spark, subset, sf(), out)
    // wait_for_completion analog drains to the same results run() gives
    val results = h.waitForCompletion(pollSeconds = 0.05)
    assert(results.length == 1 && results.head.isInstanceOf[GraftJob.JobSucceeded])
    assert(h.status == GraftJob.Completed(results))
  }

  test("zero budget times out immediately") {
    val out = java.nio.file.Files.createTempDirectory("graftjob3").toString
    val subset = graft.SparkEntry.queries.view.filterKeys(Set("q_scan_all")).toMap
    val r = GraftJob.run(spark, subset, sf(), out, costCap = 0.0)
    assert(r.head.isInstanceOf[GraftJob.JobTimedOut])
  }

  test("packaged .sql resources execute end-to-end: package -> stage -> run -> metas") {
    // the full reference lifecycle in-process: a job folder with sql
    // resources is packaged, staged, executed against registered views,
    // and its sinks schema-inferred back into table metas
    val root = java.nio.file.Files.createTempDirectory("graftsqljob")
    val job = root.resolve("glue_jobs").resolve("sql_job")
    java.nio.file.Files.createDirectories(job.resolve("glue_resources"))
    java.nio.file.Files.writeString(job.resolve("job.py"), "# runner stub")
    java.nio.file.Files.writeString(
      job.resolve("glue_resources").resolve("region_count.sql"),
      "SELECT r_regionkey, count(*) AS n FROM staged_region GROUP BY r_regionkey")
    java.nio.file.Files.writeString(
      job.resolve("glue_resources").resolve("broken.sql"),
      "SELECT * FROM table_that_does_not_exist")
    graft.sources.Tables.load(spark, sf(), "region")
      .createOrReplaceTempView("staged_region")

    val pkg = new JobPackage(job.toString, root.resolve("stage").toString, jobId = "9")
    pkg.syncToStage()
    val out = java.nio.file.Files.createTempDirectory("graftsqlout").toString
    val results = GraftJob.runStagedSql(spark, pkg, out)
    assert(results.map(_.name) == Seq("broken", "region_count"))
    assert(results.head.isInstanceOf[GraftJob.JobFailed]) // bad sql fails, run continues
    assert(results(1).isInstanceOf[GraftJob.JobSucceeded])
    val metas = GraftJob.inferSinkMetas(spark, out)
    assert(metas.map(_.name) == Seq("region_count"))
    assert(metas.head.columnNames == Seq("r_regionkey", "n"))
    pkg.cleanup()
  }

  test("a timed-out query leaves no zombie: nothing is written after the kill") {
    // a ~1 ms budget makes Await time out BEFORE the Future body has even
    // started — the timed-out flag must stop the query from launching at
    // all, or it would run to completion in the background and write its
    // sink anyway (the zombie the cost cap exists to prevent)
    val out = java.nio.file.Files.createTempDirectory("graftjob5").toString
    val subset = graft.SparkEntry.queries.view.filterKeys(Set("q_scan_all")).toMap
    val r = GraftJob.run(spark, subset, sf(), out, costCap = 1e-9)
    assert(r.head.isInstanceOf[GraftJob.JobTimedOut])
    // give any would-be zombie ample time to run the (fast) query + write
    Thread.sleep(3000)
    assert(GraftJob.inferSinkMetas(spark, out).isEmpty,
      "timed-out query still wrote its sink — zombie execution")
  }
}
