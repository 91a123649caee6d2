package graft.streaming

import graft.SparkTestBase
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Live latest-value state == the batch latest over everything ingested,
  * at every trigger boundary — and replays are no-ops (max-merge is
  * idempotent), the property that makes this maintenance surface
  * exactly-once under at-least-once foreachBatch. */
class FeatureStoreSpec extends SparkTestBase {

  private def canon(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.mkString("|")).toSet

  test("paced micro-batches fold into exactly the batch latest state; replay is a no-op") {
    val root = java.nio.file.Files.createTempDirectory("graft-featstore")
    val srcDir = s"$root/src"
    val stateDir = s"$root/state"
    val ev = Tables.load(spark, sf(), "events")
      .filter(col("event_type") === "view")
      .select("event_id", "user_id", "ts", "value")

    // three deltas as separate files → three real merge triggers
    (0 until 3).foreach { i =>
      ev.filter(col("event_id") % 3 === i).coalesce(1)
        .write.mode("append").parquet(srcDir)
    }

    val q = FeatureStore.maintainLatest(spark, srcDir, stateDir,
      s"$root/chk", keys = Seq("user_id"), tsCol = "ts",
      valueCols = Seq("value", "event_id"), maxFilesPerTrigger = 1)
    q.awaitTermination()

    val live = spark.read.parquet(stateDir)
    val scratch = FeatureStore.latestState(ev,
      Seq("user_id"), "ts", Seq("value", "event_id"))
    assert(live.schema.map(f => (f.name, f.dataType)) ==
      scratch.schema.map(f => (f.name, f.dataType)))
    assert(canon(live) == canon(scratch))
    // one row per user, and it is that user's max-ts row
    assert(live.groupBy("user_id").count().filter(col("count") > 1).count() == 0)

    // late event for one user bumps exactly that user's row (same
    // checkpoint resumes; only the new file is processed)
    val bumped = ev.orderBy("user_id").limit(1)
      .withColumn("ts", col("ts") + expr("INTERVAL 400 DAYS"))
      .withColumn("value", lit(9999.5))
      .withColumn("event_id", lit(777000111L))
    bumped.coalesce(1).write.mode("append").parquet(srcDir)
    val q2 = FeatureStore.maintainLatest(spark, srcDir, stateDir,
      s"$root/chk", Seq("user_id"), "ts", Seq("value", "event_id"),
      maxFilesPerTrigger = 1)
    q2.awaitTermination()
    val live2 = spark.read.parquet(stateDir)
    val scratch2 = FeatureStore.latestState(ev.unionByName(bumped),
      Seq("user_id"), "ts", Seq("value", "event_id"))
    assert(canon(live2) == canon(scratch2))
    assert(live2.filter(col("event_id") === 777000111L).count() == 1)

    // REPLAY falsifier: a fresh checkpoint reprocesses every file (the
    // at-least-once world's worst case) — the max-merge must leave the
    // state bit-identical, where an additive merge would double-count
    val q3 = FeatureStore.maintainLatest(spark, srcDir, stateDir,
      s"$root/chk_replay", Seq("user_id"), "ts", Seq("value", "event_id"),
      maxFilesPerTrigger = 1)
    q3.awaitTermination()
    assert(canon(spark.read.parquet(stateDir)) == canon(scratch2),
      "replaying every batch into existing state must be a no-op")
  }
}
