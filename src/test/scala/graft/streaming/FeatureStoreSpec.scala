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

  test("streaming PIT training assembly == batch pointInTimeFeatures on the same slices (r10)") {
    val root = java.nio.file.Files.createTempDirectory("graft-pit-stream")
    val labelDir = s"$root/labels"
    val viewDir = s"$root/f_views"
    val clickDir = s"$root/f_clicks"
    val outDir = s"$root/training"
    val ev = Tables.load(spark, sf(), "events")
      .filter(col("user_id") < 60)
    // feature histories: views carry value, clicks carry event_id; the
    // 3-day click staleness bound leaves some labels NULL (exercised,
    // not vacuous — asserted below)
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts"), col("value").as("f_view"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("value").as("f_click"))
    views.write.parquet(viewDir)
    clicks.write.parquet(clickDir)
    // labels: purchases, in three files → three triggers
    val labels = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("label_id"), col("user_id"),
        col("ts").as("label_ts"))
    (0 until 3).foreach { i =>
      labels.filter(col("label_id") % 3 === i).coalesce(1)
        .write.mode("append").parquet(labelDir)
    }
    val day = 86400000000L
    val feats = Seq(
      (viewDir, "ts", Map("f_view" -> "f_view"), 30L * day),
      (clickDir, "ts", Map("f_click" -> "f_click"), 3L * day))

    val q = FeatureStore.assembleTrainingRows(spark, labelDir, outDir,
      s"$root/chk", key = "user_id", labelTs = "label_ts", feats,
      maxFilesPerTrigger = 1)
    q.awaitTermination()

    // streaming == batch: the features were fully ingested before the
    // labels streamed (the stated operating mode), so every trigger's
    // PIT slice must union to the one-shot batch assembly
    val streamed = FeatureStore.readTrainingRows(spark, outDir)
    val batch = graft.operators.AsOfJoin.pointInTimeFeatures(
      labels, "user_id", "label_ts",
      Seq((spark.read.parquet(viewDir), "ts", Map("f_view" -> "f_view"), 30L * day),
        (spark.read.parquet(clickDir), "ts", Map("f_click" -> "f_click"), 3L * day)))
    assert(streamed.columns.sorted.toSeq == batch.columns.sorted.toSeq)
    assert(canon(streamed.select(batch.columns.map(col): _*)) == canon(batch))
    assert(streamed.count() == labels.count(), "assembly keeps the spine 1:1")
    // the staleness bound actually bit: some click features are NULL
    // while the same rows carry a view feature (3d vs 30d tolerance)
    assert(streamed.filter(col("f_click").isNull && col("f_view").isNotNull)
      .count() > 0, "fixture must exercise the staleness bound")
    assert(streamed.filter(col("f_view").isNotNull).count() > 0)

    // REPLAY falsifier: fresh checkpoint reprocesses all three label
    // files with the same batch ids — dynamic partition overwrite must
    // rewrite, not duplicate
    val q2 = FeatureStore.assembleTrainingRows(spark, labelDir, outDir,
      s"$root/chk_replay", "user_id", "label_ts", feats,
      maxFilesPerTrigger = 1)
    q2.awaitTermination()
    assert(canon(FeatureStore.readTrainingRows(spark, outDir)
      .select(batch.columns.map(col): _*)) == canon(batch),
      "a full replay must leave the training table bit-identical")
  }
}
