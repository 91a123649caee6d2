package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.IncrementalJoin

/** Streaming JOIN-view maintenance — the streaming twin of
  * [[graft.operators.IncrementalJoin]], completing the maintenance
  * matrix: aggregates have [[AggMaintenance]] (batch fold) and joins now
  * have this (the [[AggMaintenance]] discipline applied to a materialized
  * A ⋈ B). The source is an op-tagged CDC log for the A side ('I'nsert /
  * 'U'pdate / 'D'elete rows, the [[graft.operators.ChangeCapture]]
  * vocabulary); B is a slowly-changing dimension read per trigger. Each
  * micro-batch folds into the view via the delta-join decomposition — the
  * base A table is NEVER materialized anywhere (that is the point: the
  * view plus the log IS the A-side state).
  *
  * Per-trigger cost: one scan of the BATCH + one view-sized retained pass
  * + delta ⋈ B. The view overwrite is the reference storage strategy
  * (same as [[AggMaintenance]]'s state table); a deployment whose view
  * outgrows per-trigger rewrites keeps the same applyCdc frame and lands
  * it with tombstones / delete-vectors instead — the logical fold is
  * unchanged.
  *
  * Batch contract: at most one CDC row per A row key per trigger (compact
  * upstream — [[graft.operators.UrlOps.latestPerUrl]]'s argmax shape); an
  * update carries the FULL new row under 'U'. Exactly-once caveat: same
  * as [[AggMaintenance]] — foreachBatch replays a torn trigger
  * at-least-once; replaying a batch whose keys were already folded is
  * idempotent here (the touched-keys anti removes the batch's previous
  * effect before re-adding it), EXCEPT when the replayed batch races a
  * later batch for the same key — the checkpoint makes that a crash-only
  * event.
  */
object JoinMaintenance {

  /** @param cdcDir   streamed parquet dir of op-tagged A-side change rows:
    *                  A's full columns + `opCol` ∈ {'I','U','D'} ('D' rows
    *                  need only the key populated)
    * @param bDir     parquet dir of the B side (read fresh per trigger)
    * @param viewDir  the materialized view ([[IncrementalJoin.joinState]]
    *                  layout); absent/empty = start from an empty view */
  def maintainJoinView(spark: SparkSession, cdcDir: String, bDir: String,
      viewDir: String, checkpointDir: String,
      aKey: String, bKey: String, joinKeys: Seq[String], opCol: String = "op",
      schema: Option[org.apache.spark.sql.types.StructType] = None,
      maxFilesPerTrigger: Int = 1): StreamingQuery = {
    val srcSchema = schema.getOrElse(spark.read.parquet(cdcDir).schema)
    spark.readStream
      .schema(srcSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(cdcDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val b = spark.read.parquet(bDir)
        val aIns = batch.filter(col(opCol) =!= "D").drop(opCol)
        // 'U' = delete(old key) + insert(new row): route the key through
        // both deltas, exactly the ChangeCapture decomposition
        val aDel = batch.filter(col(opCol) =!= "I").select(col(aKey))
        val view =
          if (hasParquet(spark, viewDir)) spark.read.parquet(viewDir)
          else IncrementalJoin.joinState(aIns.limit(0), b, joinKeys)
        val folded = IncrementalJoin.applyCdc(view, aKey, bKey, joinKeys,
          aInserts = aIns, aDeletes = aDel,
          bInserts = b.limit(0), bDeletes = b.select(col(bKey)).limit(0),
          // A is never materialized; aSnapshot is only consulted for
          // B-side inserts, which this maintenance shape never has
          aSnapshot = aIns.limit(0), bSnapshot = b)
        // pin before the overwrite: folded's lineage reads viewDir
        folded.localCheckpoint().write.mode("overwrite").parquet(viewDir)
        ()
      }
      .start()
  }

  private def hasParquet(spark: SparkSession, dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.listStatus(p).exists(s =>
      s.isFile && s.getPath.getName.endsWith(".parquet"))
  }
}
