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
  * vocabulary); B is a STATIC dimension for the lifetime of the view (it
  * is re-read per trigger, but only to join each trigger's A-DELTA).
  * Each micro-batch folds into the view via the delta-join decomposition
  * — the base A table is NEVER materialized anywhere (that is the point:
  * the view plus the log IS the A-side state).
  *
  * B-side contract — STATED, because a silent divergence here is worse
  * than a restriction: changes to B do NOT retro-update existing view
  * rows (there is no B-retraction path in this maintenance shape). If B
  * rows are updated/deleted/inserted, fold that B-changeset through the
  * batch API ([[graft.operators.IncrementalJoin.applyCdc]] with
  * bInserts/bDeletes over the persisted view) or rebuild the view; a B
  * that drifts while this query runs leaves old pairs carrying the old B
  * payload next to new pairs carrying the new one.
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
  * update carries the FULL new row under 'U'; any op value outside
  * {'I','U','D'} (including NULL) raises per row — a silently dropped or
  * misrouted change would diverge the view from the log with no signal.
  * Exactly-once caveat: same as [[AggMaintenance]] — foreachBatch replays
  * a torn trigger at-least-once; replaying a batch whose keys were
  * already folded is idempotent here (the touched-keys anti removes the
  * batch's previous effect before re-adding it, and B is static by
  * contract), EXCEPT when the replayed batch races a later batch for the
  * same key — the checkpoint makes that a crash-only event.
  */
object JoinMaintenance {

  /** @param cdcDir   streamed parquet dir of op-tagged A-side change rows:
    *                  A's full columns + `opCol` ∈ {'I','U','D'} ('D' rows
    *                  need only the key populated; any other op raises)
    * @param bDir     parquet dir of the static B side
    * @param viewDir  the materialized view ([[IncrementalJoin.joinState]]
    *                  layout); absent/empty = start from an empty view
    * @param schema   the CDC-row schema — REQUIRED when `cdcDir` has no
    *                  files yet (starting the maintenance query ahead of
    *                  the producer); otherwise inferred from the dir
    * @param leftJoin maintain a LEFT-join view: A rows without a B
    *                  partner ride null-extended ([[IncrementalJoin
    *                  .applyCdcLeft]]); with B static the zero-crossing
    *                  transitions never fire from the B side, so the
    *                  per-trigger fold only routes inserted A rows to
    *                  the matched or null-extended slice */
  def maintainJoinView(spark: SparkSession, cdcDir: String, bDir: String,
      viewDir: String, checkpointDir: String,
      aKey: String, bKey: String, joinKeys: Seq[String], opCol: String = "op",
      schema: Option[org.apache.spark.sql.types.StructType] = None,
      maxFilesPerTrigger: Int = 1, leftJoin: Boolean = false): StreamingQuery = {
    require(schema.nonEmpty || StateDirs.hasParquetData(spark, cdcDir),
      s"maintainJoinView: $cdcDir has no parquet yet — pass schema= to " +
        "start the maintenance query ahead of the CDC producer")
    val srcSchema = schema.getOrElse(spark.read.parquet(cdcDir).schema)
    spark.readStream
      .schema(srcSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(cdcDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (rawBatch: DataFrame, _: Long) =>
        val b = spark.read.parquet(bDir)
        // loud op guard: a NULL or unknown op would silently drop (or
        // misroute) a change and diverge the view from the log
        val batch = rawBatch.withColumn(opCol,
          when(col(opCol).isin("I", "U", "D"), col(opCol))
            .otherwise(raise_error(concat(
              lit("maintainJoinView: invalid op value '"),
              coalesce(col(opCol), lit("NULL")),
              lit("' — expected I, U or D")))))
        val aIns = batch.filter(col(opCol) =!= "D").drop(opCol)
        // 'U' = delete(old key) + insert(new row): route the key through
        // both deltas, exactly the ChangeCapture decomposition
        val aDel = batch.filter(col(opCol) =!= "I").select(col(aKey))
        val view =
          if (StateDirs.hasParquetData(spark, viewDir)) spark.read.parquet(viewDir)
          else if (leftJoin) IncrementalJoin.joinStateLeft(aIns.limit(0), b, joinKeys)
          else IncrementalJoin.joinState(aIns.limit(0), b, joinKeys)
        def fold(f: (DataFrame, String, String, Seq[String], DataFrame,
            DataFrame, DataFrame, DataFrame, DataFrame, DataFrame) => DataFrame) =
          f(view, aKey, bKey, joinKeys,
            aIns, aDel,
            b.limit(0), b.select(col(bKey)).limit(0),
            // A is never materialized; aSnapshot is only consulted for
            // B-side inserts, which this maintenance shape never has
            aIns.limit(0), b)
        val folded =
          if (leftJoin) fold(IncrementalJoin.applyCdcLeft)
          else fold(IncrementalJoin.applyCdc)
        // pin before the overwrite: folded's lineage reads viewDir
        folded.localCheckpoint().write.mode("overwrite").parquet(viewDir)
        ()
      }
      .start()
  }

}
