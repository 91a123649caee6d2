package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic training-shard assignment (EXTENSION, SURVEY.md §2.K) —
  * the last stage of a corpus pipeline: deal the cleaned corpus into N
  * fixed shards in a reproducible pseudo-random order so a training
  * loader can stream shard files without a global shuffle of its own.
  *
  * Both the shard id and the within-shard order derive from the
  * engine-neutral md5 hash of the document id
  * ([[graft.functions.NeutralHash]]), not from `rand()` or from input
  * order — so the same corpus shards identically across engines, runs,
  * partition counts, and cluster sizes, and an external SQL oracle can
  * replay the exact assignment.
  *
  * Scale (100 TB): shard assignment is a map-side projection (one md5 +
  * shift/mod per row, no shuffle). The write is ONE hash shuffle on the
  * shard id followed by a partition-local sort — `repartition(shard)`
  * before `partitionBy(shard)` keeps every shard's rows in one task so
  * each shard directory gets a handful of large sorted files instead of
  * one fragment per upstream task (the round-4 dynamic-partition-write
  * lesson). No global sort at any corpus size.
  */
object Sharding {

  /** Shard id in [0, nShards): bits [32,64) of the md5-derived hash,
    * mod nShards. The unsigned right shift makes the signed Long
    * non-negative, so `%` here equals the unsigned mod an external
    * engine computes on its u64 (`(md5_number_lower(id) >> 32) % n`). */
  def shardId(idCol: Column, nShards: Int): Column = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    shiftrightunsigned(
      graft.functions.NeutralHash.lower64Col(idCol.cast("string")), 32) % nShards
  }

  /** Within-shard order key: top 53 hash bits (`>>> 11`), disjoint use of
    * the same digest is fine — shard uses bits [32,64), rank magnitude is
    * dominated by bits [11,64) — and exact in a Double or an external
    * u64 `>> 11` (the [[Sampling.capPerGroup]] rank convention). */
  def shardRank(idCol: Column): Column =
    shiftrightunsigned(
      graft.functions.NeutralHash.lower64Col(idCol.cast("string")), 11)

  /** Adds `shard` and `shard_rank` columns; pure projection. */
  def assignShards(df: DataFrame, idCol: String, nShards: Int): DataFrame = {
    require(!df.columns.contains("shard") && !df.columns.contains("shard_rank"),
      "input already has a shard/shard_rank column; rename it before assignShards")
    df.withColumn("shard", shardId(col(idCol), nShards))
      .withColumn("shard_rank", shardRank(col(idCol)))
  }

  /** Materialize the corpus as `path/shard=K/` parquet, each shard's rows
    * sorted by (shard_rank, id): the deterministic stream order a loader
    * reads back without sorting. One shuffle, partition-local sort. */
  def writeShards(df: DataFrame, idCol: String, nShards: Int,
      path: String): Unit =
    assignShards(df, idCol, nShards)
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("shard_rank"), col(idCol))
      .write.mode("overwrite").partitionBy("shard").parquet(path)

  /** Per-shard audit: sizes plus the minimum order key — enough for an
    * external oracle to verify the full assignment arithmetic and for an
    * operator to check shard balance before a write. `first_rank` casts
    * to double (exact at 53 bits) so external u64 vs signed-long schema
    * differences can't leak into the comparison. */
  def shardStats(df: DataFrame, idCol: String, textCol: String,
      nShards: Int): DataFrame =
    assignShards(df.filter(col(idCol).isNotNull), idCol, nShards)
      .groupBy("shard")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(length(col(textCol))).as("sum_chars"),
        min(col("shard_rank")).cast("double").as("first_rank"),
        min(col(idCol)).as("min_doc"),
        max(col(idCol)).as("max_doc"))
}
