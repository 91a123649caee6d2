package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions.NeutralHash

/** Importance-resampling data selection (EXTENSION, SURVEY.md §2.K) —
  * the DSIR discipline (Xie et al. 2023, "Data Selection for Language
  * Models via Importance Resampling"): score every document in a raw
  * pool by how much more likely its hashed-n-gram bag is under a small
  * TARGET corpus' unigram distribution than under the raw pool's own,
  * then keep the top-weighted documents. This is the standard way to
  * skim "looks like Wikipedia/books" data out of a web-scale crawl
  * without training a classifier.
  *
  * Scale shape (100 TB): ONE corpus scan builds the per-document
  * hashed-bucket bags, pre-aggregated map-side to (doc, bucket, count)
  * so a document contributes at most `nBuckets` rows to anything
  * downstream regardless of its length. The bucket statistics table is
  * `nBuckets`-sized (default 1024 — KBs), so the target/raw log-ratio
  * table broadcasts back to the bag frame; scoring is then a single
  * doc-keyed aggregation. Two consumers share the persisted bag stage
  * (the [[TextAnalysis.bigramLogProb]] / [[Dedup]] shared-stage
  * discipline). Nothing corpus-sized crosses the driver.
  *
  * Engine-neutral hashing: buckets are `(md5_lower64(word) >>> 32) %
  * nBuckets` ([[NeutralHash]]), so the whole computation — including
  * the selection — replays bit-for-bit in an external SQL oracle via
  * `md5_number_lower`. Log-weights follow the repo's rational-rounding
  * discipline: each per-bucket term is a product of identically-derived
  * doubles, bridged through DECIMAL(38,12) so the per-doc sum is
  * order-independent, then rounded to 6 decimals at the boundary.
  */
object DataSelection {

  private def words(textCol: Column): Column =
    filter(split(lower(textCol), "\\s+"), w => w =!= "")

  /** Per-document hashed-unigram bag, pre-aggregated to
    * (id, isTarget, bucket, count) — the one corpus-sized scan. */
  private def docBuckets(docs: DataFrame, idCol: String, textCol: String,
      isTarget: Column, nBuckets: Int): DataFrame =
    // widen the parse (r12, [[Parallelism.widen]]): per-token hashing
    // dwarfs the scan bytes, and a single-row-group corpus file pins
    // the stage to one task (A/B at sf0.1: 1.42 -> 1.03 s)
    Parallelism.widen(docs, col(idCol))
      .select(col(idCol), isTarget.as("_tgt"),
        explode(words(col(textCol))).as("_w"))
      .select(col(idCol), col("_tgt"),
        (shiftrightunsigned(NeutralHash.lower64Col(col("_w")), 32) %
          lit(nBuckets.toLong)).as("_b"))
      .groupBy(col(idCol), col("_tgt"), col("_b"))
      .agg(count(lit(1)).as("_c"))

  /** Per-document DSIR log importance weight for every RAW (non-target)
    * document: Σ over the doc's token occurrences of
    * `ln((c_target[b]+1)/(N_target+B)) − ln((c_raw[b]+1)/(N_raw+B))`
    * (add-one smoothing over the `B = nBuckets` hashed-feature space).
    * Documents with no tokens score 0 (the empty bag is equally likely
    * under both distributions). Returns (idCol, log_w), log_w rounded
    * to 6 decimals.
    *
    * `isTarget` marks the target-distribution exemplars (e.g.
    * `col("lang") === "en"` or a curated-source flag); target documents
    * define the numerator distribution and are themselves excluded from
    * the scored output.
    */
  def dsirLogWeights(docs: DataFrame, idCol: String, textCol: String,
      isTarget: Column, nBuckets: Int = 1024): DataFrame = {
    require(nBuckets > 0, s"nBuckets must be positive, got $nBuckets")
    val db = docBuckets(docs, idCol, textCol, isTarget, nBuckets)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val bucketCounts = db.groupBy("_b").agg(
      sum(when(col("_tgt"), col("_c")).otherwise(0L)).as("c_t"),
      sum(when(!col("_tgt"), col("_c")).otherwise(0L)).as("c_r"))
    val totals = bucketCounts.agg(
      sum("c_t").as("n_t"), sum("c_r").as("n_r"))
    val b = lit(nBuckets.toDouble)
    // nBuckets rows — broadcast back to the bag frame
    val ratios = bucketCounts.crossJoin(broadcast(totals))
      .select(col("_b"),
        (log((col("c_t") + lit(1.0)) / (col("n_t") + b)) -
         log((col("c_r") + lit(1.0)) / (col("n_r") + b))).as("_lr"))
    val scored = db.filter(!col("_tgt"))
      .join(broadcast(ratios), Seq("_b"))
      .groupBy(col(idCol))
      .agg(sum((col("_c").cast("double") * col("_lr"))
        .cast("decimal(38,12)")).as("_s"))
    val out = docs.filter(!isTarget).select(col(idCol))
      .join(scored, Seq(idCol), "left")
      .select(col(idCol),
        round(coalesce(col("_s").cast("double"), lit(0.0)), 6).as("log_w"))
      // narrow (id, log_w) rows — localCheckpoint pins them (blocks
      // released on GC) so the corpus-sized bag stage can be unpersisted
      // HERE rather than leaking cached blocks into a long-lived session
      .localCheckpoint()
    db.unpersist()
    out
  }

  /** Top-`k` raw documents by DSIR weight (weight desc, id asc — fully
    * deterministic). The plan is TakeOrderedAndProject over the scored
    * frame: a bounded per-partition heap + one k-row merge, never a
    * full sort of the pool. */
  def dsirSelect(docs: DataFrame, idCol: String, textCol: String,
      isTarget: Column, k: Int, nBuckets: Int = 1024): DataFrame =
    dsirLogWeights(docs, idCol, textCol, isTarget, nBuckets)
      .orderBy(col("log_w").desc, col(idCol))
      .limit(k)
}
